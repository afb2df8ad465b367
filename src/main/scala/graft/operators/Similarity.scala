package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Determinism: dot products are LEFT FOLDS in element order over
  * double-cast elements (`zip_with` + `aggregate`), which both Spark and
  * the DuckDB oracle (`list_zip` + `list_reduce`) evaluate in the same
  * IEEE operation sequence — so cosine scores are bit-identical across
  * engines. Float→double casts and float×float-in-double products are
  * exact; only the running additions round, identically on both sides.
  *
  * Scale: brute force is the correctness baseline (still distributed — a
  * broadcast of the query set against a partitioned corpus). The IVF path
  * restricts each query to its coarse cell (here the `label` column), the
  * standard way top-k survives 100 TB: the join key becomes the cell id,
  * candidates drop by the bucket factor, and the per-partition top-k
  * (`row_number` window) never materializes the full score matrix.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double.
    * Backed by the codegen'd native expression
    * ([[graft.functions.FloatVectorDot]]); same left-to-right IEEE fold as
    * `aggregate(zip_with(...))` and the DuckDB `list_reduce` oracle, ~50×
    * faster (fused loop inside whole-stage codegen vs interpreted
    * HigherOrderFunction chain). */
  def fdot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.fdot(a, b)

  def fnorm(a: Column): Column = sqrt(fdot(a, a))

  def cosine(a: Column, b: Column): Column =
    fdot(a, b) / (fnorm(a) * fnorm(b))

  /** SQL renderers — operation-order lockstep with the Column forms. */
  def fdotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
  def fnormSql(a: String): String = s"sqrt(${fdotSql(a, a)})"
  def cosineSql(a: String, b: String): String =
    s"(${fdotSql(a, b)} / (${fnormSql(a)} * ${fnormSql(b)}))"

  /** (vec_id, norm) — vector plumbing sanity. */
  def norms(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), fnorm(col("embedding")).as("norm"))

  /** Norms are precomputed ONCE per vector before any pair join (an O(n)
    * projection instead of O(pairs) re-folds); cos = dot/(norm_a·norm_b)
    * is the same IEEE op sequence either way, so oracle values are
    * unchanged. */
  private def withNorm(embeddings: DataFrame): DataFrame =
    embeddings.withColumn("norm", fnorm(col("embedding")))

  /** Brute-force cosine top-k: every query (a small broadcast side)
    * against the whole corpus; per-query top-k via a rank window with a
    * (cosine desc, vec_id) deterministic tie-break. Self-matches excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(withNorm(queries).select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), col("norm").as("q_norm")))
    val scored = withNorm(corpus).join(q, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (fdot(col("q_emb"), col("embedding")) / (col("q_norm") * col("norm"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-style top-k with nprobe=1: candidates restricted to the query's
    * coarse cell (`label`). The join key is the cell id — the scale path. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(withNorm(queries).select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), col("label").as("q_label"), col("norm").as("q_norm")))
    val scored = withNorm(corpus).join(q,
        col("label") === col("q_label") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (fdot(col("q_emb"), col("embedding")) / (col("q_norm") * col("norm"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Per-vector int8 scalar quantization: qᵢ = round((xᵢ − min) / scale)
    * with scale = (max − min)/255 — 4× storage cut for ANN shortlists at
    * 100 TB (rerank on full precision). Output exploded
    * (vec_id, i, q) for oracle checking; production would pack
    * array<tinyint>. Constant vectors quantize to 0. */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val dbl = transform(col("embedding"), x => x.cast("double"))
    val mn = array_min(dbl)
    val mx = array_max(dbl)
    val scale = (mx - mn) / 255.0
    embeddings
      .select(col("vec_id"), posexplode(dbl).as(Seq("i", "x")), mn.as("mn"), scale.as("scale"))
      .select(col("vec_id"), col("i").cast("int").as("i"),
        when(col("scale") > 0.0, round((col("x") - col("mn")) / col("scale")))
          .otherwise(0.0).cast("int").as("q"))
  }

  /** Embedding-cosine near-duplicate pairs: cos ≥ threshold, blocked by
    * the coarse cell (near-dups share a cell at any sane quantizer). */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = withNorm(embeddings)
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        (fdot(col("a.embedding"), col("b.embedding"))
          / (col("a.norm") * col("b.norm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
