package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage (entity resolution): candidate pairs
  * come only from records sharing a BLOCKING key, then an edit-distance
  * gate keeps the near-matches — the standard two-stage shape (Fellegi–
  * Sunter blocking + string comparator) that avoids the O(n²) all-pairs
  * comparison no engine survives at corpus scale.
  *
  * Scale shape: the self-join is an equi-join on the block key (shuffle
  * hash/sort-merge, never a cross join); cost is Σ_b |block_b|², so the
  * block-size cap is the straggler defense — the same role the df cap
  * plays for winnow fingerprints and canonical shingle order plays for
  * PPJoin. Oversized blocks (celebrity keys: an empty-string name, a
  * default city) are dropped BEFORE the join; production re-blocks them
  * on a finer key rather than comparing them pairwise. */
object Linkage {

  /** Near-match pairs (a_id, b_id, dist) with a_id < b_id, within
    * blocks of `blockCols`, at Levenshtein distance ≤ `maxDist` between
    * `nameCol` values. Blocks larger than `maxBlockSize` are skipped. */
  def blockedPairs(records: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], maxDist: Int,
      maxBlockSize: Int = 10000): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    val bc = blockCols.map(col)
    val sizes = records.groupBy(bc: _*).agg(count(lit(1)).as("block_n"))
    val kept = records.join(sizes, blockCols)
      .filter(col("block_n") <= maxBlockSize)
    val a = kept.select(bc :+ col(idCol).as("a_id") :+ col(nameCol).as("a_name"): _*)
    val b = kept.select(bc :+ col(idCol).as("b_id") :+ col(nameCol).as("b_name"): _*)
    a.join(b, blockCols)
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
  }
}
