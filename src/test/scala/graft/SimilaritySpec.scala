package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Hyperplane-LSH near-dup recall against the exact brute-force baseline,
  * exhaustively on the fixed sf0.001 embeddings (the LSH output is
  * deterministic — seeded planes — so recall verified here holds for the
  * correctness gate too; see Similarity scaladoc for the analytic bound). */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("injected near-dup embeddings are true near-dups (cos ≈ 0.998+)") {
    val aug = Similarity.withNearDupEmbeddings(Tables.load(spark, dir, "embeddings"))
    val joined = aug.as("a").join(aug.as("b"),
        col("a.vec_id") + 1000000 === col("b.vec_id"))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .collect().map(_.getDouble(0))
    assert(joined.nonEmpty)
    assert(joined.forall(_ > 0.99), s"min injected cos = ${joined.min}")
  }

  test("LSH pairs == exact all-pairs cos >= 0.9 (recall 1.0 on testdata)") {
    val aug = Similarity.withNearDupEmbeddings(Tables.load(spark, dir, "embeddings"))
      .withColumn("norm", sqrt(Similarity.fdot(col("embedding"), col("embedding"))))
    // exact, unblocked all-pairs ground truth
    val exact = aug.as("a").join(aug.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        (Similarity.fdot(col("a.embedding"), col("b.embedding"))
          / (col("a.norm") * col("b.norm"))).as("cos"))
      .filter(col("cos") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.hyperplaneLshNearDupPairs(
        Similarity.withNearDupEmbeddings(Tables.load(spark, dir, "embeddings")), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh === exact,
      s"missed=${(exact -- lsh).take(5)} extra=${(lsh -- exact).take(5)}")
  }
}
