package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic per-group medoid: the member minimizing total distance to all
  * co-members, with a pluggable distance expression — the relational form of
  * the reference's medoid reducer (`Cluster.java:229-266`, unweighted clone
  * `kmeansCluster.java:63-101`).
  *
  * Shape: self-join on the group key (ONE shuffle; partial aggregation of
  * the pairwise distance sums is map-side), then `min_by` per group with a
  * `(total, id)` struct ordering so ties deterministically break to the
  * smallest id. At 1000-executor scale the join shuffles each group to one
  * task; groups too large for O(n²) should go through [[totals]] with a
  * reduced candidate set (see `KMeans.sampledMedoids`).
  */
object Medoids {

  /** Total distance of every candidate to all members of its group.
    * `dist(l, r)` builds the distance column from left/right accessors —
    * e.g. `(l, r) => abs(l("bal") - r("bal"))`. Output:
    * `(groupCol, idCol, total)`.
    *
    * `saltBuckets` > 1 fixes PARALLELISM STARVATION when the group count
    * is small (k=3 clusters → 3 join keys → 3 tasks, however many
    * executors exist): members are deterministically salted into S
    * buckets by a feature hash, candidates replicate to all S, the join
    * key becomes (group, salt) — S·k tasks — and per-salt partial totals
    * merge in a final (tiny: candidates·S rows) aggregation. Exact same
    * candidate totals up to double-addition order. Leave at 1 for
    * oracle-compared paths where bitwise sum order matters. */
  def totals(candidates: DataFrame, members: DataFrame, groupCol: String,
      idCol: String, featCols: Seq[String],
      dist: (String => Column, String => Column) => Column,
      saltBuckets: Int = 1): DataFrame = {
    val right = members.select(
      col(groupCol).as("r_grp") +: featCols.map(c => col(c).as(s"r_$c")): _*)
    if (saltBuckets <= 1) {
      candidates
        .join(right, col(groupCol) === col("r_grp"))
        .groupBy(col(groupCol), col(idCol))
        .agg(sum(dist(c => col(c), c => col(s"r_$c"))).as("total"))
    } else {
      val saltedRight = right.withColumn("r_salt",
        pmod(hash(featCols.map(c => col(s"r_$c")): _*), lit(saltBuckets)))
      val saltedCand = candidates.withColumn("c_salt",
        explode(sequence(lit(0), lit(saltBuckets - 1))))
      saltedCand
        .join(saltedRight, col(groupCol) === col("r_grp") && col("c_salt") === col("r_salt"))
        .groupBy(col(groupCol), col(idCol), col("c_salt"))
        .agg(sum(dist(c => col(c), c => col(s"r_$c"))).as("partial"))
        .groupBy(col(groupCol), col(idCol))
        .agg(sum(col("partial")).as("total"))
    }
  }

  /** Argmin-by-total per group: `(groupCol, medoid_id)`. */
  def compute(candidates: DataFrame, members: DataFrame, groupCol: String,
      idCol: String, featCols: Seq[String],
      dist: (String => Column, String => Column) => Column,
      saltBuckets: Int = 1): DataFrame =
    totals(candidates, members, groupCol, idCol, featCols, dist, saltBuckets)
      .groupBy(col(groupCol))
      .agg(min_by(col(idCol), struct(col("total"), col(idCol))).as("medoid_id"))

  def compute(members: DataFrame, groupCol: String, idCol: String,
      featCols: Seq[String],
      dist: (String => Column, String => Column) => Column): DataFrame =
    compute(members, members, groupCol, idCol, featCols, dist)
}
