package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Stable identifier assignment. */
object Ids {

  /** Assign CONTIGUOUS 0-based ids in the total order of `orderCols`
    * (which must be a total order — include a tie-break column). The
    * naive form — `row_number()` over a global window — moves the whole
    * table through ONE task; this is the scale-safe shape: range-
    * partition + sort (a distributed sort, the same machinery as
    * `orderBy`), then `zipWithIndex` computes per-partition offsets with
    * one lightweight count job and stamps ids locally. Ids depend only
    * on the total order, not on partition boundaries, so the output is
    * deterministic. This is the one documented RDD use outside the codec
    * kernels: per-partition imperative offset arithmetic is exactly what
    * the RDD API is for; no DataFrame operator exposes it.
    *
    * `monotonically_increasing_id` is NOT a substitute: its ids are
    * sparse, partition-encoded, and order-free. */
  def assignContiguousIds(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = StructType(sorted.schema :+ StructField("row_id", LongType, nullable = false))
    sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }
}
