package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Columnar interchange beyond Parquet: ORC read/write (Spark-native
  * reader/writer, same vectorized scan + predicate pushdown + column
  * pruning as Parquet). A lakehouse ingests whatever the upstream
  * warehouse exports; ORC is the other columnar lingua franca, and the
  * round trip (snappy by default) must be value-exact for every type we
  * carry — the q-row gates an ORC round trip against an oracle that
  * never saw the ORC file.
  */
object ColumnarIO {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Write `df` as ORC under a session-scoped temp dir, read it back. */
  def orcRoundTrip(spark: SparkSession, df: DataFrame, tag: String): DataFrame = {
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_orc_$tag").toString
    writeOrc(df, dir)
    readOrc(spark, dir)
  }
}
