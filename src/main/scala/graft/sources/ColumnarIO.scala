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

  // ---- schema evolution across file generations --------------------------

  /** Read a parquet directory whose files span schema GENERATIONS.
    * A 100-TB ingest directory is never one schema: columns get added
    * over months of pipeline evolution and the old files are not
    * rewritten. The default read binds ONE footer's schema (whichever
    * file is picked), silently dropping columns that only newer files
    * carry; `mergeSchema` unions the footers instead — new columns read
    * as NULL from old files (SchemaEvolutionSpec pins both behaviors). */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Lay down a deterministic two-generation directory from `docs` and
    * read it merged — the q217 registry form. Generation 1 (even
    * doc_ids) carries (doc_id, lang); generation 2 (odd doc_ids) adds a
    * `quality` column (n_chars). The oracle replays the SEMANTICS over
    * the source table, so the mergeSchema mechanics — union of footers,
    * null backfill — are what the hash gate actually exercises. The
    * laydown runs once per JVM (setup, not the measured read). */
  def schemaMergeDemo(spark: SparkSession, docs: DataFrame, tag: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_merge_$tag").toString
    graft.OncePerJvm(path) {
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"))
        .write.mode(SaveMode.Overwrite).parquet(path)
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("n_chars").as("quality"))
        .write.mode(SaveMode.Append).parquet(path)
    }
    readMerged(spark, path)
  }
}
