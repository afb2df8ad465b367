package graft

import graft.operators.IndexDrift
import org.apache.spark.sql.functions._

/** The shared drift-census core's arithmetic, pinned deterministically
  * (the three index tiers all route through it, so a wrong growth or
  * TVD here mislabels every persisted index at once).
  *
  * The empty-at-build case is the round-12 ADVICE (medium): the fixed
  * 1024-partition key-space censuses have empty partitions whenever the
  * corpus holds < ~7k distinct routing keys, and an unfloored growth
  * denominator made ONE benign novel row read growth ~1e12 — flagging a
  * healthy index STALE on every subsequent ingest. The floor is the
  * share one build row would have had, so a first arrival reads
  * ≈ nBuild/nLive (benign) while genuine concentration into an
  * empty-at-build partition still reads share·nBuild ≫ any threshold. */
class IndexDriftSpec extends SparkSpec {

  import spark.implicits._

  private def frame(rows: Seq[(Long, Long)], cnt: String) =
    rows.toDF("p", cnt)

  test("one live row in an empty-at-build partition is benign, not growth ~1e12") {
    val build = frame((0L until 10L).map(p => (p, 100L)), "n_build") // nBuild = 1000
    val live = frame((0L until 10L).map(p => (p, 100L)) :+ ((77L, 1L)), "n_live")
    val (tvd, maxGrowth, nb, nl) =
      IndexDrift.stats(IndexDrift.report(live, build, "p"))
    assert(nb === 1000L && nl === 1001L)
    // the novel row's growth = live_share / (1/nBuild) = (1/1001)·1000 ≈ 1
    assert(maxGrowth < 4.0, s"a single novel row must not trip maxGrowth: $maxGrowth")
    assert(tvd < 0.01, s"one row of a thousand is not drift: $tvd")
  }

  test("concentration into an empty-at-build partition still trips") {
    val build = frame((0L until 10L).map(p => (p, 100L)), "n_build") // nBuild = 1000
    // a drifted stream lands 500 rows in a partition that held zero
    val live = frame((0L until 10L).map(p => (p, 100L)) :+ ((77L, 500L)), "n_live")
    val (tvd, maxGrowth, _, _) =
      IndexDrift.stats(IndexDrift.report(live, build, "p"))
    // growth = (500/1500)·1000 ≈ 333 ≫ 4; a third of live mass moved
    assert(maxGrowth >= 4.0, s"concentrated drift must trip: $maxGrowth")
    assert(tvd >= 0.10, s"a third of probe mass moved: $tvd")
  }

  test("share-relative invariants: plain growth is invisible, shares sum to 1") {
    val build = frame((0L until 8L).map(p => (p, 10L + p)), "n_build")
    val live = frame((0L until 8L).map(p => (p, 3L * (10L + p))), "n_live")
    val rep = IndexDrift.report(live, build, "p").collect()
    assert(math.abs(rep.map(_.getAs[Double]("live_share")).sum - 1.0) < 1e-9)
    assert(math.abs(rep.map(_.getAs[Double]("build_share")).sum - 1.0) < 1e-9)
    val (tvd, maxGrowth, _, _) =
      IndexDrift.stats(IndexDrift.report(live, build, "p"))
    assert(tvd < 1e-9 && math.abs(maxGrowth - 1.0) < 1e-9,
      s"uniform ×3 growth must be invisible: tvd=$tvd growth=$maxGrowth")
  }

  test("a partition emptied by tombstone rewrite reads as shrink, not crash") {
    val build = frame((0L until 4L).map(p => (p, 100L)), "n_build")
    val live = frame((0L until 3L).map(p => (p, 100L)), "n_live") // p=3 gone
    val rep = IndexDrift.report(live, build, "p").collect()
    assert(rep.length === 4, "full outer must keep the emptied partition")
    val gone = rep.find(_.getAs[Long]("p") == 3L).get
    assert(gone.getAs[Long]("n_live") === 0L)
    assert(gone.getAs[Double]("growth") === 0.0)
  }
}
