package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Structured Streaming surface: the streaming plans must produce the
  * batch answers when run to completion (stream-batch unification). */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, "2024-01-01 00:10:00", 10L, "click", 1.5),
    (2L, "2024-01-01 00:40:00", 10L, "click", 2.5),
    (3L, "2024-01-01 01:10:00", 10L, "view", 4.0),
    (4L, "2024-01-01 01:20:00", 11L, "click", 8.0),
    (5L, "2024-01-01 03:00:00", 10L, "click", 16.0))

  test("hourly windowed counts: streaming equals batch") {
    import spark.implicits._
    val batchDf = events
      .map { case (id, t, u, ty, v) => (id, ts(t), u, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val expected = StreamOps.hourlyCounts(batchDf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = StreamOps.hourlyCountsStream(streamDf)
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Complete()).start()
    try {
      stream.addData(events.map { case (id, t, u, ty, v) => (id, ts(t), u, ty, v) })
      query.processAllAvailable()
      val got = spark.table("hourly").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === expected)
    } finally query.stop()
  }

  test("file-source stream over the real events table equals batch") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    val expected = StreamOps.hourlyCounts(Tables.events(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // readStream needs an explicit schema; take it from the batch reader so
    // the test tracks the testdata generation (nanos-as-long vs NTZ micros)
    val schema = Tables.load(spark, dir, "events").schema
    // file streams consume a DIRECTORY; stage the single-file table
    val stage = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val streamDf = Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(stage.toString))
    val query = StreamOps.hourlyCountsStream(streamDf)
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    try {
      query.awaitTermination(120000)
      val got = spark.table("file_hourly").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === expected)
    } finally query.stop()
  }

  test("hopping windows: streaming equals batch (each event in 2 windows)") {
    import spark.implicits._
    val batchDf = events
      .map { case (id, t, u, ty, v) => (id, ts(t), u, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val expectedRows = StreamOps.hoppingCounts(batchDf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(expectedRows.map(_._3).sum === 2L * events.size, "every event lands in 2 windows")
    val expected = expectedRows.toSet

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = StreamOps.hoppingCountsStream(streamDf)
      .writeStream.format("memory").queryName("hopping")
      .outputMode(OutputMode.Complete()).start()
    try {
      stream.addData(events.map { case (id, t, u, ty, v) => (id, ts(t), u, ty, v) })
      query.processAllAvailable()
      val got = spark.table("hopping").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === expected)
    } finally query.stop()
  }

  test("streaming anomaly gate == batch zScoreOutliers (static stats, zero state)") {
    import spark.implicits._
    import graft.operators.QualityChecks
    // baseline batch: tight cluster + one spike per type
    val base = (1 to 40).map(i =>
      (i.toLong, "click", 10.0 + (if (i % 2 == 0) 0.25 else -0.25))) ++
      Seq((98L, "click", 42.0)) ++
      (50 to 80).map(i => (i.toLong, "view", 5.0)) // zero variance: never flags
    val batchDf = base.toDF("event_id", "event_type", "value")
    val stats = QualityChecks.groupStats(batchDf, "event_type", "value")
      .localCheckpoint() // static side: materialized, like a persisted baseline
    val expected = QualityChecks
      .scoreAgainstStats(batchDf, stats, "event_type", "value", Seq("event_id"), 3.0)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(expected.map(_._1) === Set(98L), s"sanity: only the spike flags: $expected")

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Double)]
    val streamDf = stream.toDF().toDF("event_id", "event_type", "value")
    val query = StreamOps.anomalyStream(streamDf, stats, "event_type", "value",
        Seq("event_id"), 3.0)
      .writeStream.format("memory").queryName("anomalies")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(base)
      query.processAllAvailable()
      val got = spark.table("anomalies").collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSet
      assert(got === expected, "stream must equal batch bit-for-bit (shared scoring)")
    } finally query.stop()
  }

  test("streaming dedup keeps first occurrence per key within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val df = stream.toDF().toDF("event_id", "ts", "event_type")
    val query = StreamOps.streamingDedup(df, Seq("event_id"))
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(Seq(
        (1L, ts("2024-01-01 00:10:00"), "click"),
        (1L, ts("2024-01-01 00:11:00"), "dup"),
        (2L, ts("2024-01-01 00:12:00"), "view"),
        (1L, ts("2024-01-01 00:13:00"), "dup2")))
      query.processAllAvailable()
      val got = spark.table("deduped").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet
      assert(got === Set((1L, "click"), (2L, "view")))
    } finally query.stop()
  }

  test("streaming heavy hitters: bounded MG state equals the sequential reference, across batch splits") {
    import spark.implicits._
    import graft.streaming.{TokIn, HhOut}
    implicit val sqlCtx = spark.sqlContext
    // token stream with a dominant token per group; k=3 -> 2 counters
    val toks = Seq("a", "a", "b", "a", "c", "a", "b", "a", "d", "a")
      .zipWithIndex.map { case (t, i) => TokIn("g", t.hashCode.toLong, i.toLong) }
    val reference = toks.foldLeft(Map.empty[Long, Long]) {
      (m, e) => StreamOps.mgUpdate(m, e.wh, 3)
    }
    def runSplit(batches: Seq[Seq[TokIn]]): Map[Long, Long] = {
      val stream = MemoryStream[TokIn]
      val query = StreamOps.streamingHeavyHitters(stream.toDS(), 3)
        .writeStream.format("memory").queryName("hh")
        .outputMode(OutputMode.Update()).start()
      try {
        batches.foreach { b => stream.addData(b); query.processAllAvailable() }
        val rows = spark.table("hh").as[HhOut].collect()
        val maxVer = rows.map(_.ver).max
        rows.filter(_.ver == maxVer).map(h => h.wh -> h.lower).toMap
      } finally { query.stop(); spark.sql("DROP TABLE IF EXISTS hh") }
    }
    val oneShot = runSplit(Seq(toks))
    val split = runSplit(Seq(toks.take(4), toks.slice(4, 7), toks.drop(7)))
    assert(oneShot === reference, s"one-batch fold == driver reference: $oneShot vs $reference")
    assert(split === reference, "state carries: 3 triggers == 1 trigger == reference")
    // the MG guarantee at this prefix: 'a' (6 of 10 > 10/3) must be present
    assert(oneShot.contains("a".hashCode.toLong), "dominant token can never be evicted")
    assert(oneShot.size <= 2, "state stays bounded at k-1 counters")
  }

  test("streaming grouped quantiles: per-group KLL state equals the sequential reference bit-for-bit, across batch splits") {
    import spark.implicits._
    import graft.streaming.{NumIn, KllOut}
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11L)
    // two groups at different scales, enough rows to force compactions
    // (k=16) so the equality covers the non-trivial sketch path
    val events = (0 until 800).map { i =>
      val g = s"g${i % 2}"
      NumIn(g, math.floor(math.exp(rnd.nextGaussian() + (i % 2)) * 100) / 100, i.toLong)
    }
    val ps = Seq(0.5, 0.9)
    // driver-side sequential reference: the same update order the stream
    // folds in — sequential updates have NO merge, so equality is exact
    val reference = events.groupBy(_.grp).map { case (g, evs) =>
      val sk = graft.operators.KllSketch.empty(16)
      evs.sortBy(_.seq).foreach(e => sk.update(e.v))
      g -> ps.map(p => (p, sk.quantile(p), sk.n))
    }
    def runSplit(batches: Seq[Seq[NumIn]]): Map[String, Seq[(Double, Double, Long)]] = {
      val stream = MemoryStream[NumIn]
      val query = StreamOps.streamingGroupedQuantiles(stream.toDS(), ps, 16)
        .writeStream.format("memory").queryName("kllq")
        .outputMode(OutputMode.Update()).start()
      try {
        batches.foreach { b => stream.addData(b); query.processAllAvailable() }
        val rows = spark.table("kllq").as[KllOut].collect()
        rows.groupBy(_.grp).map { case (g, rs) =>
          val maxVer = rs.map(_.ver).max
          g -> rs.filter(_.ver == maxVer).sortBy(_.p)
            .map(r => (r.p, r.value_est, r.n)).toSeq
        }
      } finally { query.stop(); spark.sql("DROP TABLE IF EXISTS kllq") }
    }
    val oneShot = runSplit(Seq(events))
    val split = runSplit(Seq(events.take(300), events.slice(300, 550), events.drop(550)))
    assert(oneShot === reference.toMap,
      "one-batch stream fold == driver-side sequential reference, exactly")
    assert(split === reference.toMap,
      "state carries: 3 triggers == 1 trigger == reference, exactly (no merge in the path)")
  }

  test("stream-stream join: clicks joined to purchases within the window, equals batch") {
    import spark.implicits._
    val clickRows = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10L),
      (2L, ts("2024-01-01 02:00:00"), 10L),
      (3L, ts("2024-01-01 00:20:00"), 11L))
    val purchaseRows = Seq(
      (100L, ts("2024-01-01 00:40:00"), 10L), // within 60m of click 1
      (101L, ts("2024-01-01 04:00:00"), 10L), // beyond both windows
      (102L, ts("2024-01-01 00:15:00"), 11L)) // BEFORE click 3 → excluded
    def df(rows: Seq[(Long, Timestamp, Long)]) =
      rows.toDF("event_id", "ts", "user_id")
    val expected = StreamOps.clickToPurchase(df(clickRows), df(purchaseRows))
      .select("click_id", "purchase_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected === Set((1L, 100L)))

    implicit val sqlCtx = spark.sqlContext
    val cs = MemoryStream[(Long, Timestamp, Long)]
    val ps = MemoryStream[(Long, Timestamp, Long)]
    val query = StreamOps.clickToPurchase(
        cs.toDF().toDF("event_id", "ts", "user_id"),
        ps.toDF().toDF("event_id", "ts", "user_id"))
      .writeStream.format("memory").queryName("attribution")
      .outputMode(OutputMode.Append()).start()
    try {
      cs.addData(clickRows); ps.addData(purchaseRows)
      query.processAllAvailable()
      val got = spark.table("attribution")
        .select("click_id", "purchase_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
    } finally query.stop()
  }

  test("stream-stream LEFT OUTER join: unmatched clicks emit nulls once the watermark passes") {
    import spark.implicits._
    // click 1 converts, click 2 never does; the far-future pusher rows
    // advance BOTH watermarks so click 2's window provably closed
    val clicks = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10L),
      (2L, ts("2024-01-01 00:15:00"), 11L))
    val purchases = Seq((100L, ts("2024-01-01 00:40:00"), 10L))
    val pusherC = (99L, ts("2024-01-01 10:00:00"), 50L)
    val pusherP = (199L, ts("2024-01-01 10:00:00"), 51L)

    def df(rows: Seq[(Long, java.sql.Timestamp, Long)]) =
      rows.toDF("event_id", "ts", "user_id")
    val expected = StreamOps
      .clickToPurchaseOuter(df(clicks :+ pusherC), df(purchases :+ pusherP))
      .collect().map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
      .filter(_._1 != 99L).toSet
    assert(expected === Set(1L -> Some(100L), 2L -> None), s"batch sanity: $expected")

    implicit val sqlCtx = spark.sqlContext
    val cs = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val ps = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val query = StreamOps.clickToPurchaseOuter(
        cs.toDF().toDF("event_id", "ts", "user_id"),
        ps.toDF().toDF("event_id", "ts", "user_id"))
      .writeStream.format("memory").queryName("outer_join")
      .outputMode(OutputMode.Append()).start()
    try {
      cs.addData(clicks); ps.addData(purchases)
      query.processAllAvailable()
      cs.addData(Seq(pusherC)); ps.addData(Seq(pusherP))
      query.processAllAvailable()
      // one more micro-batch so the state store flushes rows the pusher
      // batch's new watermark released
      cs.addData(Seq((98L, ts("2024-01-01 11:00:00"), 52L)))
      query.processAllAvailable()
      val got = spark.table("outer_join").collect()
        .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
        .filter(t => t._1 != 99L && t._1 != 98L).toSet
      assert(got === expected, "stream must equal batch once windows provably closed")
    } finally query.stop()
  }

  test("sessionize: flatMapGroupsWithState matches batch gaps-and-islands") {
    import spark.implicits._
    val batchDf = events
      .map { case (id, t, u, ty, v) => (id, ts(t), u, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // gap is "> 30 min": 00:40→01:10 is exactly 30 min → same session.
    // user 10 → {00:10..01:10 n3}, {03:00 n1}; user 11 → {01:20 n1}
    val batch = StreamOps.sessionizeBatch(batchDf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Int]("n_events"))).toSet
    assert(batch === Set((10L, 1L, 3), (10L, 2L, 1), (11L, 1L, 1)))

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamOps.Event]
    val query = StreamOps.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(events.map { case (_, t, u, ty, _) => StreamOps.Event(u, ts(t), ty) })
      query.processAllAvailable()
      def sessions() = spark.table("sessions").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("n_events"))).toSet
      // trigger 1: user 10's in-batch gap closes the first session (n=3);
      // open sessions (10: 03:00, 11: 01:20) remain in state
      assert(sessions() === Set((10L, 3)))
      // a late-hour event advances the watermark past both gap deadlines →
      // event-time timeouts flush the open sessions
      stream.addData(StreamOps.Event(12L, ts("2024-01-01 10:00:00"), "click"))
      query.processAllAvailable()
      assert(sessions() === Set((10L, 3), (10L, 1), (11L, 1)))
    } finally query.stop()
  }

  test("streaming as-of enrich == batch as-of join (ordered replay, real events)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val in = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), (col("event_type") === "view").as("is_view"), col("value"))
      .as[StreamOps.EnrichIn].collect()
      .sortBy(e => (e.ts_us, !e.is_view, e.event_id))
    val stream = MemoryStream[StreamOps.EnrichIn]
    val query = StreamOps.asOfEnrich(stream.toDS())
      .writeStream.format("memory").queryName("asof")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(in.toSeq)
      query.processAllAvailable()
      val got = spark.table("asof").collect()
        .map(r => (r.getLong(0), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("click_us"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"),
          unix_micros(col("ts")).as("view_us"), col("value").as("view_value"))
      val want = graft.operators.AsOfJoin
        .asOf(clicks, views, "user_id", "ts", Seq("view_us", "view_value"), "event_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Double]))).toSet
      assert(got.nonEmpty && got === want)
    } finally query.stop()
  }

  test("range join with a STREAMING points side == batch (same operator)") {
    import graft.operators.RangeJoin
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // static intervals (micros): [0,90m], [60m,120m] overlap; [5h,6h] far
    val mi = 60L * 1000000 * 60 / 60 // one minute in micros
    val intervals = Seq((1L, 0L * mi, 90L * mi), (2L, 60L * mi, 120L * mi),
      (3L, 300L * mi, 360L * mi)).toDF("iv_id", "lo_us", "hi_us")
    val points = Seq((10L, 30L * mi), (11L, 75L * mi), (12L, 200L * mi))
    val batch = RangeJoin.pointInInterval(
        points.toDF("p_id", "ts_us"), intervals, "ts_us", "lo_us", "hi_us")
      .select("p_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stream = MemoryStream[(Long, Long)]
    val query = RangeJoin.pointInInterval(
        stream.toDF().toDF("p_id", "ts_us"), intervals, "ts_us", "lo_us", "hi_us")
      .select("p_id", "iv_id")
      .writeStream.format("memory").queryName("range_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(points)
      query.processAllAvailable()
      val got = spark.table("range_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === batch)
      assert(got === Set((10L, 1L), (11L, 1L), (11L, 2L)))
    } finally query.stop()
  }

  test("streaming decontamination == batch gram-overlap counts") {
    import graft.operators.Dedup
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val run = (1 to 14).map(i => s"w$i").mkString(" ") // 14 tokens → 2 grams
    val bench = Seq((100L, run, "eval")).toDF("doc_id", "text", "source")
    // doc 1 shares the full run (2 gram hits); doc 2 shares a shifted
    // 13-token suffix run (1 hit); doc 3 is clean
    val arriving = Seq(
      (1L, "2024-01-01 00:01:00", run),
      (2L, "2024-01-01 00:02:00", (2 to 14).map(i => s"w$i").mkString(" ") + " z1"),
      (3L, "2024-01-01 00:03:00", (1 to 14).map(i => s"q$i").mkString(" ")))
    val batchWant = Dedup.contaminatedDocs(
        arriving.map { case (id, _, t) => (id, t, "s") }.toDF("doc_id", "text", "source"),
        bench)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stream = MemoryStream[(Long, Timestamp, String)]
    val query = StreamOps.streamingDecontaminate(
        stream.toDF().toDF("doc_id", "ts", "text"), bench)
      .writeStream.format("memory").queryName("decon")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(arriving.map { case (id, t, txt) => (id, ts(t), txt) })
      query.processAllAvailable()
      // push the watermark past the batch so its append results emit
      stream.addData(Seq((99L, ts("2024-01-01 06:00:00"), "tick")))
      query.processAllAvailable()
      val got = spark.table("decon").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === batchWant)
      assert(got === Set((1L, 2L), (2L, 1L)))
    } finally query.stop()
  }

  test("streaming chunk flag == batch blocklist probe, clean docs report zero") {
    import graft.functions.TextHash
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(29L)
    val vocab = Vector("alpha", "beta7", "gam", "delta42", "ep", "zeta")
    def mk(n: Int) = (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val footer = mk(60)
    // blocklist = the footer's own chunks
    val blocklist = Seq(footer).toDF("text")
      .select(explode(TextHash.cdcChunkHashes(col("text"), 16)).as("packed"))
    val arriving = Seq(
      (1L, "2024-01-01 00:01:00", mk(40) + " " + footer), // carries boilerplate
      (2L, "2024-01-01 00:02:00", mk(50)))                // clean
    val batchWant = {
      val b = arriving.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text")
        .select(col("doc_id"), explode(TextHash.cdcChunkHashes(col("text"), 16)).as("packed"))
        .join(broadcast(blocklist.distinct().withColumn("hit", lit(1L))), Seq("packed"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), coalesce(sum(col("hit")), lit(0L)).as("nb"))
      b.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val stream = MemoryStream[(Long, Timestamp, String)]
    val query = StreamOps.streamingChunkFlag(
        stream.toDF().toDF("doc_id", "ts", "text"), blocklist)
      .writeStream.format("memory").queryName("chunkflag")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(arriving.map { case (id, t, txt) => (id, ts(t), txt) })
      query.processAllAvailable()
      stream.addData(Seq((99L, ts("2024-01-01 06:00:00"), "tick")))
      query.processAllAvailable()
      val got = spark.table("chunkflag").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === batchWant)
      val flagged = got.find(_._1 == 1L).get
      assert(flagged._3 > 0, s"doc 1 must hit the blocklist: $got")
      assert(got.find(_._1 == 2L).get._3 === 0L, s"doc 2 must be clean: $got")
    } finally query.stop()
  }

  test("stream-static ingest dedup against the band index == batch indexed path") {
    import graft.operators.Dedup
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Seq("sidx_bands", "sidx_sets").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val corpus = Seq(
        (10L, "alpha beta gamma delta epsilon zeta eta theta", "web"),
        (20L, "one two three four five six seven eight nine", "web"),
        (99L, "completely unrelated content lives over here now", "book")
      ).toDF("doc_id", "text", "source")
      Dedup.writeBandIndex(corpus, "sidx", buckets = 4)
      // arriving docs: near-copies of 10 and 20 plus a novel one
      val arriving = Seq(
        (1010L, "2024-01-01 00:01:00", "beta gamma delta epsilon zeta eta theta", "web"),
        (1020L, "2024-01-01 00:02:00", "two three four five six seven eight nine", "web"),
        (1099L, "2024-01-01 00:03:00", "q1 q2 q3 q4 q5 q6 q7 q8", "book"))
        .map { case (id, t, txt, src) => (id, ts(t), txt, src) }
      val stream = MemoryStream[(Long, Timestamp, String, String)]
      val streamDf = stream.toDF().toDF("doc_id", "ts", "text", "source")
      val query = StreamOps.streamingIngestDedup(spark, streamDf, "sidx")
        .writeStream.format("memory").queryName("ingest_dedup")
        .outputMode(OutputMode.Append()).start()
      try {
        stream.addData(arriving)
        query.processAllAvailable()
        val got = spark.table("ingest_dedup").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val want = Dedup.incrementalNearDupPairsIndexed(spark,
            arriving.toDF("doc_id", "ts", "text", "source"), "sidx")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(got.nonEmpty && got === want)
        assert(got.map(p => (p._1, p._2)) === Set((1010L, 10L), (1020L, 20L)))
      } finally query.stop()
    } finally
      Seq("sidx_bands", "sidx_sets").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("streaming funnel == batch conversion (ordered replay, real events)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val in = ev.filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .as[StreamOps.FunnelIn].collect().sortBy(_.ts_us)
    val stream = MemoryStream[StreamOps.FunnelIn]
    val query = StreamOps.funnelStream(stream.toDS(), "click", "purchase", 3600000000L)
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Update()).start()
    try {
      // two triggers: only users whose state changed re-emit in trigger 2
      val (first, second) = in.splitAt(in.length / 2)
      stream.addData(first.toSeq)
      query.processAllAvailable()
      stream.addData(second.toSeq)
      query.processAllAvailable()
      // per user, emissions grow monotonically more complete (a_us fixed
      // once set, b_us set at most once) — the most complete row is final
      val got = spark.table("funnel").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3)))
        .groupBy(_._1)
        .map { case (_, rows) => rows.maxBy(x => (x._3.isDefined, x._3)) }.toSet
      val batch = graft.operators.Funnels.conversion(
        ev.select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us")),
        "event_type", "user_id", "ts_us", "click", "purchase", 3600000000L)
      val want = batch.collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3))).toSet
      assert(got.nonEmpty && got === want)
    } finally query.stop()
  }

  test("native session_window stream == batch over the real events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"))
    val expected = StreamOps.sessionWindowCounts(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val in = ev.select(col("event_id"), col("ts").cast("timestamp"), col("user_id"))
      .as[(Long, java.sql.Timestamp, Long)].collect()
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val query = StreamOps.sessionWindowCountsStream(
        stream.toDF().toDF("event_id", "ts", "user_id"))
      .writeStream.format("memory").queryName("sesswin")
      .outputMode(OutputMode.Complete()).start()
    try {
      val (a, b) = in.splitAt(in.length / 2)
      stream.addData(a.toSeq); query.processAllAvailable()
      stream.addData(b.toSeq); query.processAllAvailable()
      val got = spark.table("sesswin").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got.nonEmpty && got === expected,
        "native session windows must merge identically in stream and batch")
    } finally query.stop()
  }

  test("streaming transitions == batch matrix; state bridges trigger boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val in = ev.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[StreamOps.TransIn].collect().sortBy(e => (e.ts_us, e.event_id))
    def run(chunks: Seq[Seq[StreamOps.TransIn]], name: String): Map[(String, String), Long] = {
      val stream = MemoryStream[StreamOps.TransIn]
      val query = StreamOps.transitionStream(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        chunks.foreach { c => stream.addData(c); query.processAllAvailable() }
        spark.table(name).collect()
          .groupBy(r => (r.getString(0), r.getString(1)))
          .map { case (k, rs) => k -> rs.length.toLong }
      } finally query.stop()
    }
    val split = run(Seq(in.take(in.length / 2).toSeq, in.drop(in.length / 2).toSeq), "trans2")
    val once = run(Seq(in.toSeq), "trans1")
    val batch = graft.operators.TimeSeries.transitionMatrix(
        ev, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(split.nonEmpty && split === batch,
      "split-trigger stream must equal the batch lag-window matrix")
    assert(once === batch, "single-trigger stream must equal the batch matrix")
  }

  test("streaming CDC apply: sequential batches == one batch apply of the full feed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val feed1 = Seq((2L, "B", 21.0, "U", 1L), (4L, "d", 40.0, "I", 2L))
    val feed2 = Seq((3L, "c", 0.0, "D", 3L), (4L, "D2", 41.0, "U", 4L))
    val stream = MemoryStream[(Long, String, Double, String, Long)]
    @volatile var last: Option[org.apache.spark.sql.DataFrame] = None
    val query = StreamOps.streamingCdcApply(
      stream.toDF().toDF("k", "s", "v", "op", "seq"), base, "k", "seq", "op")(
      snap => last = Some(snap))
    try {
      stream.addData(feed1); query.processAllAvailable()
      stream.addData(feed2); query.processAllAvailable()
      val got = last.get.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      val want = graft.operators.Maintenance.cdcUpsert(base,
          (feed1 ++ feed2).toDF("k", "s", "v", "op", "seq"), "k", "seq", "op")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got === want)
      assert(got === Set((1L, "a", 10.0), (2L, "B", 21.0), (4L, "D2", 41.0)))
    } finally query.stop()
  }

  test("streaming canonical fold: sequential edge batches == one incremental fold, bridging included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // existing components: {1,2,3} -> 1 and {8,9} -> 8
    val existing = graft.operators.Dedup.canonicalAssignments(
      Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("id_a", "id_b"))
    // batch 1 attaches 4 to component 1; batch 2 BRIDGES components 1
    // and 8 through (3,8) — the old canonical 8 must relabel to 1 —
    // and opens a fresh component {20,21}
    val feed1 = Seq((4L, 2L))
    val feed2 = Seq((3L, 8L), (20L, 21L))
    val stream = MemoryStream[(Long, Long)]
    @volatile var last: Option[org.apache.spark.sql.DataFrame] = None
    val query = StreamOps.streamingCanonicalFold(
      stream.toDF().toDF("id_a", "id_b"), existing)(a => last = Some(a))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      stream.addData(feed1); query.processAllAvailable()
      stream.addData(feed2); query.processAllAvailable()
      val got = pairs(last.get)
      val want = pairs(graft.operators.Dedup.incrementalCanonical(
        existing, (feed1 ++ feed2).toDF("id_a", "id_b")))
      assert(got === want, "stream fold must equal the one-shot batch fold")
      assert(Set(2L, 3L, 4L, 8L, 9L).forall(got(_) == 1L),
        s"bridged components must share canonical 1: $got")
      assert(got(21L) === 20L, s"fresh component must canonicalize to 20: $got")
    } finally query.stop()
  }

  test("streaming simhash fold: doc batches == batch simhashAssignments, arrival-order invariant") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.operators.Dedup.withNearDuplicates(
        Tables.load(spark, "/root/testdata/sf0.001", "documents"))
      .select(col("doc_id"), col("text"), col("source"))
    val want = graft.operators.Dedup.simhashAssignments(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(want.exists { case (d, c) => d != c },
      "fixture must contain at least one nontrivial simhash component")
    // copies (ids ≥ 1e6) arrive BEFORE their originals: the stream's
    // arrival rep for a shared fingerprint is NOT the group minimum —
    // exactly the case the fingerprint-level min-label argument covers
    val ordered = corpus.as[(Long, String, String)].collect().toSeq.sortBy(-_._1)
    val stream = MemoryStream[(Long, String, String)]
    @volatile var last: Option[org.apache.spark.sql.DataFrame] = None
    val query = StreamOps.streamingSimhashAssignFold(
      stream.toDF().toDF("doc_id", "text", "source"))(a => last = Some(a))
    try {
      ordered.grouped(math.max(1, ordered.size / 3)).foreach { b =>
        stream.addData(b); query.processAllAvailable()
      }
      val got = last.get.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want,
        "3-batch simhash fold must equal one-shot batch simhashAssignments")
    } finally query.stop()
  }

  test("streaming IVF fold over a TWO-LEVEL index routes coarse-over-fine and equals batch ivf2SemDedup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = "sivf2"
    Seq(s"${idx}_ivfcells", s"${idx}_ivfcentroids", s"${idx}_ivfcensus", s"${idx}_ivfcoarse")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val aug = graft.operators.Similarity.withNearDupEmbeddings(
        Tables.load(spark, "/root/testdata/sf0.001", "embeddings"))
      // the pinned batch twin is the TWO-LEVEL form: same fixed
      // quantizers as the index (deterministic training on the same
      // corpus), same NearestCellsTwoLevel membership kernel
      val want = graft.operators.Similarity.ivf2SemDedup(aug, 0.9)
        .collect().map(_.getLong(0)).toSet
      val allIds = aug.select(col("vec_id")).collect().map(_.getLong(0)).toSet
      assert(want.size < allIds.size, "fixture must contain removable near-dups")
      graft.operators.Similarity.writeCellIndex(aug, idx, twoLevel = true)
      assert(spark.catalog.tableExists(s"${idx}_ivfcoarse"),
        "two-level build must store the coarse quantizer")
      // copies (ids >= 1e6) arrive BEFORE their originals, 3 batches
      val ordered = aug.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().toSeq.sortBy(-_._1)
      val stream = MemoryStream[(Long, Array[Float])]
      @volatile var last: Option[org.apache.spark.sql.DataFrame] = None
      val query = StreamOps.streamingIvfSemDedupFold(
        stream.toDF().toDF("vec_id", "embedding"), idx)(a => last = Some(a))
      try {
        ordered.grouped(math.max(1, ordered.size / 3)).foreach { b =>
          stream.addData(b); query.processAllAvailable()
        }
        val assignment = last.get.collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val removed = assignment.collect { case (d, c) if d != c => d }.toSet
        assert(removed.nonEmpty)
        assert(allIds -- removed === want,
          "3-batch two-level IVF fold survivors must equal one-shot batch ivf2SemDedup")
      } finally query.stop()

      // arrivals append through the SAME two-level routing (auto-detected
      // from the stored coarse table) and are immediately probe-visible
      val novel = aug.filter(col("vec_id") === 0L)
        .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))
      graft.operators.Similarity.appendToCellIndex(spark, novel, idx)
      val fine = graft.operators.Similarity.readCellCentroids(spark, idx)
      val (coarse, members) = graft.operators.Similarity.readCoarseCells(spark, idx)
      val hits = graft.operators.Similarity.ivfIndexProbeEdgesTwoLevel(
          spark, aug.filter(col("vec_id") === 0L).select(col("vec_id"), col("embedding")),
          idx, fine, coarse, members, 0.999)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(hits.contains((0L, 5000000L)),
        "an appended exact copy must surface on the next two-level probe")
    } finally
      Seq(s"${idx}_ivfcells", s"${idx}_ivfcentroids", s"${idx}_ivfcensus", s"${idx}_ivfcoarse")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("streaming IVF fold: vector batches probing the persisted cell index == batch ivfSemDedup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = "sivf"
    Seq(s"${idx}_ivfcells", s"${idx}_ivfcentroids", s"${idx}_ivfcensus")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val aug = graft.operators.Similarity.withNearDupEmbeddings(
        Tables.load(spark, "/root/testdata/sf0.001", "embeddings"))
      val want = graft.operators.Similarity.ivfSemDedup(aug, 0.9)
        .collect().map(_.getLong(0)).toSet
      val allIds = aug.select(col("vec_id")).collect().map(_.getLong(0)).toSet
      assert(want.size < allIds.size, "fixture must contain removable near-dups")
      // the index holds the corpus the batch form learns from (same
      // learnCellsSampled recipe inside writeCellIndex), so the fixed
      // stored quantizer routes arrivals through ivfSemDedup's cells
      graft.operators.Similarity.writeCellIndex(aug, idx)
      // near-dup copies (ids >= 1e6) arrive BEFORE their originals —
      // the CC min-label must still settle on the group minimum
      val ordered = aug.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().toSeq.sortBy(-_._1)
      val stream = MemoryStream[(Long, Array[Float])]
      @volatile var last: Option[org.apache.spark.sql.DataFrame] = None
      val query = StreamOps.streamingIvfSemDedupFold(
        stream.toDF().toDF("vec_id", "embedding"), idx)(a => last = Some(a))
      try {
        ordered.grouped(math.max(1, ordered.size / 3)).foreach { b =>
          stream.addData(b); query.processAllAvailable()
        }
        val assignment = last.get.collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val removed = assignment.collect { case (d, c) if d != c => d }.toSet
        assert(removed.nonEmpty)
        assert(allIds -- removed === want,
          "3-batch IVF fold survivors must equal one-shot batch ivfSemDedup")
      } finally query.stop()

      // lifecycle: appended arrivals land in the same cell layout and
      // are immediately probe-visible (fixed stored quantizer)
      val novel = aug.filter(col("vec_id") === 0L)
        .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))
      graft.operators.Similarity.appendToCellIndex(spark, novel, idx)
      val centroids = graft.operators.Similarity.readCellCentroids(spark, idx)
      val hits = graft.operators.Similarity.ivfIndexProbeEdges(
          spark, aug.filter(col("vec_id") === 0L).select(col("vec_id"), col("embedding")),
          idx, centroids, 0.999)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(hits.contains((0L, 5000000L)),
        "an appended exact copy must surface on the next probe")
    } finally
      Seq(s"${idx}_ivfcells", s"${idx}_ivfcentroids", s"${idx}_ivfcensus")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("streaming quantile fold: stream fold matches exact ranks within the sketch bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7L)
    val xs = Array.fill(30000)(math.floor(rnd.nextGaussian() * 10000) / 100)
    val stream = MemoryStream[Double]
    @volatile var last: Option[graft.operators.KllSketch] = None
    val query = StreamOps.streamingQuantileFold(
      stream.toDF().toDF("v"), "v")(s => last = Some(s))
    try {
      xs.grouped(10000).foreach { c => stream.addData(c.toSeq); query.processAllAvailable() }
      val s = last.get
      assert(s.n === xs.length, "every batch's values must fold in exactly once")
      val sorted = xs.sorted
      for (p <- Seq(0.1, 0.5, 0.9)) {
        val exactRank = sorted.count(_ <= s.quantile(p))
        val target = math.ceil(p * xs.length).toLong
        assert(math.abs(exactRank - target) <= math.max(2L, (0.03 * xs.length).toLong),
          s"p=$p: stream-folded sketch rank $exactRank vs target $target")
      }
    } finally query.stop()
  }

  test("streaming count-min fold: folded counters equal the one-shot batch sketch exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("text").as[String].collect().toSeq
    val (rows, width) = (4, 64)
    // batch reference matrix over the whole corpus
    val ref = Array.fill(rows)(new Array[Long](width))
    graft.operators.TextAnalysis.countMinCounters(docs.toDF("text"), rows, width)
      .collect().foreach(r => ref(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getLong(2))
    val stream = MemoryStream[String]
    @volatile var last: Array[Array[Long]] = null
    val query = StreamOps.streamingCountMinFold(
      stream.toDF().toDF("text"), rows, width)(m => last = m)
    try {
      docs.grouped(math.max(1, docs.size / 3)).foreach { b =>
        stream.addData(b); query.processAllAvailable()
      }
      // EXACT equality, not a bound: counter matrices are additive, so
      // the 3-batch fold is the one-shot sketch cell for cell
      assert(last != null)
      for (r <- 0 until rows; c <- 0 until width)
        assert(last(r)(c) === ref(r)(c), s"cell ($r,$c)")
      // one-sided error on a point estimate: min over rows >= exact
      val est = graft.operators.TextAnalysis
        .countMinEstimates(docs.toDF("text"), rows, width)
      assert(est.filter(col("est") < col("exact")).count() === 0)
    } finally query.stop()
  }

  test("streaming HLL fold: register max-merge equals the one-shot batch sketch bit for bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (1 to 5000).map(i => (s"g${i % 3}", (i % (700 + 100 * (i % 3))).toLong))
    val batchRegs = graft.operators.QualityChecks
      .hllRegisters(rows.toDF("g", "uid"), Seq("g"), "uid")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val stream = MemoryStream[(String, Long)]
    @volatile var last: Map[(String, Int), Int] = Map.empty
    val query = StreamOps.streamingHllFold(
      stream.toDF().toDF("g", "uid"), "g", "uid")(m => last = m)
    try {
      rows.grouped(1700).foreach { b => stream.addData(b); query.processAllAvailable() }
      assert(last === batchRegs, "streamed registers == batch registers, every cell")
      // and the driver-side harmonic fold reproduces the frame fold's
      // double EXACTLY, group by group
      val frameEst = graft.operators.QualityChecks
        .hllDistinct(rows.toDF("g", "uid"), "g", "uid")
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      val streamEst = last.groupBy(_._1._1).map { case (g, regs) =>
        g -> graft.operators.QualityChecks.hllRawEstimateOf(
          regs.map { case ((_, j), mj) => (j, mj) })
      }
      assert(streamEst === frameEst, "driver harmonic fold == frame harmonic fold")
    } finally query.stop()
  }

  test("streaming bottom-k fold: per-stratum sample equals the one-shot batch sample exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // batch reference: the oracle-gated q209 form on the same rows
    val ref = graft.operators.TextAnalysis
      .stratifiedSampleAgg(docs.toDF("doc_id", "lang", "text"), "lang", 5)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet // (lang, doc_id)
    val stream = MemoryStream[(Long, String, String)]
    @volatile var last: Map[String, Seq[(Long, Long)]] = Map.empty
    val query = StreamOps.streamingBottomKFold(
      stream.toDF().toDF("doc_id", "lang", "text"), "lang", 5)(m => last = m)
    try {
      docs.grouped(math.max(1, docs.size / 4)).foreach { b =>
        stream.addData(b); query.processAllAvailable()
      }
      val streamed = last.toSeq.flatMap { case (s, top) => top.map(p => (s, p._2)) }.toSet
      assert(streamed === ref,
        "4-batch fold == one-shot batch sample, every (stratum, doc)")
      assert(last.values.forall(_.size <= 5), "state bounded at k per stratum")
    } finally query.stop()
  }

  test("streaming HLL store ingest: streamed appends serve the direct sketch exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("streamhll").toString
    val rows = (1 to 4500).map(i => (s"g${i % 2}", (i % (500 + 200 * (i % 2))).toLong))
    // store must exist before the stream appends into it
    graft.operators.QualityChecks.hllStoreBuild(
      rows.take(1500).toDF("g", "uid"), "g", "uid", s"$dir/sk")
    val stream = MemoryStream[(String, Long)]
    val query = StreamOps.streamingHllStoreIngest(
      stream.toDF().toDF("g", "uid"), "g", "uid", s"$dir/sk")
    try {
      rows.drop(1500).grouped(1000).foreach { b =>
        stream.addData(b); query.processAllAvailable()
      }
      val got = graft.operators.QualityChecks.hllStoreReport(spark, s"$dir/sk")
        .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
      val direct = graft.operators.QualityChecks
        .hllDistinct(rows.toDF("g", "uid"), "g", "uid")
        .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
      assert(got === direct, "base + streamed appends == one-shot sketch of all rows")
    } finally query.stop()
  }

  test("fold loops release superseded checkpoints: persistent-RDD count stays bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Regression gate for the round-5 leak: each non-empty batch pinned a
    // NEW eager localCheckpoint of the full assignment/snapshot and never
    // unpersisted the previous one, so a long-running stream accumulated
    // one full copy per batch. After the fix only the CURRENT frame (plus
    // transient iteration blocks awaiting the context cleaner) may remain.
    def settleCount(): Int = {
      System.gc(); Thread.sleep(300) // let the ContextCleaner reap unreferenced blocks
      spark.sparkContext.getPersistentRDDs.size
    }
    val existing = graft.operators.Dedup.canonicalAssignments(
      Seq((1L, 2L), (8L, 9L)).toDF("id_a", "id_b"))
    val stream = MemoryStream[(Long, Long)]
    val query = StreamOps.streamingCanonicalFold(
      stream.toDF().toDF("id_a", "id_b"), existing)(_ => ())
    try {
      stream.addData(Seq((3L, 2L))); query.processAllAvailable()
      val after1 = settleCount()
      (0 until 6).foreach { i =>
        stream.addData(Seq((100L + i, 200L + i))); query.processAllAvailable()
      }
      val after7 = settleCount()
      assert(after7 <= after1 + 2,
        s"persistent RDDs grew from $after1 to $after7 across 6 extra batches — " +
          "the fold is re-pinning checkpoints without releasing the old ones")
    } finally query.stop()

    val cdcStream = MemoryStream[(Long, String, Double, String, Long)]
    val cdcQuery = StreamOps.streamingCdcApply(
      cdcStream.toDF().toDF("k", "s", "v", "op", "seq"),
      Seq((1L, "a", 1.0)).toDF("k", "s", "v"), "k", "seq", "op")(_ => ())
    try {
      cdcStream.addData(Seq((2L, "b", 2.0, "I", 1L))); cdcQuery.processAllAvailable()
      val after1 = settleCount()
      (0 until 6).foreach { i =>
        cdcStream.addData(Seq((10L + i, "x", i.toDouble, "I", 10L + i)))
        cdcQuery.processAllAvailable()
      }
      val after7 = settleCount()
      assert(after7 <= after1 + 2,
        s"CDC snapshots grew persistent RDDs from $after1 to $after7 — leak is back")
    } finally cdcQuery.stop()
  }

  test("restart from checkpoint: offsets and aggregation state survive stop/start") {
    // THE durability contract of a 100-TB streaming ingest: a query
    // stopped mid-stream and restarted against the same
    // checkpointLocation must (a) not reprocess committed input and
    // (b) resume its aggregation state. Proven the strong way: the
    // phase-1 source file is DELETED before the restart, so phase-1
    // rows can only appear in the final answer via the restored state
    // store — and phase 2 feeds an event into the EXACT (window,
    // event_type) key phase 1 left in state (hour-0 click), so
    // restored state and fresh input must MERGE, not overwrite.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    def frame(rows: Seq[(Long, String, Long, String, Double)]) =
      rows.map { case (id, t, u, ty, v) => (id, ts(t), u, ty, v) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
    val src = java.nio.file.Files.createTempDirectory("restart-src")
    val ckpt = java.nio.file.Files.createTempDirectory("restart-ckpt").toString
    def addFile(rows: Seq[(Long, String, Long, String, Double)], name: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("restart-stage")
      frame(rows).coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.move(part, src.resolve(name))
    }
    val schema = frame(events).schema
    def run(name: String) = StreamOps.hourlyCountsStream(
        spark.readStream.schema(schema).parquet(src.toString))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    def table(name: String) = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    def batch(rows: Seq[(Long, String, Long, String, Double)]) =
      StreamOps.hourlyCounts(frame(rows)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    val phase1 = events.take(3) // hour-0 click x2, hour-1 view
    // phase 2 reuses phase 1's (hour-0, click) state key: the merge pin
    val phase2 = events.drop(3) :+
      (6L, "2024-01-01 00:50:00", 12L, "click", 1.0)
    val all = phase1 ++ phase2
    addFile(phase1, "a.parquet")
    val q1 = run("restart_p1")
    try assert(q1.awaitTermination(120000), "phase-1 stream timed out")
    finally q1.stop()
    assert(table("restart_p1") === batch(phase1))

    // the committed file disappears; only the checkpoint remembers it
    java.nio.file.Files.delete(src.resolve("a.parquet"))
    addFile(phase2, "b.parquet")
    val q2 = run("restart_p2")
    try {
      assert(q2.awaitTermination(120000), "restarted stream timed out")
      val got = table("restart_p2")
      assert(got === batch(all),
        "restart must resume offsets + state: phase-1 rows from the state store only, phase-2 processed exactly once")
      // the merge pin, explicit: hour-0 click = 2 restored + 1 fresh
      val hour0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
      assert(got.exists { case (w, ty, n, _) => w == hour0 && ty == "click" && n == 3L },
        s"hour-0 click must merge restored state (2) with fresh input (1): $got")
    } finally q2.stop()
  }
}
