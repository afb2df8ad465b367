package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.model.TweetFeatures
import graft.operators.{Analysis, KMeans, Medoids}

/** Reference-parity queries (SURVEY §2), expressed over the driver's
  * testdata tables so the DuckDB oracle can hash-check them.
  *
  * Cross-engine determinism rules used throughout:
  *  - squares via self-multiplication, never `pow` (libm-dependent);
  *  - double-valued SUMs go through DECIMAL(28,10) → exact, order-free;
  *  - argmin/top-k ties break on explicit trailing keys;
  *  - aggregate outputs cast to BIGINT / DOUBLE on both sides;
  *  - output column names lowercase snake_case on both sides.
  */
object CoreQueries {

  /** Shared SQL CTE mirroring [[Tables.eventFeatures]] exactly. */
  private val efSql =
    """ef AS (
      |  SELECT event_id AS id,
      |         CASE WHEN hour(ts) BETWEEN 5 AND 12 THEN 1
      |              WHEN hour(ts) BETWEEN 13 AND 18 THEN 2
      |              WHEN hour(ts) > 20 OR hour(ts) <= 1 THEN 3
      |              ELSE 0 END AS time,
      |         event_type AS language,
      |         CAST(event_id % 2 AS INTEGER) AS hasvideo,
      |         CAST(CAST(floor(value) AS INTEGER) % 50 AS INTEGER) AS numtags
      |  FROM events)""".stripMargin

  /** Fixed centroids for the oracle-checked assignment/SSE queries. */
  val oracleCentroids: Seq[TweetFeatures] = Seq(
    TweetFeatures(-1, 10, "click", 0, 0, 0, 0, 1),
    TweetFeatures(-2, 25, "view", 1, 0, 0, 0, 2),
    TweetFeatures(-3, 40, "error", 0, 0, 0, 0, 3))

  /** SQL rendering of `Distances.weightedDistance` against centroid `c` —
    * kept in exact operation-order lockstep with the Column form. */
  private def dSql(c: TweetFeatures, hw: Double): String = {
    def sq(x: String) = s"($x)*($x)"
    val dt = s"(CAST(time AS DOUBLE)-CAST(${c.time} AS DOUBLE))"
    val dh = s"((CAST(numtags AS DOUBLE)-CAST(${c.numOfHashtags} AS DOUBLE))*$hw)"
    val dl = s"(CASE WHEN language='${c.language}' THEN CAST(0 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END)"
    val dv = s"(CAST(hasvideo AS DOUBLE)-CAST(${c.hasVideo} AS DOUBLE))"
    s"sqrt(${sq(dt)} + ${sq(dh)} + ${sq(dl)} + ${sq(dv)})"
  }

  /** `d0..dk` CTE + first-min CASE cascade (same first-wins tie semantics
    * as `array_position(d, array_min(d))`). */
  private def assignSql(hw: Double): String = {
    val ds = oracleCentroids.zipWithIndex
      .map { case (c, i) => s"${dSql(c, hw)} AS d$i" }.mkString(",\n    ")
    val k = oracleCentroids.size
    val cases = (0 until k - 1).map { i =>
      val conds = (i + 1 until k).map(j => s"d$i <= d$j").mkString(" AND ")
      s"WHEN $conds THEN $i"
    }.mkString(" ")
    s"""WITH $efSql,
       |d AS (SELECT id, $ds FROM ef)
       |SELECT id, CAST(CASE $cases ELSE ${k - 1} END AS INTEGER) AS cluster FROM d""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(

    // ---- S2/P5-P9 analog: feature derivation suite over events ----------
    QueryDef("q01_event_features",
      (s, dir) => Tables.eventFeatures(s, dir).select(
        col("id"), col("time").as("tbucket"), col("language").as("lang"),
        col("hasVideo").as("video"), col("numOfHashtags").as("tags")),
      Some(
        s"""WITH $efSql
           |SELECT id, time AS tbucket, language AS lang, hasvideo AS video, numtags AS tags FROM ef""".stripMargin)),

    // ---- S5: id-range scan (prefix-scan analog, pushdown-pruned) --------
    QueryDef("q02_range_scan",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey").between(1000, 2999))
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"),
          col("l_suppkey").as("skey"), col("l_quantity").as("qty")),
      Some("""SELECT l_orderkey AS okey, l_partkey AS pkey, l_suppkey AS skey, l_quantity AS qty
             |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2999""".stripMargin)),

    // ---- P8: parse-or-zero over semi-structured props -------------------
    QueryDef("q03_parse_or_zero",
      (s, dir) => Tables.load(s, dir, "events")
        .select(col("event_type").as("lang"),
          coalesce(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long"), lit(0L)).as("k"))
        .groupBy("lang").agg(sum(col("k")).as("k_sum")),
      Some("""SELECT event_type AS lang,
             |       CAST(SUM(COALESCE(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT), 0)) AS BIGINT) AS k_sum
             |FROM events GROUP BY event_type""".stripMargin)),

    // ---- P6/F5: time-bucket histogram -----------------------------------
    QueryDef("q04_time_histogram",
      (s, dir) => Tables.eventFeatures(s, dir)
        .groupBy(col("time").as("tbucket")).agg(count(lit(1)).as("n")),
      Some(
        s"""WITH $efSql
           |SELECT time AS tbucket, CAST(count(*) AS BIGINT) AS n FROM ef GROUP BY time""".stripMargin)),

    // ---- J1+A1+F1: nearest-centroid assignment (the real operator) ------
    QueryDef("q05_kmeans_assign",
      (s, dir) => KMeans.assign(Tables.eventFeatures(s, dir), oracleCentroids),
      Some(assignSql(0.8))),

    // ---- A3: exact per-group medoid (customers within nations) ----------
    QueryDef("q06_kmeans_medoid",
      (s, dir) => {
        val members = Tables.load(s, dir, "customer").select(
          col("c_nationkey").as("cluster"), col("c_custkey").as("id"),
          col("c_acctbal").as("bal"))
        Medoids.compute(members, "cluster", "id", Seq("bal"),
          (l, r) => round(abs(l("bal") - r("bal")) * 100).cast("long"))
          .select(col("cluster").as("grp"), col("medoid_id"))
      },
      Some("""WITH t AS (SELECT c_nationkey AS cluster, c_custkey AS id, c_acctbal AS bal FROM customer),
             |tot AS (SELECT t1.cluster, t1.id,
             |               CAST(SUM(CAST(round(abs(t1.bal - t2.bal) * 100) AS BIGINT)) AS BIGINT) AS total
             |        FROM t t1 JOIN t t2 ON t1.cluster = t2.cluster GROUP BY t1.cluster, t1.id),
             |w AS (SELECT cluster, id, total, min(total) OVER (PARTITION BY cluster) AS mn FROM tot)
             |SELECT cluster AS grp, min(id) AS medoid_id FROM w WHERE total = mn GROUP BY cluster""".stripMargin)),

    // ---- A5: group count (hasVideo-analog) ------------------------------
    QueryDef("q07_group_count",
      (s, dir) => Analysis.groupCount(Tables.eventFeatures(s, dir))
        .select(col("hasVideo").as("video"), col("n")),
      Some(
        s"""WITH $efSql
           |SELECT hasvideo AS video, CAST(count(*) AS BIGINT) AS n FROM ef GROUP BY hasvideo""".stripMargin)),

    // ---- A6: per-cluster averages ---------------------------------------
    QueryDef("q08_cluster_avgs",
      (s, dir) => KMeans.assignWithFeatures(Tables.eventFeatures(s, dir), oracleCentroids)
        .groupBy(col("cluster"))
        .agg(
          (sum(col("numOfHashtags").cast("decimal(28,10)")).cast("double") / count(lit(1))).as("avg_tags"),
          (sum(col("time").cast("decimal(28,10)")).cast("double") / count(lit(1))).as("avg_tbucket"),
          count(lit(1)).as("n")),
      Some {
        val ds = oracleCentroids.zipWithIndex
          .map { case (c, i) => s"${dSql(c, 0.8)} AS d$i" }.mkString(", ")
        s"""WITH $efSql,
           |d AS (SELECT numtags, time AS tb, $ds FROM ef),
           |a AS (SELECT numtags, tb,
           |             CAST(CASE WHEN d0 <= d1 AND d0 <= d2 THEN 0 WHEN d1 <= d2 THEN 1 ELSE 2 END AS INTEGER) AS cluster
           |      FROM d)
           |SELECT cluster,
           |       CAST(SUM(CAST(numtags AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS avg_tags,
           |       CAST(SUM(CAST(tb AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS avg_tbucket,
           |       CAST(count(*) AS BIGINT) AS n
           |FROM a GROUP BY cluster""".stripMargin
      }),

    // ---- A2/A4: per-cluster SSE -----------------------------------------
    QueryDef("q09_cluster_sse",
      (s, dir) => {
        val dists = oracleCentroids.map(c => graft.functions.Distances.weightedDistance(
          col("time"), col("numOfHashtags"), col("language"), col("hasVideo"),
          lit(c.time), lit(c.numOfHashtags), lit(c.language), lit(c.hasVideo), 0.8))
        val dArr = array(dists: _*)
        Tables.eventFeatures(s, dir).select(
          (array_position(dArr, array_min(dArr)) - 1).cast("int").as("cluster"),
          array_min(dArr).as("d"))
          .groupBy("cluster")
          .agg(sum(col("d").cast("decimal(28,10)")).cast("double").as("sse"))
      },
      Some {
        val ds = oracleCentroids.zipWithIndex
          .map { case (c, i) => s"${dSql(c, 0.8)} AS d$i" }.mkString(", ")
        s"""WITH $efSql,
           |d AS (SELECT id, $ds FROM ef),
           |a AS (SELECT CAST(CASE WHEN d0 <= d1 AND d0 <= d2 THEN 0 WHEN d1 <= d2 THEN 1 ELSE 2 END AS INTEGER) AS cluster,
           |             least(d0, d1, d2) AS d FROM d)
           |SELECT cluster, CAST(SUM(CAST(d AS DECIMAL(28,10))) AS DOUBLE) AS sse FROM a GROUP BY cluster""".stripMargin
      }),

    // ---- A7: global sum --------------------------------------------------
    QueryDef("q10_global_sum",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total")),
      Some("SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total FROM lineitem")),

    // ---- A8: deterministic sample + distinct + first-k ------------------
    QueryDef("q11_sample_distinct",
      (s, dir) => Tables.load(s, dir, "events")
        .filter(col("event_id") % 97 < 58)
        .select(col("user_id")).distinct()
        .orderBy("user_id").limit(20),
      Some("""SELECT user_id FROM events WHERE event_id % 97 < 58
             |GROUP BY user_id ORDER BY user_id LIMIT 20""".stripMargin)),

    // ---- P10: language recode -------------------------------------------
    QueryDef("q12_language_recode",
      (s, dir) => Analysis.recodeLanguage(
        Tables.load(s, dir, "documents").select(col("lang").as("language")), "language")
        .groupBy(col("language").as("lang")).agg(count(lit(1)).as("n"))
        .select(col("lang"), col("n")),
      Some("""SELECT CASE WHEN lang IN ('en','tr') THEN lang ELSE 'others' END AS lang,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM documents GROUP BY 1""".stripMargin)),

    // ---- J2: equi-join enrichment + aggregate ---------------------------
    QueryDef("q13_join_enrich",
      (s, dir) => Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"),
          sum(Exact.money(col("o_totalprice"))).cast("double").as("total_price")),
      Some("""SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin)),

    // ---- J1-style: broadcast dim chain join -----------------------------
    QueryDef("q14_dim_join",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name").as("nation"))
        .agg(sum(Exact.revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue")),
      Some(s"""SELECT n_name AS nation,
             |       CAST(SUM(${Exact.revenueSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name""".stripMargin)),

    // ---- J3: isin filter --------------------------------------------------
    QueryDef("q15_isin_filter",
      (s, dir) => Tables.load(s, dir, "customer")
        .filter(col("c_custkey").isin(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L))
        .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
          col("c_acctbal").as("acctbal")),
      Some("""SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal
             |FROM customer WHERE c_custkey IN (1,2,3,5,8,13,21,34,55,89)""".stripMargin)))
}
