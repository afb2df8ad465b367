package graft

import graft.operators.Dedup

class CanonicalSpec extends SparkSpec {

  test("canonical ids: min-label propagation over chained components") {
    import spark.implicits._
    // components: {1,2,3,4} as a chain, {10,11}, {20,21,22} via hub 20
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (20L, 22L)).toDF("id_a", "id_b")
    val got = Dedup.canonicalAssignments(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("CC statistics stay word-sized across many rounds (checkpoint-chain stats hygiene)") {
    import spark.implicits._
    // a 4096-node PATH has diameter 4095: pointer jumping needs ~12
    // rounds. Pre-fix, each round's checkpoint inherited the previous
    // round's PLAN estimate, whose digit count triples per round through
    // the 3-way self-join — by convergence the result plan carried a
    // BigInt size estimate with ~3^rounds digits and the driver spent
    // minutes per round in BigInteger.multiplyToomCook3 (the q45c ×16
    // scaling "hang"). Post-fix every per-round checkpoint is rebuilt
    // without origin stats, so the final estimate stays a handful of
    // digits.
    val pairs = (0L until 4095L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val result = Dedup.canonicalAssignments(pairs)
    val assigned = result.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned.size === 4096)
    assert(assigned.values.forall(_ == 0L), "path component collapses to min label 0")
    val digits = result.queryExecution.optimizedPlan.stats.sizeInBytes.toString.length
    assert(digits <= 24,
      s"result stats carry a $digits-digit size estimate — checkpoint chain is compounding again")
  }

  test("canonical ids compose with the LSH pipeline") {
    import spark.implicits._
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val corpus = Seq(
      (1L, base, "s"), (2L, base + " w13", "s"), (3L, base + " w13 w14", "s"),
      (9L, "z1 z2 z3 z4 z5 z6 z7 z8", "s"))
      .toDF("doc_id", "text", "source")
    val pairs = Dedup.minhashLshPairs(corpus, minJaccard = 0.5)
    val canon = Dedup.canonicalAssignments(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1-2-3 form one near-dup component surviving as doc 1; 9 untouched
    assert(canon.keySet === Set(1L, 2L, 3L))
    assert(canon.values.toSet === Set(1L))
  }

  test("incrementalCanonical: batch edges merge old components to the global min") {
    import spark.implicits._
    // old world: {1,2} and {5,6} as separate components
    val existing = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "canonical_id")
    // a new doc 9 bridges 2 and 6 -> one component, min = 1
    val newEdges = Seq((9L, 2L), (9L, 6L)).toDF("id_a", "id_b")
    val merged = Dedup.incrementalCanonical(existing, newEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 9L -> 1L))
  }

  test("incrementalCanonical equals full recompute on the union edge set") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val oldEdges = (1 to 40).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2).toDF("id_a", "id_b")
    val newEdges = (1 to 15).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).toDF("id_a", "id_b")
    val existing = Dedup.canonicalAssignments(oldEdges)
    val incr = Dedup.incrementalCanonical(existing, newEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.canonicalAssignments(oldEdges.unionAll(newEdges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ids only in untouched old components keep their label; every id in
    // the union recompute that the incremental path covers must agree
    incr.foreach { case (id, label) => assert(full(id) === label,
      s"id $id: incremental $label vs full ${full(id)}") }
    assert(incr.keySet === full.keySet)
  }
}
