package graft

import graft.operators.KllSketch
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based laws for the KLL sketch — the invariants the grouped
  * aggregate ([[org.apache.spark.sql.graftnative.KllQuantileAgg]])
  * leans on under ARBITRARY partitionings and merge trees, which is
  * exactly what ScalaCheck can drive harder than example tests: random
  * data shapes, random split points, random merge orders.
  *
  * The k=64 bound used here: constant-capacity KLL keeps ≤ k items per
  * level with weight 2^i; a compaction at level i perturbs any rank by
  * ≤ 2^i, and level i holds ≥ k/2 items when it compacts, so relative
  * rank error stays O(log(n/k)/k). At k=64, n ≤ 4096 the observed
  * worst case is well under 10% — the assertions use 12% for slack
  * against unlucky parities, far below what a broken merge produces
  * (a dropped or double-counted buffer shifts ranks by whole buffer
  * weights, 25%+). */
object QuantileProperties extends Properties("KllSketch") {

  private val K = 64

  private val genXs: Gen[List[Double]] = for {
    n <- Gen.choose(1, 4000)
    // mix of heavy ties and spread values — both sketch stressors
    xs <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(0, 20).map(_.toDouble),
      Gen.choose(-1e6, 1e6)))
  } yield xs

  private def rankErrOk(xs: List[Double], s: KllSketch): Boolean = {
    val sorted = xs.sorted
    Seq(0.1, 0.5, 0.9).forall { p =>
      val est = s.quantile(p)
      val r = sorted.count(_ <= est)
      math.abs(r - math.ceil(p * xs.size)) <= math.max(2.0, 0.12 * xs.size)
    }
  }

  property("count is exact for any input") = Prop.forAll(genXs) { xs =>
    KllSketch.fromValues(xs, K).n == xs.size
  }

  property("rank error bounded on arbitrary data") = Prop.forAll(genXs) { xs =>
    rankErrOk(xs, KllSketch.fromValues(xs, K))
  }

  property("merge of any split obeys the bound and sums counts") =
    Prop.forAll(genXs, Gen.choose(0.0, 1.0)) { (xs, f) =>
      val cut = (xs.size * f).toInt
      val (a, b) = xs.splitAt(cut)
      val m = KllSketch.fromValues(a, K).merge(KllSketch.fromValues(b, K))
      m.n == xs.size && rankErrOk(xs, m)
    }

  property("multi-way merge in random order obeys the bound") =
    Prop.forAll(genXs, Gen.choose(2, 8), Gen.choose(0L, Long.MaxValue)) { (xs, parts, seed) =>
      val rnd = new scala.util.Random(seed)
      val shuffledParts = rnd.shuffle(
        xs.grouped(math.max(1, xs.size / parts)).toList)
      val m = shuffledParts.map(KllSketch.fromValues(_, K))
        .reduceLeft((x, y) => x.merge(y))
      m.n == xs.size && rankErrOk(xs, m)
    }

  property("serialization round-trip preserves every estimate") =
    Prop.forAll(genXs) { xs =>
      val s = KllSketch.fromValues(xs, K)
      val r = KllSketch.fromBytes(s.toBytes)
      r.n == s.n && r.retained == s.retained &&
        Seq(0.01, 0.25, 0.5, 0.75, 0.99).forall(p => r.quantile(p) == s.quantile(p))
    }

  property("space stays O(k log(n/k)): retained never exceeds k * levels + k") =
    Prop.forAll(genXs) { xs =>
      val s = KllSketch.fromValues(xs, K)
      s.retained <= K * (s.numLevels + 1)
    }

  property("quantile is monotone in p") = Prop.forAll(genXs) { xs =>
    val s = KllSketch.fromValues(xs, K)
    val qs = Seq(0.05, 0.25, 0.5, 0.75, 0.95).map(s.quantile)
    qs.zip(qs.tail).forall { case (a, b) => a <= b }
  }
}
