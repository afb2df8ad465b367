package graft

import graft.functions.Distances
import graft.model.TweetFeatures
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based suite (SURVEY §5.2): metric laws for F1/F2 and parse
  * totality invariants, run by sbt's native ScalaCheck framework. */
object DistanceProperties extends Properties("Distances") {

  private val genTf: Gen[TweetFeatures] = for {
    t <- Gen.choose(0, 3)
    h <- Gen.choose(0, 1000)
    l <- Gen.oneOf("en", "tr", "es", "zh", "others")
    v <- Gen.choose(0, 1)
    r1 <- Gen.choose(0, 100); r2 <- Gen.choose(0, 100); r3 <- Gen.choose(0, 100)
    id <- Gen.choose(0L, Long.MaxValue)
  } yield TweetFeatures(id, h, l, v, r1, r2, r3, t)

  private val genW: Gen[Double] = Gen.choose(0.1, 2.0)

  property("identity") = Prop.forAll(genTf, genW) { (a, w) =>
    Distances.weightedDistance(a, a, w) == 0.0
  }

  property("symmetry") = Prop.forAll(genTf, genTf, genW) { (a, b, w) =>
    Distances.weightedDistance(a, b, w) == Distances.weightedDistance(b, a, w)
  }

  property("non-negativity") = Prop.forAll(genTf, genTf, genW) { (a, b, w) =>
    Distances.weightedDistance(a, b, w) >= 0.0
  }

  property("triangle inequality (within fp tolerance)") =
    Prop.forAll(genTf, genTf, genTf, genW) { (a, b, c, w) =>
      Distances.weightedDistance(a, c, w) <=
        Distances.weightedDistance(a, b, w) + Distances.weightedDistance(b, c, w) + 1e-9
    }

  property("weight scales only the hashtag term") =
    Prop.forAll(genTf, genTf) { (a0, b0) =>
      // isolate the hashtag delta: make other dims equal
      val a = a0.copy(time = 0, language = "en", hasVideo = 0)
      val b = b0.copy(time = 0, language = "en", hasVideo = 0)
      val d1 = Distances.weightedDistance(a, b, 1.0)
      val d2 = Distances.weightedDistance(a, b, 2.0)
      math.abs(d2 - 2.0 * d1) <= 1e-9 * math.max(1.0, d2)
    }
}

/** Text-hash invariants backing the oracle contract. */
object TextHashProperties extends Properties("TextHash") {
  import org.apache.spark.sql.graftnative.TextHashOps

  private val genWord: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val genDoc: Gen[String] = Gen.listOfN(10, genWord).map(_.mkString(" "))

  property("polyHash in [0, P)") = Prop.forAll(genDoc) { s =>
    val h = TextHashOps.polyHashString(s)
    h >= 0 && h < TextHashOps.P
  }

  property("wordHashes length == token count") = Prop.forAll(genDoc) { s =>
    TextHashOps.wordHashes(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).numElements() ==
      s.split(" ", -1).length
  }

  property("shingle count == max(tokens - 2, 0)") =
    Prop.forAll(Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, genWord).map(_.mkString(" ")))) { s =>
      val n = if (s.isEmpty) 1 else s.split(" ", -1).length
      TextHashOps.shingleHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).numElements() ==
        math.max(n - 2, 0)
    }

  property("deterministic") = Prop.forAll(genDoc) { s =>
    TextHashOps.polyHashString(s) == TextHashOps.polyHashString(s)
  }
}
