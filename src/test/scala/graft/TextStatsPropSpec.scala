package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the one-pass TextStats kernels against
  * straightforward Scala reference implementations, over random token
  * arrays drawn from a SMALL alphabet (forcing duplicate tokens,
  * duplicate 2-grams, and window-minimum collisions — exactly the
  * paths the interned-id packing and window sliding must get right). */
class TextStatsPropSpec extends AnyFunSuite {

  private val genTokens: Gen[List[String]] = for {
    n <- Gen.choose(0, 40)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "", "x y".take(1)))
  } yield toks

  private def arr(toks: List[String]) =
    new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])

  private def run(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("setHits == count of membership, duplicates included") {
    val sets = TextStatsRefs.sets(Seq(Seq("a", "ab"), Seq("b")))
    run(Prop.forAll(genTokens) { toks =>
      val got = graft.functions.TextStats.setHits(arr(toks), sets)
        .toIntArray().toSeq
      val want = Seq(
        toks.count(t => t == "a" || t == "ab"),
        toks.count(_ == "b"))
      got == want
    })
  }

  test("repStats == (n-1 2-grams, distinct space-joined 2-grams, max token freq)") {
    run(Prop.forAll(genTokens) { toks =>
      val row = graft.functions.TextStats.repStats(arr(toks))
      val g2 = if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).toList
        else Nil
      val topCount =
        if (toks.isEmpty) 0
        else toks.groupBy(identity).values.map(_.length).max
      row.getInt(0) == g2.length &&
        row.getInt(1) == g2.distinct.length &&
        row.getInt(2) == topCount
    })
  }

  test("wordShingles == sliding space-join; distinct keeps first occurrence") {
    run(Prop.forAll(genTokens) { toks =>
      val plain = graft.functions.WordShingleImpl
        .shingles(arr(toks), 3, distinct = false)
        .toArray[UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toList
      val dist = graft.functions.WordShingleImpl
        .shingles(arr(toks), 3, distinct = true)
        .toArray[UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toList
      val want = if (toks.length >= 3)
        toks.sliding(3).map(_.mkString(" ")).toList else Nil
      plain == want && dist == want.distinct
    })
  }

  test("winnowFp == sha256-prefix window minima (sorted distinct)") {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hex16(s: String): String = {
      md.reset()
      md.update(s.getBytes("UTF-8"))
      md.digest().take(8).map(b => f"$b%02x").mkString
    }
    run(Prop.forAll(genTokens) { toks =>
      val row = graft.functions.TextStats.winnowFp(arr(toks), 3, 4)
      val hs = if (toks.length >= 3)
        toks.sliding(3).map(w => hex16(w.mkString(" "))).toList else Nil
      val minima =
        if (hs.length >= 4) hs.sliding(4).map(_.min).toList else hs
      val distinct = minima.distinct.sorted
      row.getInt(0) == distinct.length &&
        row.getUTF8String(1).toString == distinct.mkString(",")
    })
  }

  private val genText: Gen[String] = for {
    n <- Gen.choose(0, 60)
    cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'e') ++ Seq(' ', '.', 'Z')))
  } yield cs.mkString

  test("charEntropy == -sum(p log2 p) over the char histogram") {
    run(Prop.forAll(genText) { s =>
      val got = graft.functions.TextStats.charEntropy(UTF8String.fromString(s))
      val want = if (s.isEmpty) 0.0 else {
        val n = s.length.toDouble
        s.groupBy(identity).values
          .map(g => -(g.length / n) * math.log(g.length / n) / math.log(2.0))
          .sum
      }
      math.abs(got - want) < 1e-12
    })
  }

  test("delVariants == identity + each single deletion, in position order") {
    run(Prop.forAll(genText) { s =>
      val got = graft.functions.TextStats
        .delVariants(UTF8String.fromString(s))
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toList
      got == (s :: s.indices.map(i => s.take(i) + s.drop(i + 1)).toList)
    })
  }
}

private object TextStatsRefs {
  def sets(ws: Seq[Seq[String]]): Array[java.util.HashSet[UTF8String]] =
    graft.functions.TextStats.toHashSets(ws)
}
