package graft

import graft.functions.SkewJoin

/** Salted join equals the plain join result under heavy key skew. */
class SkewJoinSpec extends SparkSpecBase {

  test("salted equi-join matches plain join on skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + a tail of normal keys.
    val big = ((0 until 10000).map(_ => ("hot", 1)) ++
      (0 until 100).map(i => (s"k$i", i))).toDF("k", "v")
    val small = (Seq(("hot", "H")) ++ (0 until 100).map(i => (s"k$i", s"s$i")))
      .toDF("sk", "label")

    val plain = big.join(small, big("k") === small("sk"))
      .groupBy("k", "label").count()
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", "sk", salts = 8)
      .groupBy("k", "label").count()

    val p = plain.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2))).sortBy(_.toString).toSeq
    val s = salted.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2))).sortBy(_.toString).toSeq
    assert(s == p)
    assert(p.exists { case (k, _, n) => k == "hot" && n == 10000L })
  }
}
