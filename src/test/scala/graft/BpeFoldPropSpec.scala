package graft

import scala.util.Random

/** Property test: the SQL greedy merge fold (TextQueries.BpeFoldSql)
  * equals an imperative left-to-right BPE merge on random symbol
  * sequences and random rules — including self-overlapping (l == r)
  * rules and rules over previously-merged multi-char symbols, the
  * cases where naive string replacement diverges. */
class BpeFoldPropSpec extends SparkSpecBase {

  /** Textbook single-rule greedy apply: scan left to right, merging
    * the CURRENT last token with the next symbol when they match the
    * rule — the merged token does not re-participate as `l`. */
  private def ref(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    syms.foreach { x =>
      if (out.nonEmpty && out.last == l && x == r)
        out(out.length - 1) = l + r
      else out += x
    }
    out.toSeq
  }

  private def sqlFold(sym: String, l: String, r: String): String = {
    import spark.implicits._
    Seq((sym, l, r)).toDF("sym", "l", "r")
      .selectExpr(graft.queries.TextQueries.BpeFoldSql + " AS out")
      .head().getString(0)
  }

  test("SQL fold equals imperative greedy merge on random inputs") {
    val rnd = new Random(1234)
    val alphabet = Seq("a", "b", "c", "ab", "bc", "aa")
    // Batch the cases into ONE DataFrame pass (per-case Spark jobs
    // would dominate the test's runtime).
    val cases = (1 to 200).map { _ =>
      val n = 1 + rnd.nextInt(10)
      val syms = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length)))
      val l = alphabet(rnd.nextInt(alphabet.length))
      val r = alphabet(rnd.nextInt(alphabet.length))
      (syms.mkString(" "), l, r)
    }
    import spark.implicits._
    val got = cases.toDF("sym", "l", "r")
      .selectExpr("sym", "l", "r",
        graft.queries.TextQueries.BpeFoldSql + " AS out")
      .collect()
    got.foreach { row =>
      val (sym, l, r, out) = (row.getString(0), row.getString(1),
        row.getString(2), row.getString(3))
      val want = ref(sym.split(" ").toSeq, l, r).mkString(" ")
      assert(out == want, s"fold('$sym', $l, $r) = '$out', want '$want'")
    }
    // And one directed overlap case through the single-row path, so a
    // regression names it precisely.
    assert(sqlFold("a a a a a", "a", "a") == "aa aa a")
  }
}
