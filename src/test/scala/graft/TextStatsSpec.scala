package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd text-stat expressions (lang_hits / rep_stats /
  * winnow_fp) must agree exactly with the SQL formulations they
  * replaced — same arithmetic, same hex, same ordering. */
class TextStatsSpec extends SparkSpecBase {

  private def docs(texts: String*) = {
    val s = spark
    import s.implicits._
    graft.functions.TextStatFunctions.register(s,
      Seq(Seq("the", "and"), Seq("der", "und")))
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("lang_hits counts duplicated membership per set in one pass") {
    val df = docs("the cat and the dog", "der und der x", "nothing here")
      .select(col("doc_id"), expr("lang_hits(split(text, ' '))").as("h"))
      .orderBy("doc_id")
    val sqlTwin = docs("the cat and the dog", "der und der x", "nothing here")
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), t -> t IN ('the', 'and')))"),
        expr("size(filter(split(text, ' '), t -> t IN ('der', 'und')))"))
      .orderBy("doc_id").collect().map(r => Seq(r.getInt(1), r.getInt(2)))
    val got = df.collect().map(_.getSeq[Int](1))
    assert(got.toSeq.map(_.toSeq) === sqlTwin.toSeq.map(_.toSeq))
  }

  test("rep_stats matches the transform/aggregate formulation") {
    val texts = Seq("a b a b a", "x", "", "w w w w", "a b c d e f")
    val viaExpr = docs(texts: _*)
      .select(col("doc_id"), expr("rep_stats(split(text, ' '))").as("r"))
      .orderBy("doc_id")
      .select("r.n_g2", "r.n_g2_distinct", "r.top_count")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    val viaSql = docs(texts: _*)
      .withColumn("tk", split(col("text"), " "))
      .withColumn("g2", expr(
        """CASE WHEN size(tk) >= 2 THEN
          |  transform(sequence(1, size(tk) - 1),
          |    i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1)))
          |ELSE array() END""".stripMargin))
      .select(col("doc_id"), size(col("g2")),
        size(array_distinct(col("g2"))),
        expr("array_max(transform(array_distinct(tk), w -> size(filter(tk, x -> x = w))))"))
      .orderBy("doc_id")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(viaExpr.toSeq === viaSql.toSeq)
  }

  test("winnow_fp matches the sha2/slice formulation byte-for-byte") {
    val texts = Seq(
      "a b c d e f g h i j",     // full window path
      "a b c d",                  // 2 shingles < window → keep all
      "a b",                      // no shingles
      "q q q q q q")              // degenerate repeats
    val viaExpr = docs(texts: _*)
      .select(col("doc_id"), expr("winnow_fp(split(text, ' '))").as("r"))
      .orderBy("doc_id").select("r.n_fp", "r.fp")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val viaSql = docs(texts: _*)
      .withColumn("tk", split(col("text"), " "))
      .withColumn("sh", expr(
        """CASE WHEN size(tk) >= 3 THEN
          |  transform(sequence(1, size(tk) - 2),
          |    i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1),
          |                   element_at(tk, i + 2)))
          |ELSE array() END""".stripMargin))
      .withColumn("hs",
        expr("transform(sh, x -> substring(sha2(x, 256), 1, 16))"))
      .withColumn("w", expr(
        """CASE WHEN size(hs) >= 4 THEN
          |  transform(sequence(1, size(hs) - 3),
          |    i -> array_min(slice(hs, i, 4)))
          |ELSE hs END""".stripMargin))
      .select(col("doc_id"), size(array_distinct(col("w"))),
        array_join(array_sort(array_distinct(col("w"))), ","))
      .orderBy("doc_id")
      .collect().map(r => (r.getInt(1), r.getString(2)))
    assert(viaExpr.toSeq === viaSql.toSeq)
  }

  test("expressions stay inside whole-stage codegen") {
    docs() // bind the functions
    // a local Seq folds to LocalTableScan; range() forces a real stage
    val df = spark.range(10)
      .withColumn("text", concat_ws(" ", lit("the"), col("id").cast("string")))
      .select(expr("lang_hits(split(text, ' '))"),
        expr("rep_stats(split(text, ' '))"),
        expr("winnow_fp(split(text, ' '))"),
        expr("char_entropy(text)"),
        expr("del_variants(text)"))
    // "*(1)" prefixes mark operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"))
    assert(df.collect().length === 10)
  }

  test("char_entropy matches the explode/log2 formulation") {
    val df = docs("aabb", "abcd", "aaaa", "", "a",
        "mississippi river basin")
      .select(col("doc_id"), expr("char_entropy(text)").as("e"))
      .orderBy("doc_id").collect().map(_.getDouble(1))
    // explode-per-char twin: -sum(p log2 p) over the char histogram
    val twin = docs("aabb", "abcd", "aaaa", "", "a",
        "mississippi river basin")
      .select(col("doc_id"), col("text")).collect().map { r =>
        val s = r.getString(1)
        if (s.isEmpty) 0.0
        else {
          val n = s.length.toDouble
          s.groupBy(identity).values.map { g =>
            val p = g.length / n
            -p * math.log(p) / math.log(2.0)
          }.sum
        }
      }
    df.zip(twin).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12, s"$got vs $want") }
  }

  test("del_variants is the complete edit-distance-1 blocking key set") {
    val got = docs("abc")
      .select(expr("del_variants(text)")).head().getSeq[String](0)
    assert(got === Seq("abc", "bc", "ac", "ab"))
    // COMPLETENESS: lev<=1 => neighborhoods intersect, checked
    // exhaustively over short strings — the claim the fuzzy join
    // relies on. (Not an iff: a transposition like ab/ba intersects
    // at lev 2 — a harmless extra candidate the exact verify drops.)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def nbr(s: String): Set[String] =
      (s +: s.indices.map(i => s.take(i) + s.drop(i + 1))).toSet
    val alphabet = Seq("", "a", "b", "ab", "ba", "aa", "abc", "bac",
      "abcd", "acd", "xbcd", "abyd", "zzzz")
    for (x <- alphabet; y <- alphabet if lev(x, y) <= 1)
      assert((nbr(x) & nbr(y)).nonEmpty,
        s"'$x' vs '$y': lev=${lev(x, y)} but not blocked")
  }
}
