package graft

import org.apache.spark.sql.functions._

/** q_text_classify parity + contract: the in-row weight derivation must
  * agree with an independent JVM recomputation (MessageDigest, not
  * Spark's sha2), and the keep decision must be exactly score >= 0. */
class TextClassifySpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  /** Reference scorer: same frozen-weight function, recomputed with
    * java.security (independent of the Catalyst expression path). */
  private def refScore(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    text.split(" ", -1).map { tok =>
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val fold = hex(0).toInt * 4096 + hex(1).toInt * 256 +
        hex(2).toInt * 16 + hex(3).toInt
      (fold % 2001 - 1000).toLong
    }.sum
  }

  test("scores match an independent JVM recomputation") {
    val out = SparkEntry.queries("q_text_classify")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("score"), r.getAs[Boolean]("keep"))).toMap
    val docs = Tables.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty && out.nonEmpty)
    docs.foreach { r =>
      val (score, keep) = out(r.getAs[Long]("doc_id"))
      val expect = refScore(r.getAs[String]("text"))
      assert(score == expect,
        s"doc ${r.get(0)}: got $score want $expect")
      assert(keep == (score >= 0L))
    }
    // A filter that keeps everything (or nothing) exercises nothing.
    val keeps = out.values.count(_._2)
    assert(keeps > 0 && keeps < out.size)
  }

  test("empty-ish text scores the empty-token weight, not null") {
    import spark.implicits._
    // One-token and empty-string docs go through the same path.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_clf").toString
    Seq((1L, "", "en", "t", 0L), (2L, "x", "en", "t", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q_text_classify")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == refScore(""))
    assert(out(2L) == refScore("x"))
  }
}
