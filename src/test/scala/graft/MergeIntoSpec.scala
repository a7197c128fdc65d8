package graft

import org.apache.spark.sql.functions._
import graft.sink.MergeInto

/** MERGE INTO clause semantics on hand-sized frames: each of the four
  * row fates, DELETE-over-UPDATE precedence, omitted-column defaults,
  * and the Delta ambiguity contract (multiple source rows per key
  * throw). The end-to-end value compare is q_merge_into's oracle. */
class MergeIntoSpec extends SparkSpecBase {

  import spark.implicits._

  private def target =
    Seq((1L, 10L, "keep"), (2L, 20L, "upd"), (3L, 30L, "del"))
      .toDF("k", "bal", "tagv")

  test("matched update, matched delete, unmatched insert, carry-over") {
    val source = Seq((2L, 5L), (3L, 99L), (4L, 7L)).toDF("k", "delta")
    val out = MergeInto(target, source, "k",
      deleteWhen = Some(col("s.delta") > 50),
      updateSet = Map("bal" -> (col("t.bal") + col("s.delta")),
        "tagv" -> lit("merged")),
      insertValues = Map("bal" -> col("s.delta")))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSeq
    assert(out == Seq(
      (1L, 10L, Some("keep")),      // untouched target row carries over
      (2L, 25L, Some("merged")),    // matched -> update
      // 3 deleted: delete clause wins although update also applies
      (4L, 7L, None)))              // unmatched source -> insert,
                                    // omitted tagv inserts NULL
  }

  test("empty clause maps degrade to no-op update and all-null insert") {
    val source = Seq((2L, 1L), (9L, 2L)).toDF("k", "delta")
    val out = MergeInto(target, source, "k")
      .orderBy("k")
      .collect().map(r => (r.getLong(0), Option(r.get(1)),
        Option(r.getString(2)))).toSeq
    assert(out == Seq(
      (1L, Some(10L), Some("keep")),
      (2L, Some(20L), Some("upd")),  // matched, no update set -> kept
      (3L, Some(30L), Some("del")),
      (9L, None, None)))             // inserted with NULL payload
  }

  test("NULL delete condition is NOT satisfied — falls through to update") {
    // s.note is NULL for k=2: (matched AND NULL) must not delete the
    // row; SQL/Delta MERGE treats a NULL clause condition as false.
    val source = Seq((2L, Some("x")), (3L, None: Option[String]))
      .toDF("k", "note")
      .select(col("k"), when(col("note") === "never", lit(true))
        .as("dropit"))
    val out = MergeInto(target, source, "k",
      deleteWhen = Some(col("s.dropit")),
      updateSet = Map("tagv" -> lit("merged")))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(out == Seq((1L, "keep"), (2L, "merged"), (3L, "merged")))
  }

  test("a target row with a NULL merge key carries over unchanged") {
    val t = Seq((Option(1L), 10L, "keep"), (None: Option[Long], 77L, "nullkey"))
      .toDF("k", "bal", "tagv")
    val source = Seq((1L, 5L)).toDF("k", "delta")
    val out = MergeInto(t, source, "k",
      updateSet = Map("bal" -> col("s.delta")),
      insertValues = Map("bal" -> lit(-1L)))
      .orderBy(col("k").asc_nulls_first)
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        r.getLong(1), r.getString(2))).toSeq
    // The NULL-key row is PRESENT on the target side (never joinable);
    // it must keep bal=77/tagv=nullkey, not be re-inserted with -1/NULL.
    assert(out == Seq((None, 77L, "nullkey"), (Some(1L), 5L, "keep")))
  }

  test("a source with multiple rows per key throws (Delta's rule)") {
    val source = Seq((2L, 1L), (2L, 2L)).toDF("k", "delta")
    val e = intercept[IllegalArgumentException] {
      MergeInto(target, source, "k")
    }
    assert(e.getMessage.contains("ambiguous MERGE"), e.getMessage)
  }
}
