package graft

import graft.functions.{SketchFunctions, SketchHash}
import org.apache.spark.sql.functions._

/** Map-only sketch signature expressions: reference-computation
  * equality, set semantics, and the LSH banding contract (identical
  * sets collide in every band; disjoint sets collide in none with
  * overwhelming probability for fixed test data). */
class SketchExprSpec extends SparkSpecBase {

  private def minhashRef(shingles: Seq[String]): Seq[Long] = {
    // Independent reference computation (same family definition).
    val sig = Array.fill(32)(Long.MaxValue)
    for (s <- shingles.distinct) {
      val b = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val h0 = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(b.getBaseObject, b.getBaseOffset, b.numBytes, 42L)
      for (i <- 0 until 32) {
        val h = SketchHash.mix(h0 + i * 0x9e3779b97f4a7c15L)
        if (h < sig(i)) sig(i) = h
      }
    }
    sig.toSeq
  }

  test("minhash_sig matches the reference computation") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val docs = Seq(
      Seq("a b c", "b c d", "c d e"),
      Seq("x y z"),
      Seq.empty[String])
    val out = docs.toDF("sh")
      .select(expr("minhash_sig(sh)").as("sig"))
      .as[Seq[Long]].collect()
    assert(out(0) == minhashRef(docs(0)))
    assert(out(1) == minhashRef(docs(1)))
    assert(out(2) == Seq.fill(32)(Long.MaxValue)) // empty set: identity
  }

  test("simhash_sig: equal sets agree, order does not matter") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val out = Seq(
      Seq("a b", "b c", "c d"),
      Seq("c d", "a b", "b c"), // permutation
      Seq("p q", "q r", "r s")) // different content
      .toDF("sh").select(expr("simhash_sig(sh)").as("sig"))
      .as[Long].collect()
    assert(out(0) == out(1))
    assert(out(0) != out(2))
  }

  test("byte_shingles_distinct: byte-aligned hex 4-grams, distinct, guarded") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val rows = Seq(("abcde", 1), ("aaaa", 2), ("ab", 3))
      .toDF("t", "id")
      .select(col("id"),
        expr("byte_shingles_distinct(cast(t AS binary), 4)").as("sh"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    // "abcde" = 0x61 62 63 64 65 -> two byte-aligned 4-grams.
    assert(rows(1) == Seq("61626364", "62636465"))
    // "aaaa" -> one distinct 4-gram (both positions collapse... only
    // one position exists for len 4).
    assert(rows(2) == Seq("61616161"))
    // Under-length payloads yield the empty set, never an error.
    assert(rows(3).isEmpty)
    // Oracle parity: uppercase hex, stride 2 over hex(payload).
    assert(rows(1).forall(_.forall(c => c.isDigit || (c >= 'A' && c <= 'F'))))
  }

  test("signature computation is map-only (no exchange before banding)") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val plan = Seq(Seq("a b")).toDF("sh")
      .select(expr("minhash_sig(sh)").as("sig"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
