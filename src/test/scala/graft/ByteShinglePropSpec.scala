package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.catalyst.util.ArrayData

/** Property tests for the one-pass ByteShingleImpl kernel against a
  * straightforward reference built from hex-string slicing (the
  * DuckDB oracle's formulation: uppercase hex, stride 2 — byte
  * aligned), over random byte arrays INCLUDING high/negative bytes
  * (the & 0xff path) and lengths straddling the n-gram guard. */
class ByteShinglePropSpec extends AnyFunSuite {

  private val genBytes: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 64)
    bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield bs.toArray

  private def ref(bytes: Array[Byte], n: Int): Seq[String] = {
    val h = bytes.map(b => f"${b & 0xff}%02X").mkString
    if (bytes.length < n) Seq.empty
    else (0 to (h.length - 2 * n) by 2).map(i => h.substring(i, i + 2 * n))
      .distinct
  }

  private def impl(bytes: Array[Byte], n: Int): Seq[String] = {
    val a: ArrayData = graft.functions.ByteShingleImpl.shingles(bytes, n)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  private def run(prop: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  test("byte shingles equal the hex-slicing reference (set AND order)") {
    run(Prop.forAll(genBytes) { bs =>
      impl(bs, 4) == ref(bs, 4)
    })
  }

  test("every shingle is 2n uppercase hex chars; count bounded by positions") {
    run(Prop.forAll(genBytes) { bs =>
      val sh = impl(bs, 4)
      sh.forall(s => s.length == 8 &&
        s.forall(c => c.isDigit || (c >= 'A' && c <= 'F'))) &&
        sh.length <= math.max(0, bs.length - 3)
    })
  }

  test("shingling is content-determined: concat changes only the seam") {
    // Appending bytes never removes existing shingles (set growth is
    // monotone up to the seam window) — the property an incremental
    // ingest relies on when payloads arrive in chunks.
    run(Prop.forAll(genBytes, genBytes) { (a, b) =>
      val whole = impl(a ++ b, 4).toSet
      impl(a, 4).toSet.subsetOf(whole)
    })
  }
}
