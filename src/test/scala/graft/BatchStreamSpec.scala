package graft

import graft.streaming.BatchStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the batching contract — the conservation laws the
  * reference asserts across three fixed configs
  * (tests/batch_stream_test.py:6-19), generalized with ScalaCheck (the
  * reference declared hypothesis but never used it — SURVEY §5). */
class BatchStreamSpec extends AnyFunSuite {

  private val referenceConfigs = Seq(
    (101, 10, 10, 100), // reference config 1
    (101, 1, 10, 100), // reference config 2
    (101, 10, 2, 10) // reference config 3: watermark-driven eviction
  )

  private def run(total: Int, batchSize: Int, keys: Int, watermark: Int) = {
    val in = (0 until total).map(i => (i % keys, i))
    BatchStream.batches(in.iterator, batchSize, watermark).toSeq
  }

  private def laws(total: Int, batch: Int, keys: Int, wm: Int): Boolean = {
    val out = run(total, batch, keys, wm)
    val emitted = out.flatMap(_._2)
    emitted.sorted == (0 until total) && // every element exactly once
      out.forall(_._2.nonEmpty) &&
      out.forall(_._2.length <= batch) && // bounded batches
      out.forall { case (k, vs) => vs.forall(_ % keys == k) } // keyed
  }

  test("reference configs: conservation, bounded batches, drained") {
    referenceConfigs.foreach { case (t, b, k, w) =>
      assert(laws(t, b, k, w), s"config ($t,$b,$k,$w)")
    }
  }

  test("random configs preserve the conservation laws") {
    val gen = for {
      total <- Gen.choose(0, 500)
      batch <- Gen.choose(1, 50)
      keys <- Gen.choose(1, 20)
      wm <- Gen.choose(0, 200)
    } yield (total, batch, keys, math.max(batch, wm))
    val prop = Prop.forAll(gen) { case (t, b, k, w) => laws(t, b, k, w) }
    val result = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("watermark keeps the buffer bounded under all-distinct keys") {
    val in = (0 until 100).map(i => (i, i))
    val out = BatchStream.batches(in.iterator, 10, 10).toSeq
    assert(out.flatMap(_._2).sorted == (0 until 100))
  }
}
