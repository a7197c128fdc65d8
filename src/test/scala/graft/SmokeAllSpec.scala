package graft

/** Executes EVERY gate query end-to-end at the smoke SF. The oracle
  * gate (tools/check.py / the driver) runs at sf0.01; this catches the
  * class of failure a different scale can provoke — empty strata,
  * empty buckets, degenerate bounds — before the driver does. */
class SmokeAllSpec extends SparkSpecBase {

  test("every gate query executes at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val failures = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}") }
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
