package graft.tools

import org.apache.spark.sql.SparkSession
import graft.model.{Kind, Model, Property}

/** Diagnostic probe for the bounded-pool per-table sync writes (dev
  * tooling, not part of the shipped library): a real resoto model has
  * hundreds of kinds, and the sync front door used to submit the N
  * per-table snapshot writes SEQUENTIALLY — N small jobs back to back,
  * each occupying a handful of task slots while every other slot
  * idles. This probe builds a many-kind model (default 50 kinds + the
  * chain link tables), syncs it through the real
  * Sync.toParquet -> TableSink.writeAll path at pool sizes 1 / 4 / 8,
  * and prints wall clock per setting (min of 2, interleaved).
  *
  * Results feed PLANS.md; correctness of the sync itself is
  * SyncE2ESpec's job (which now runs THROUGH the pooled path).
  */
object SyncPoolProbe {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val nKinds = sys.env.getOrElse("SPARK_GRAFT_SYNC_KINDS", "50").toInt
    val rowsPerKind =
      sys.env.getOrElse("SPARK_GRAFT_SYNC_ROWS", "2000").toInt

    // Model: resource base + nKinds concrete kinds chained by
    // successor edges (k0 -> k1 -> ... ), so link tables materialize
    // too — the real sync surface, not just node tables.
    val kinds = (0 until nKinds).map { i =>
      Kind(s"probe_kind_$i", bases = Seq("resource"),
        properties = Seq(Property("size", "int32")),
        successorKinds =
          if (i + 1 < nKinds) Map("default" -> Seq(s"probe_kind_${i + 1}"))
          else Map.empty)
    }
    val model = Model((Seq(Kind("resource", properties = Seq(
      Property("id", "string"), Property("name", "string"),
      Property("kind", "string")))) ++ kinds): _*)

    def node(kind: String, id: String, size: Int): String =
      s"""{"type":"node","id":"$id","reported":{"kind":"$kind","id":"$id","name":"n-$id","size":$size},""" +
        """"ancestors":{"cloud":{"reported":{"id":"cl"}},"region":{"reported":{"id":"r1"}}}}"""
    def edge(from: String, to: String): String =
      s"""{"type":"edge","from":"$from","to":"$to","edge_type":"default"}"""

    val lines = (0 until nKinds).flatMap { k =>
      (0 until rowsPerKind).map(r => node(s"probe_kind_$k", s"n$k-$r", r)) ++
        (if (k + 1 < nKinds) (0 until math.min(rowsPerKind, 100)).map(r =>
          edge(s"n$k-$r", s"n${k + 1}-$r"))
         else Seq.empty)
    }
    val env = spark.read.json(spark.createDataset(lines))
      .localCheckpoint() // pay the JSON parse once, outside the timings

    val base = java.nio.file.Files
      .createTempDirectory("graft_syncpool").toString
    println(s"kinds=$nKinds rows/kind=$rowsPerKind tables=" +
      s"${nKinds + (nKinds - 1)} base=$base")
    println("pool,run1_sec,run2_sec,min_sec")
    // Interleaved: 1,4,8,1,4,8 so a noise window cannot favor a side.
    val results = collection.mutable.Map[Int, List[Double]]()
    for (round <- 1 to 2; pool <- Seq(1, 4, 8)) {
      graft.sink.TableSink.poolOverride = Some(pool)
      val sec = time {
        graft.Sync.toParquet(spark, env, model, s"$base/pool$pool")
      }
      results(pool) = results.getOrElse(pool, Nil) :+ sec
      val _ = round
    }
    graft.sink.TableSink.poolOverride = None
    Seq(1, 4, 8).foreach { pool =>
      val rs = results(pool)
      println(f"$pool,${rs.head}%.2f,${rs(1)}%.2f,${rs.min}%.2f")
    }

    // Write-phase-only A/B: the sync's two staging scans are serial by
    // design (and unaffected by the pool), so the end-to-end ratio
    // understates the front-door win. Re-write the synced tables
    // through TableSink.writeAll alone.
    val tables = spark.read.parquet(s"$base/pool8/_ingest_nodes")
      .select("node_kind").distinct().collect().map(_.getString(0))
      .map { k =>
        k -> spark.read.parquet(s"$base/pool8/$k").localCheckpoint()
      }.toMap
    println(s"write-only tables=${tables.size}")
    println("pool,run1_sec,run2_sec,min_sec")
    val wres = collection.mutable.Map[Int, List[Double]]()
    for (round <- 1 to 2; pool <- Seq(1, 4, 8)) {
      graft.sink.TableSink.poolOverride = Some(pool)
      val sec = time {
        graft.sink.TableSink.writeAll(tables, s"$base/wo$pool")
      }
      wres(pool) = wres.getOrElse(pool, Nil) :+ sec
      val _ = round
    }
    graft.sink.TableSink.poolOverride = None
    Seq(1, 4, 8).foreach { pool =>
      val rs = wres(pool)
      println(f"$pool,${rs.head}%.2f,${rs(1)}%.2f,${rs.min}%.2f")
    }
    spark.stop()
  }
}
