package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Per-table batch file sink (P10/P14/P15): each table written as a
  * partitioned parquet or CSV directory, routed through the staging→prod
  * snapshot swap so a sync is all-or-nothing per table (reference:
  * arrow/writer.py:222-309 lazily creates one writer per table;
  * sql.py:245-261 chunks inserts — in Spark both collapse into the
  * DataFrame writer, with file sizing governed by partitioning).
  *
  * Cloud paths (s3a://, gs://) work through the same API via Hadoop FS
  * connectors (reference's boto3/GCS upload, arrow/writer.py:187-219) —
  * swap semantics degrade to best-effort on object stores (SURVEY §7.4).
  */
object TableSink {

  /** Write every table through the snapshot-swap protocol; returns the
    * prod path per table. */
  def writeAll(tables: Map[String, DataFrame], base: String): Map[String, String] =
    tables.map { case (name, df) =>
      name -> SnapshotSwap.write(df, base, name)
    }

  /** CSV parity for nested data (the reference's CSV converter maps
    * complex kinds to JSON text, arrow/type_converter.py:35-55, and its
    * normalizer json-stringifies non-strings under string leaves,
    * arrow/writer.py:124-168): every array/map/struct column becomes a
    * to_json string column; atomic columns pass through. */
  def stringifyNested(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: MapType | _: StructType =>
          to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** CSV variant (header, explicit layout — reference
    * arrow/writer.py:245-249). Nested columns are stringified to JSON
    * text automatically. */
  def writeAllCsv(tables: Map[String, DataFrame], base: String): Unit =
    tables.foreach { case (name, df) =>
      stringifyNested(df).write.mode("overwrite").option("header", "true")
        .csv(s"$base/$name")
    }

  /** Catalog repoint (the "view" half of the swap contract): register
    * each prod dir as a temp view so spark.sql sees the last completed
    * sync (P16 over the synced layout). */
  def registerProd(spark: SparkSession, paths: Map[String, String]): Unit =
    paths.foreach { case (name, path) =>
      spark.read.parquet(path).createOrReplaceTempView(name)
    }

  /** Stale-table sweep — the parquet analogue of the reference's
    * `drop_existing_tables` swap option (sql.py:150-151): remove prod
    * table dirs, and manifest pointers with their snapshot dirs, for
    * tables absent from the current sync (`keep`), and deregister
    * their temp views — a kind that left the model must not keep
    * serving a previous sync's data forever. Internal dirs
    * (`_staging_*`, `_old_*`, `_ingest_*`, `_snap_*`) are never prod
    * tables and are skipped. */
  def dropStaleProd(spark: SparkSession, base: String,
      keep: Set[String]): Unit = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(base)
    if (!Files.exists(dir)) return
    val names = {
      val children = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        children.iterator().asScala.map(_.getFileName.toString).toList
      } finally children.close()
    }
    names.filterNot(_.startsWith("_")).foreach { n =>
      if (n.endsWith(".manifest")) {
        val table = n.stripSuffix(".manifest")
        if (!keep.contains(table)) {
          // EVERY snapshot version, not just the published one: the
          // deferred-retention protocol keeps the predecessor dir
          // alive, and with the manifest gone nothing would ever sweep
          // it.
          names.filter(_.startsWith(s"_snap_$table-"))
            .foreach(snap => SnapshotSwap.rm(Paths.get(base, snap)))
          SnapshotSwap.rm(dir.resolve(n))
          spark.catalog.dropTempView(table)
        }
      } else if (Files.isDirectory(dir.resolve(n)) && !keep.contains(n)) {
        SnapshotSwap.rm(dir.resolve(n))
        spark.catalog.dropTempView(n)
      }
    }
  }
}
