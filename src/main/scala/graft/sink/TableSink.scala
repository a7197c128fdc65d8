package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** CSV variant (header, explicit layout — reference
    * arrow/writer.py:245-249). Nested columns must be stringified by the
    * caller first (the reference's CSV converter maps complex kinds to
    * JSON text, type_converter.py:35-55). */
  def writeAllCsv(tables: Map[String, DataFrame], base: String): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").option("header", "true")
        .csv(s"$base/$name")
    }

  /** Catalog repoint (the "view" half of the swap contract): register
    * each prod dir as a temp view so spark.sql sees the last completed
    * sync (P16 over the synced layout). */
  def registerProd(spark: SparkSession, paths: Map[String, String]): Unit =
    paths.foreach { case (name, path) =>
      spark.read.parquet(path).createOrReplaceTempView(name)
    }
}
