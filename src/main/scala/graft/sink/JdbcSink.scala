package graft.sink

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-database sink (P10 + P12 over JDBC) — the Spark analogue of the
  * reference's SQLAlchemy path: complex columns become JSON text (the
  * reference maps arrays/dicts/complex kinds to a JSON column type,
  * sql.py:75-80,103-104), rows insert in chunks (insert_batch_size =
  * 5000, sql.py:173,245-261 — here the JDBC writer's batchsize), each
  * table lands as `tmp_<name>` inside the sync and an explicit swap
  * renames staging over prod (sql.py:129-159: drop prod, RENAME tmp).
  *
  * Exercised against embedded Derby in JdbcSinkSpec; any JDBC-capable
  * store works the same way (dialect differences live in the JDBC
  * driver, as they live in SQLAlchemy dialects for the reference).
  */
object JdbcSink {

  val InsertBatchSize = 5000

  private def props(driver: String): Properties = {
    val p = new Properties()
    p.setProperty("driver", driver)
    p
  }

  /** Write each table to its staging name (`tmp_<table>`). Per-table
    * `columnTypes` carry the model's `len`-driven string widths into
    * the CREATE TABLE the writer issues (reference: sql.py:92-100 sizes
    * every string column from its metadata len; without this every
    * string would land as the dialect's default text type). */
  def writeStaging(tables: Map[String, DataFrame], url: String,
      driver: String = "org.apache.derby.jdbc.EmbeddedDriver",
      columnTypes: Map[String, String] = Map.empty): Unit =
    tables.foreach { case (name, df) =>
      val w = TableSink.stringifyNested(df).write
        .mode("overwrite")
        .option("batchsize", InsertBatchSize)
      columnTypes.get(name).filter(_.nonEmpty)
        .foreach(ddl => w.option("createTableColumnTypes", ddl))
      w.jdbc(url, staging(name), props(driver))
    }

  def staging(name: String): String = graft.model.ModelCompiler.tmpName(name)

  /** Atomic-per-table staging→prod swap: drop prod if present, rename
    * tmp into place (reference: sql.py:129-159). */
  def swapTempTables(url: String, tables: Iterable[String]): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      val existing = {
        val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
        val b = scala.collection.mutable.Set[String]()
        while (rs.next()) b += rs.getString("TABLE_NAME").toLowerCase
        b.toSet
      }
      tables.foreach { t =>
        if (existing.contains(staging(t).toLowerCase)) {
          if (existing.contains(t.toLowerCase))
            st.executeUpdate(s"""DROP TABLE "${t.toUpperCase}"""")
          st.executeUpdate(
            s"""RENAME TABLE "${staging(t).toUpperCase}" TO "${t.toUpperCase}"""")
        }
      }
    } finally conn.close()
  }

  /** Whole sync: staging writes + swap (one call per reference
    * update_sql run, collect_plugins.py:155-217). */
  def sync(tables: Map[String, DataFrame], url: String,
      columnTypes: Map[String, String] = Map.empty): Unit = {
    writeStaging(tables, url, columnTypes = columnTypes)
    swapTempTables(url, tables.keys)
  }

  def read(spark: SparkSession, url: String, table: String,
      driver: String = "org.apache.derby.jdbc.EmbeddedDriver"): DataFrame =
    spark.read.jdbc(url, table, props(driver))
}
