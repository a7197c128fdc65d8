package graft

import java.nio.file.Files
import graft.sink.JdbcSink

/** JDBC sink against embedded Derby: staging write, swap, readback —
  * the SQL-database flavor of the sync (mirrors tests/sql_test.py's
  * sqlite round-trips). */
class JdbcSinkSpec extends SparkSpecBase {

  private lazy val url = {
    val dir = Files.createTempDirectory("graft_derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("sync writes staging, swaps to prod, and reads back") {
    import spark.implicits._
    val v1 = Seq((1L, "a", Seq("x", "y")), (2L, "b", Seq("z")))
      .toDF("id", "name", "tags")
    JdbcSink.sync(Map("things" -> v1), url)

    val back = JdbcSink.read(spark, url, "things")
    assert(back.count() == 2)
    // Complex column arrived as JSON text (SQL-sink type mapping).
    val tags = back.filter($"id" === 1L).select("tags")
      .collect().head.getString(0)
    assert(tags == """["x","y"]""")

    // Second sync replaces the snapshot; staging is gone after swap.
    val v2 = Seq((3L, "c", Seq("w"))).toDF("id", "name", "tags")
    JdbcSink.sync(Map("things" -> v2), url)
    val after = JdbcSink.read(spark, url, "things")
    assert(after.select("id").collect().map(_.getLong(0)).toSeq == Seq(3L))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      val names = scala.collection.mutable.Set[String]()
      while (rs.next()) names += rs.getString("TABLE_NAME").toLowerCase
      assert(names.contains("things"))
      assert(!names.contains(JdbcSink.staging("things").toLowerCase))
    } finally conn.close()
  }
}
