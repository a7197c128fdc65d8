package graft

import org.apache.spark.sql.functions._

/** The roaring-bitmap column's three contracts (r11 VERDICT #6):
  * result identity with the sorted-array set fold it replaced,
  * sublinear partial bytes in cardinality (the reason the compressed
  * form exists at 100 TB), and split-independent union. */
class BitmapRollupSpec extends SparkSpecBase {

  import graft.functions.BitmapFunctions

  test("binary path equals the r11 sorted-array fold exactly") {
    val d = "/root/testdata/sf0.001"
    BitmapFunctions.register(spark)
    val viaBitmap = SparkEntry.queries("q_agg_bitmap_rollup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // The replaced implementation, verbatim: per-day sorted ID arrays,
    // weekly explode + countDistinct.
    val ev = graft.Tables.events(spark, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
    val daily = ev.groupBy("day")
      .agg(sort_array(collect_set(col("user_id"))).as("users"))
      .withColumn("week", expr("day div 7"))
    val census = daily.groupBy("week")
      .agg(count(lit(1)).as("n_days"),
        sum(size(col("users")).cast("long")).as("day_card_sum"))
    val exact = daily.select(col("week"), explode(col("users")).as("u"))
      .groupBy("week").agg(countDistinct("u").as("exact_users"))
    val viaArrays = census.join(exact, "week")
      .orderBy("week")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(viaBitmap == viaArrays)
  }

  test("partial bytes grow sublinearly in cardinality (vs 8 bytes/id for longs)") {
    import org.roaringbitmap.longlong.Roaring64Bitmap
    def bytesFor(n: Long): Long = {
      val bm = new Roaring64Bitmap()
      // Dense-but-gappy ids (every 3rd), the shape a real per-day
      // active-user set has within its id range.
      var i = 0L
      while (i < 3 * n) { bm.addLong(i); i += 3 }
      bm.runOptimize()
      val bos = new java.io.ByteArrayOutputStream()
      bm.serialize(new java.io.DataOutputStream(bos))
      bos.size().toLong
    }
    val small = bytesFor(1000L)
    val big = bytesFor(100000L)
    val perIdSmall = small.toDouble / 1000
    val perIdBig = big.toDouble / 100000
    assert(perIdBig < perIdSmall,
      f"bytes/id grew: $perIdSmall%.3f -> $perIdBig%.3f")
    assert(perIdBig < 4.0, // far under the 8 bytes/id of a long array
      f"bitmap not compressing: $perIdBig%.3f bytes/id at 100k")
  }

  test("bm_union is split-independent and bm_card exact") {
    import spark.implicits._
    BitmapFunctions.register(spark)
    val ids = (0L until 5000L).map(i => (i % 7, i / 2)) // dups across keys
    val df = ids.toDF("g", "id")
    val whole = df.agg(expr("bm_card(bm_agg(id))")).head().getLong(0)
    assert(whole == 2500L)
    // Partial bitmaps per group, then union-of-partials.
    val parts = df.groupBy("g").agg(expr("bm_agg(id)").as("bm"))
    val folded = parts.agg(expr("bm_card(bm_union(bm))")).head().getLong(0)
    assert(folded == whole)
  }
}
