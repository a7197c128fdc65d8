package graft

import graft.multimodal.Multimodal

/** Multimodal plumbing tests: schema contract, per-partition decode,
  * determinism, frame-sample shape. */
class MultimodalSpec extends SparkSpecBase {

  private lazy val assets = {
    import spark.implicits._
    val df = Seq((1L, "hello"), (2L, "world"), (3L, ""))
      .toDF("id", "body")
      .withColumn("bin", org.apache.spark.sql.functions.col("body")
        .cast("binary"))
    Multimodal.assetsFromBinary(df, "id", "bin", "text/plain")
  }

  test("asset schema contract: id, mime, binary payload") {
    assert(assets.toDF().schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("asset_id", "long"), ("mime", "string"), ("payload", "binary")))
  }

  test("per-partition decode is deterministic and complete") {
    val feats = Multimodal.decode(assets).collect().sortBy(_.asset_id)
    assert(feats.map(_.asset_id).toSeq == Seq(1L, 2L, 3L))
    assert(feats.map(_.n_bytes).toSeq == Seq(5, 5, 0))
    // Determinism: a second run produces identical fake features.
    val again = Multimodal.decode(assets).collect().sortBy(_.asset_id)
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
    assert(feats.forall(f => f.width >= 64 && f.height >= 64))
  }

  test("repartitioned decode yields the same features (batch-shape safe)") {
    val feats = Multimodal.decode(assets.repartition(3)).collect()
      .sortBy(_.asset_id).map(_.checksum).toSeq
    val base = Multimodal.decode(assets).collect()
      .sortBy(_.asset_id).map(_.checksum).toSeq
    assert(feats == base)
  }

  test("frame sampling explodes bounded frame indices") {
    val frames = Multimodal.sampleFrames(Multimodal.decode(assets), every = 2)
    assert(frames.columns.toSeq == Seq("asset_id", "frame_idx", "n_bytes"))
    val perAsset = frames.collect().groupBy(_.getLong(0))
    assert(perAsset.keySet == Set(1L, 2L, 3L))
    assert(frames.collect().forall(r => r.getLong(1) % 2 == 0))
  }
}
