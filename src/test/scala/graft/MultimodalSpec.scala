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

  test("perceptual near-dup finds byte-level near copies, not unrelated payloads") {
    import spark.implicits._
    // Non-repetitive ~2 KB payload: a 1-byte edit perturbs well under
    // 1% of the distinct byte 4-grams, so simhash Hamming stays within
    // the band guarantee (4x16-bit bands detect Hamming <= 3 for
    // certain). A SHORT payload is the documented recall edge: few
    // distinct shingles -> small per-bit margins -> one edit can flip
    // bits in every band.
    val base = (1 to 300).map(i => s"token$i word$i").mkString(" ")
    val nearCopy = base.updated(base.length / 2, 'X')
    val unrelated = (1 to 300).map(i => s"other$i gram$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearCopy), (3L, unrelated), (4L, ""))
      .toDF("doc_id", "text")
    val pairs = graft.queries.TextQueries.multimodalNeardupOn(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // Jaccard of the surviving pair is high (single-byte edit).
    val jac = graft.queries.TextQueries.multimodalNeardupOn(docs, 0.8)
      .collect().head.getDouble(2)
    assert(jac > 0.9 && jac <= 1.0, jac.toString)
  }

  test("near-dup tolerates sub-4-byte payloads (no descending sequence)") {
    import spark.implicits._
    val docs = Seq((1L, "ab"), (2L, "ab"), (3L, "x")).toDF("doc_id", "text")
    assert(graft.queries.TextQueries.multimodalNeardupOn(docs, 0.8)
      .count() == 0)
  }

  test("resize fits the box, preserves aspect direction, never hits zero") {
    // Exact integer contract: longer side maps to exactly `box`,
    // aspect ORDER is preserved, and degenerate dims clamp to 1.
    assert(Multimodal.fitBox(1024, 512, 256) == ((256, 128)))
    assert(Multimodal.fitBox(512, 1024, 256) == ((128, 256)))
    assert(Multimodal.fitBox(100, 100, 256) == ((256, 256)))
    assert(Multimodal.fitBox(100000, 1, 256) == ((256, 1)))
    for (w <- 1 to 40; h <- 1 to 40) {
      val (ow, oh) = Multimodal.fitBox(w, h, 256)
      assert(ow >= 1 && oh >= 1 && math.max(ow, oh) == 256)
      assert((w >= h) == (ow >= oh), s"aspect order flipped for $w x $h")
    }
    // The chained codec stage carries every asset through.
    val resized = Multimodal.resize(Multimodal.decode(assets), 256)
      .collect().sortBy(_.asset_id)
    assert(resized.map(_.asset_id).toSeq == Seq(1L, 2L, 3L))
    assert(resized.forall(r => math.max(r.out_width, r.out_height) == 256))
  }

  test("frame sampling explodes bounded frame indices") {
    val frames = Multimodal.sampleFrames(Multimodal.decode(assets), every = 2)
    assert(frames.columns.toSeq == Seq("asset_id", "frame_idx", "n_bytes"))
    val perAsset = frames.collect().groupBy(_.getLong(0))
    assert(perAsset.keySet == Set(1L, 2L, 3L))
    assert(frames.collect().forall(r => r.getLong(1) % 2 == 0))
  }
}
