package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with typed metadata, and
  * decode/feature-extract steps run as per-partition codecs (the Scala
  * analogue of a Pandas UDF over mapInPandas: one iterator of rows per
  * partition, batch-shaped, no per-row JVM boundary crossing).
  *
  * The actual media decode is STUBBED (this environment has no
  * image/audio libraries): `decodeStub` derives deterministic fake
  * features from the payload bytes. The Spark-side plumbing — schema,
  * encoders, partitioning, per-partition batch shape — is real and
  * tested; swapping `decodeStub` for a JNI/FFI codec changes no plan
  * shape.
  */
object Multimodal {

  /** An asset row: payload + typed metadata (schema contract). */
  final case class Asset(
      asset_id: Long,
      mime: String,
      payload: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  final case class AssetFeatures(
      asset_id: Long,
      mime: String,
      n_bytes: Int,
      width: Int, // fake: derived from payload hash
      height: Int, // fake: derived from payload hash
      checksum: Long)

  /** Deterministic fake decode of one payload — stands in for the real
    * codec (??? in spirit; deterministic so tests can golden it and the
    * driver's DuckDB oracle can recompute it: the "features" derive
    * from the big-endian first 8 bytes of sha256(payload)). */
  def decodeStub(a: Asset): AssetFeatures = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(a.payload)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    AssetFeatures(
      asset_id = a.asset_id,
      mime = a.mime,
      n_bytes = a.payload.length,
      width = 64 + (h & 1023L).toInt,
      height = 64 + ((h >>> 10) & 1023L).toInt,
      checksum = h)
  }

  /** Per-partition decode — the mapInPandas-shaped boundary: the codec
    * sees a whole partition iterator (amortizes codec init per task,
    * exactly like batch-wise Pandas UDF execution). */
  def decode(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // Real impl: initialize the codec once per partition here.
      it.map(decodeStub)
    }
  }

  /** A resized asset: original + fitted dimensions (the payload would
    * be the re-encoded bytes in a real codec; the stub carries the
    * deterministic dims so the oracle can recompute them). */
  final case class ResizedAsset(
      asset_id: Long,
      width: Int, height: Int,
      out_width: Int, out_height: Int)

  /** Fit (w, h) into a box×box square preserving aspect ratio — EXACT
    * integer arithmetic (floor division, min-1 clamp) so any engine
    * recomputes the identical dims. Upscales small assets too (the
    * thumbnail-grid convention); a real pipeline gates that with a
    * no-upscale flag at the same call site. */
  def fitBox(w: Int, h: Int, box: Int): (Int, Int) = {
    val m = math.max(w, h)
    (math.max(1, w * box / m), math.max(1, h * box / m))
  }

  /** Per-partition resize — the second codec stage, chained after
    * [[decode]]: same mapInPandas-shaped boundary (batch iterator per
    * partition, codec init amortized per task). The stub computes the
    * target dims from the decoded fake dims; a real impl would also
    * re-encode the payload here, changing no plan shape. */
  def resize(features: Dataset[AssetFeatures], box: Int): Dataset[ResizedAsset] = {
    require(box > 0)
    import features.sparkSession.implicits._
    features.mapPartitions { it =>
      // Real impl: initialize the scaler/encoder once per partition.
      it.map { f =>
        val (ow, oh) = fitBox(f.width, f.height, box)
        ResizedAsset(f.asset_id, f.width, f.height, ow, oh)
      }
    }
  }

  /** Build an asset table from any binary column (here: text bytes as
    * payloads so the shape is testable without media files). */
  def assetsFromBinary(df: DataFrame, idCol: String, binCol: String,
      mime: String): Dataset[Asset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("asset_id"),
      lit(mime).as("mime"),
      col(binCol).cast("binary").as("payload")).as[Asset]
  }

  /** Frame-sampling shape: one row per sampled frame index — the
    * explode-side of video handling (plumbing only; the stub "samples"
    * indices, a real impl would slice the payload). */
  def sampleFrames(features: Dataset[AssetFeatures], every: Int): DataFrame = {
    require(every > 0)
    features.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), pmod(col("checksum"), lit(10)), lit(every))))
      .select("asset_id", "frame_idx", "n_bytes")
  }
}
