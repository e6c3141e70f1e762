package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video as opaque
  * binary columns + typed metadata, with decode/feature-extract as
  * partition-batched transforms.
  *
  * The actual codec decode is STUBBED (no image/audio libraries in this
  * container): `decodeStub` derives deterministic fake pixel metadata from
  * the payload bytes. Everything around it — the binary schema, the
  * mapPartitions batch shape (reuse one decoder instance per partition, the
  * per-partition-init pattern heavy codecs need), partitioning, and the
  * feature join — is real and tested, so swapping a JNI/FFmpeg decoder in
  * replaces exactly one function.
  */
object Multimodal {

  final case class Asset(doc_id: Long, kind: String, payload: Array[Byte],
                         declared_w: Int, declared_h: Int)
  final case class AssetFeatures(doc_id: Long, kind: String, n_bytes: Long,
                                 width: Int, height: Int, phash: Long,
                                 frames: Int)

  /** Deterministic synthetic assets from documents: payload = UTF-8 text
    * bytes (stand-in for encoded media), kind cycles image/audio/video.
    */
  def assets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        Asset(id, kind, bytes, 64 + (id % 16).toInt * 8, 64 + (id % 9).toInt * 8)
      }
  }

  /** Frame count of a (fake-)decoded video payload — the ONE definition
    * shared by [[extractFeatures]]'s `frames` and [[sampleFrames]], so the
    * mm2 reconcile invariant can't drift between the two (VERDICT r02 #4).
    */
  private[operators] def frameCount(payload: Array[Byte]): Int =
    1 + (payload.length % 32)

  /** STUB decoder — deterministic fake decode. A real implementation would
    * hand `payload` to an image/audio codec; the signature and batch usage
    * are the real contract.
    */
  private def decodeStub(a: Asset): AssetFeatures = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < a.payload.length) { h = (h ^ a.payload(i)) * 0x100000001b3L; i += 1 }
    AssetFeatures(a.doc_id, a.kind, a.payload.length.toLong,
      a.declared_w, a.declared_h, h,
      if (a.kind == "video") frameCount(a.payload) else 1)
  }

  /** Decode/feature-extract over partition batches: one decoder per
    * partition (setup/teardown pattern for heavy codecs), rows streamed.
    */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real decoders initialize here once per partition (JNI ctx, model, …)
      it.map(decodeStub)
    }
  }

  final case class ResizedAsset(doc_id: Long, kind: String, width: Int,
                                height: Int, payload: Array[Byte])

  /** Resize over partition batches — same per-partition-init contract as
    * [[extractFeatures]]. STUB transform: deterministic payload truncation
    * proportional to the target pixel count (a real implementation hands the
    * bytes to the codec's scaler); dims and batch shape are the real
    * contract.
    */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real scaler initializes here once per partition
      it.map { a =>
        val keep = math.max(16, math.min(a.payload.length, w * h / 64))
        ResizedAsset(a.doc_id, a.kind, w, h, a.payload.take(keep))
      }
    }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, ts_ms: Long,
                         n_bytes: Int, payload: Array[Byte])

  /** Frame sampling for video assets: one row per sampled frame at
    * `everyMs` spacing — iterator flatMap inside mapPartitions, so a long
    * video never materializes all frames at once. Frame count matches
    * [[extractFeatures]]'s `frames` (STUB: derived from payload length;
    * payload slice is the deterministic fake frame).
    */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long = 1000L): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { a =>
        val n = frameCount(a.payload)
        val len = math.max(a.payload.length, 1)
        (0 until n).iterator.map { i =>
          val start = (i * 4) % len
          val bytes = a.payload.slice(start, math.min(start + 16, a.payload.length))
          Frame(a.doc_id, i, i * everyMs, bytes.length, bytes)
        }
      }
    }
  }

  /** Feature summary per kind — the downstream relational shape. */
  def featureSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val f = extractFeatures(assets(spark, sfDir)).toDF()
    f.groupBy(col("kind")).agg(
      count(lit(1)).as("n_assets"),
      sum(col("n_bytes")).as("total_bytes"),
      round(avg(col("width")), 2).as("avg_width"),
      sum(col("frames")).as("total_frames"))
  }
}
