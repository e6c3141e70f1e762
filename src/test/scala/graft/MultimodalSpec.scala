package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Multimodal plumbing (decode stub documented; schema/batch shapes real). */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("decode features are deterministic and typed per kind") {
    val a = Multimodal.extractFeatures(Multimodal.assets(spark, sf)).toDF().cache()
    val b = Multimodal.extractFeatures(Multimodal.assets(spark, sf)).toDF()
    assert(a.count() == b.count())
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    assert(a.filter(col("kind") === "video" && col("frames") < 1).count() == 0)
    assert(a.filter(col("kind") =!= "video" && col("frames") =!= 1).count() == 0)
  }

  test("resize emits target dims with bounded payloads") {
    val r = Multimodal.resize(Multimodal.assets(spark, sf), 128, 128).toDF().cache()
    assert(r.count() > 0)
    assert(r.filter(col("width") =!= 128 || col("height") =!= 128).count() == 0)
    val tooBig = r.select(max(length(col("payload")))).head().getInt(0)
    assert(tooBig <= 128 * 128 / 64)
  }

  test("sampleFrames count reconciles with the decoder's frames field") {
    val feats = Multimodal.extractFeatures(Multimodal.assets(spark, sf)).toDF()
      .filter(col("kind") === "video")
      .select(col("doc_id"), col("frames"))
    val sampled = Multimodal.sampleFrames(Multimodal.assets(spark, sf)).toDF()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
    val mismatch = feats.join(sampled, Seq("doc_id"), "full_outer")
      .filter(coalesce(col("frames"), lit(-1)) =!= coalesce(col("n_frames"), lit(-2)))
    assert(mismatch.count() == 0)
    // frame indices are dense 0..n-1 with the requested spacing
    val f = Multimodal.sampleFrames(Multimodal.assets(spark, sf), everyMs = 40L).toDF()
    assert(f.filter(col("ts_ms") =!= col("frame_idx") * 40L).count() == 0)
  }
}
