package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val media = Seq(
    Multimodal.MediaRecord(1L, "image", "fakejpegbytes".getBytes("UTF-8"),
      Multimodal.MediaMeta(Some(640), Some(480), None, Some("jpeg"))),
    Multimodal.MediaRecord(2L, "audio", ("pcm" * 100).getBytes("UTF-8"),
      Multimodal.MediaMeta(None, None, Some(16000), Some("wav"))),
    Multimodal.MediaRecord(3L, "video", ("frame" * 50).getBytes("UTF-8"),
      Multimodal.MediaMeta(Some(1920), Some(1080), None, Some("mp4")))
  ).toDS()

  test("media rows conform to mediaSchema") {
    val df = media.toDF()
    val expected = Multimodal.mediaSchema.fields.map(_.name).toSeq
    assert(df.columns.toSeq == expected)
    // parquet round-trip preserves binary + struct metadata
    val p = java.nio.file.Files.createTempDirectory("media").toString
    df.write.mode("overwrite").parquet(p)
    val back = spark.read.parquet(p)
    assert(back.count() == 3)
    assert(back.filter($"kind" === "audio").select($"meta.sample_rate")
      .collect().head.getInt(0) == 16000)
  }

  test("extractFeatures: deterministic, fixed shape, no shuffle") {
    val f1 = Multimodal.extractFeatures(spark, media).collect()
      .sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, media).collect()
      .sortBy(_.media_id)
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
    assert(f1.forall(_.feature.length == 8))
    assert(f1.head.byte_len == "fakejpegbytes".length)
    val plan = Multimodal.extractFeatures(spark, media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("decode/resize/frame-sample stubs keep the pipeline contracts") {
    val decoded = Multimodal.withDecodedMeta(media.toDF())
    val img = decoded.filter($"kind" === "image").select($"decoded")
      .collect().head
    assert(!img.isNullAt(0), "image rows must decode")
    assert(decoded.filter($"kind" === "audio").select($"decoded")
      .collect().head.isNullAt(0), "non-images skip decode")

    val resized = media.toDF().select($"media_id",
      Multimodal.resizeStub($"bytes", lit(2)).as("small"))
    resized.collect().foreach(r =>
      assert(r.getAs[Array[Byte]]("small").length <= 4))

    val frames = media.toDF().filter($"kind" === "video")
      .select(Multimodal.sampleFramesStub($"bytes", lit(5)).as("frames"))
      .collect().head.getSeq[Array[Byte]](0)
    assert(frames.length == 5)
  }
}
