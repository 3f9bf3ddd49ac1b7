package graft

import graft.sources.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.demoMediaTable(Tables(spark, sf, "documents"))

  test("demo media table has binary payloads with typed metadata") {
    val r = media.select($"payload", $"meta.mime", $"meta.duration_ms").head()
    assert(r.getAs[Array[Byte]](0).length == 64) // 2 × 32 md5 hex chars
    assert(r.getString(1) == "application/x-demo")
    assert(r.getLong(2) > 0)
  }

  test("extractFeatures: one row per media, fixed feature dim, deterministic") {
    val f1 = Multimodal.extractFeatures(media, new Multimodal.DeterministicStubDecoder(8))
    assert(f1.count() == media.count())
    val row = f1.orderBy($"media_id").head()
    assert(row.getAs[scala.collection.Seq[Float]]("features").length == 8)
    val f2 = Multimodal.extractFeatures(media, new Multimodal.DeterministicStubDecoder(8))
    assert(f1.orderBy($"media_id").collect().toSeq ==
      f2.orderBy($"media_id").collect().toSeq)
  }

  test("sampleFrames: strided 16-byte frames with preserved index") {
    val frames = Multimodal.sampleFrames(media, stride = 2)
    val r = frames.select($"media_id", $"frame_idx", length($"frame").as("len"))
      .as[(Long, Int, Int)].collect()
    assert(r.nonEmpty)
    assert(r.forall(_._2 % 2 == 0))
    assert(r.forall(_._3 == 16))
    // payload is 64 bytes → frames 0 and 2 survive stride 2
    assert(r.count(_._1 == r.head._1) == 2)
  }

  test("extracted features feed the similarity operators") {
    val feats = Multimodal.extractFeatures(media, new Multimodal.DeterministicStubDecoder(8))
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    val top = graft.operators.Similarity.bruteForceTopK(
      feats.filter($"vec_id" < 3), feats, "vec_id", "embedding", 3)
    assert(top.count() == 9)
  }
}
