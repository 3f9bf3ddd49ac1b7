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

  test("poison payload is quarantined with its error; good rows still decode") {
    // a decoder that rejects short payloads — the corrupt-file case
    val poisonDecoder = new Multimodal.MediaDecoder {
      private val inner = new Multimodal.DeterministicStubDecoder(8)
      override def decode(payload: Array[Byte]): Multimodal.MediaFeatures = {
        if (payload.length < 10)
          throw new IllegalArgumentException(s"truncated payload: ${payload.length} bytes")
        inner.decode(payload)
      }
    }
    val good = media.limit(5)
    val poison = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(-1L, "BAD".getBytes("UTF-8"), null)),
      Multimodal.mediaSchema)
    val out = Multimodal.extractFeaturesQuarantined(
      good.unionByName(poison), poisonDecoder)
    val (decoded, quarantined) = Multimodal.splitQuarantine(out)
    // every good row decoded, identically to the non-quarantine path
    val expect = Multimodal.extractFeatures(good,
        new Multimodal.DeterministicStubDecoder(8))
      .select($"media_id", $"n_bytes").as[(Long, Int)].collect().toSet
    assert(decoded.select($"media_id", $"n_bytes")
      .as[(Long, Int)].collect().toSet == expect)
    assert(!decoded.columns.contains("error"))
    // the poison row landed in quarantine carrying the error
    val q = quarantined.as[(Long, String)].collect()
    assert(q.map(_._1).toSeq == Seq(-1L))
    assert(q.head._2.contains("truncated payload: 3 bytes"))
  }

  test("extracted features feed the similarity operators") {
    val feats = Multimodal.extractFeatures(media, new Multimodal.DeterministicStubDecoder(8))
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    val top = graft.operators.Similarity.bruteForceTopK(
      feats.filter($"vec_id" < 3), feats, "vec_id", "embedding", 3)
    assert(top.count() == 9)
  }

  test("media near-dup: identical payloads pair at cosine 1, distinct ones don't") {
    // two docs sharing a payload (identical thumbnail text), one distinct
    val docs = Seq(
      (1L, "shared leading words for the thumbnail"),
      (2L, "shared leading words for the thumbnail"),
      (3L, "an entirely different and unrelated document body")
    ).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(
        Multimodal.demoMediaTable(docs),
        new Multimodal.DeterministicStubDecoder(8))
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    val pairs = graft.operators.Similarity.nearDupPairsBanded(
        feats, "vec_id", "embedding", threshold = 0.999)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    // identical vectors: cosine is 1 up to the sqrt(a)·sqrt(a) ulp
    assert(math.abs(pairs.head._3 - 1.0) < 1e-12)
  }
}
