package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder-prompt extension surface): treat
  * image/audio/video as opaque `binary` columns with typed metadata, and
  * run decode / feature-extraction / frame-sampling as batched
  * per-partition stages.
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * codecs — behind [[MediaDecoder]]; [[DeterministicStubDecoder]] fakes
  * features from the bytes deterministically so the Spark-side plumbing
  * (schema, batching, partitioning, output shape) is real and tested. A
  * production deployment implements MediaDecoder with its codec of choice
  * (one instance per partition, never per row).
  *
  * Scale notes: binary payloads are heavy — always `select` them away
  * before joins/shuffles and re-attach by id; feature extraction is a
  * mapPartitions scan (no shuffle); the output is a narrow (id, features,
  * meta) frame that shuffles cheaply.
  */
object Multimodal {

  /** media metadata struct: mime + dimensions + duration. */
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", metaSchema)))

  final case class MediaFeatures(
      width: Int, height: Int, nBytes: Int, features: Array[Float])

  /** Per-partition decoder contract. Implementations must be Serializable
    * and cheap to instantiate once per partition.
    */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): MediaFeatures
  }

  /** STUB decoder: derives deterministic pseudo-features from the payload
    * bytes (md5-seeded). Replaces a real codec in this offline container.
    */
  final class DeterministicStubDecoder(featureDim: Int = 8) extends MediaDecoder {
    override def decode(payload: Array[Byte]): MediaFeatures = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
      val feats = Array.tabulate(featureDim)(i => (d(i % d.length) & 0xff) / 255.0f)
      MediaFeatures(
        width = 1 + ((d(0) & 0xff) % 64),
        height = 1 + ((d(1) & 0xff) % 64),
        nBytes = payload.length,
        features = feats)
    }
  }

  /** Fabricate a demo media table from the documents table (payload =
    * 64 md5-derived bytes) — stands in for `spark.read.format("binaryFile")`
    * over a real media landing directory. The payload is the ASCII bytes
    * of the doubled md5 hex string (not unhex'd): byte-identical content,
    * but an oracle engine whose md5() takes strings only (DuckDB) can
    * still mirror the decoder's md5-of-payload stage.
    */
  def demoMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      repeat(md5(col("text")), 2).cast("binary").as("payload"),
      struct(
        lit("application/x-demo").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        (length(col("text")) * 10L).as("duration_ms")).as("meta"))

  /** Feature extraction: one decoder per partition, batched iteration,
    * narrow output (media_id, width, height, n_bytes, features).
    */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder): DataFrame = {
    val spark = media.sparkSession
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", IntegerType),
      StructField("features", ArrayType(FloatType))))
    // DELIBERATE exit from codegen/columnar: `.rdd` ends whole-stage
    // codegen here — acceptable for a decode stage whose cost is the
    // codec, not the row plumbing. Binary payloads must be projected
    // away before any shuffle; only this narrow output shuffles.
    val rows = media.rdd.mapPartitions { it =>
      // decoder is reused across the whole partition (the expensive init
      // a real codec would have happens once here, not per row)
      it.map { r =>
        val f = decoder.decode(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), f.width, f.height, f.nBytes, f.features.toSeq)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** [[extractFeatures]] with PER-ITEM error isolation — the reference
    * DAG's quarantine pattern (D5, `process_publications_dag.py:79-82`)
    * applied to the decode stage: a payload the decoder rejects yields a
    * quarantine row carrying the error instead of failing the task (and
    * with it the stage and the job — at 100 TB one corrupt file must
    * never kill a 1000-executor decode pass). Single scan, single output
    * frame with a nullable `error` column; split it with
    * [[splitQuarantine]]. Only NonFatal throwables are quarantined — an
    * OOM/LinkageError still fails the task loudly.
    */
  def extractFeaturesQuarantined(media: DataFrame,
      decoder: MediaDecoder): DataFrame = {
    val spark = media.sparkSession
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", IntegerType),
      StructField("features", ArrayType(FloatType)),
      StructField("error", StringType)))
    val rows = media.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        try {
          val f = decoder.decode(r.getAs[Array[Byte]](payloadIdx))
          Row(id, f.width, f.height, f.nBytes, f.features.toSeq, null)
        } catch { case scala.util.control.NonFatal(e) =>
          Row(id, null, null, null, null,
            s"${e.getClass.getName}: ${e.getMessage}")
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** (decoded, quarantined) split of [[extractFeaturesQuarantined]]'s
    * output: decoded rows drop the always-null error column; quarantine
    * keeps (media_id, error) for the re-drive/report loop.
    */
  def splitQuarantine(out: DataFrame): (DataFrame, DataFrame) =
    (out.filter(col("error").isNull).drop("error"),
      out.filter(col("error").isNotNull).select(col("media_id"), col("error")))

  /** Frame sampling stub: emit every `stride`-th 16-byte slice of the
    * payload as a "frame" (posexplode keeps the frame index). Real video
    * sampling swaps the slicer for a codec; the explode/partition shape
    * is what matters at scale.
    */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame =
    media
      .select(col("media_id"),
        posexplode(split(hex(col("payload")), s"(?<=\\G.{32})")).as(Seq("frame_idx", "frame_hex")))
      .filter(col("frame_idx") % stride === 0 && length(col("frame_hex")) > 0)
      .select(col("media_id"), col("frame_idx"), unhex(col("frame_hex")).as("frame"))
}
