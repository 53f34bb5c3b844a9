package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed batch-wise.
  *
  * The decode kernels themselves (JPEG/PCM/video-frame codecs) are STUBBED
  * — this container has no media libraries — but everything Spark-side is
  * real and tested: the schema, the typed Dataset API, the per-partition
  * batch iteration shape (the Scala analog of `mapInPandas` with arrow
  * batches), and the deterministic fallback featurizer (byte histogram +
  * moments) that stands in where a codec would run.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Int)
  final case class MediaRecord(doc_id: String, meta: MediaMeta, payload: Array[Byte])
  final case class MediaFeatures(doc_id: String, kind: String, nBytes: Int,
      features: Array[Double])

  /** Deterministic synthetic corpus (no external data): payload bytes are a
    * seeded LCG stream; metadata cycles through the three modalities. */
  def synth(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val len = 256 + (i % 7).toInt * 128
      val bytes = new Array[Byte](len)
      var s = i * 6364136223846793005L + 1442695040888963407L
      var j = 0
      while (j < len) {
        s = s * 6364136223846793005L + 1442695040888963407L
        bytes(j) = (s >>> 56).toByte
        j += 1
      }
      MediaRecord(f"m$i%06d",
        MediaMeta(kind, 64 + (i % 4).toInt * 32, 64, 16000, 1000 + (i % 5).toInt * 500),
        bytes)
    }
  }

  /** STUB decode: where a real implementation would decode the payload
    * (image pixels / PCM samples / sampled video frames), we produce a
    * deterministic 16-bin byte histogram + 2 moments. The signature and
    * batch shape are the real contract: one partition = one iterator of
    * records, decoded in-order, output one feature row per input. */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val hist = new Array[Double](16)
    var sum = 0.0; var sumsq = 0.0
    for (b <- r.payload) {
      val u = b & 0xff
      hist(u >> 4) += 1.0
      sum += u; sumsq += u.toDouble * u
    }
    val n = r.payload.length
    val mean = sum / n
    MediaFeatures(r.doc_id, r.meta.kind, n,
      hist.map(_ / n) ++ Array(mean, sumsq / n - mean * mean))
  }

  /** Batch feature extraction: mapPartitions keeps codec state (a real
    * decoder would be initialized once per partition — the expensive part —
    * exactly like a Pandas UDF holds a model per batch). Narrow, no
    * shuffle; repartition upstream only to balance payload bytes. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition init would go here (codec/model handle)
      it.map(decodeStub)
    }
  }

  /** Relational view with the feature array exploded to columns. */
  def featureTable(records: Dataset[MediaRecord]): DataFrame =
    extractFeatures(records).toDF()
      .select(col("doc_id"), col("kind"), col("nBytes").as("n_bytes"),
        col("features"))
}
