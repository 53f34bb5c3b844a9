package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed batch-wise.
  *
  * The AUDIO path is fully real: a pure-JVM RIFF/WAV PCM16 parser
  * ([[decodeWav]], the analog of the reference's decoder front-end,
  * `Source/Crawler/FeatureExtraction/Source/SampleAnalyser.cpp:418-569`
  * sample loading) decodes payloads into the engine's token contract
  * ([[audioToSeqs]]) so decoded audio flows through the SAME feature
  * pipeline as the synthetic corpus. Image/video decode stays a
  * deterministic byte-featurizer fallback (no codec libs in this
  * container) — the Spark-side batch shape (mapPartitions with
  * per-partition codec init) is the real contract either way.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Int)
  final case class MediaRecord(doc_id: String, meta: MediaMeta, payload: Array[Byte])
  final case class MediaFeatures(doc_id: String, kind: String, nBytes: Int,
      features: Array[Double])

  // ------------------------------------------------------------------
  // RIFF/WAV PCM16 codec (pure JVM, little-endian, no deps)
  // ------------------------------------------------------------------

  /** Encode mono/interleaved PCM16 samples as a canonical RIFF/WAVE file
    * (fmt + data chunks). Used for fixtures and the synthetic corpus. */
  def encodeWav(samples: Array[Short], sampleRate: Int,
                channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a RIFF/WAVE PCM16 payload → (sampleRate, channels, samples).
    * Walks the chunk list (word-aligned, per the RIFF spec), requires a
    * PCM `fmt ` chunk with 16-bit samples before `data`. Throws
    * IllegalArgumentException on malformed input — the caller's salvage
    * path turns that into a status row, never a dropped record. */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    def fail(msg: String) = throw new IllegalArgumentException(s"WAV: $msg")
    if (bytes.length < 12) fail("truncated header")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (fourcc() != "RIFF") fail("missing RIFF magic")
    buf.getInt() // riff size (trust actual buffer bounds instead)
    if (fourcc() != "WAVE") fail("not a WAVE form")
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = fourcc()
      val size = buf.getInt()
      if (size < 0 || size > buf.remaining()) fail(s"bad chunk size in $id")
      id match {
        case "fmt " =>
          if (size < 16) fail("fmt chunk too small")
          val fmt = buf.getShort()
          if (fmt != 1) fail(s"not PCM (format $fmt)")
          channels = buf.getShort()
          rate = buf.getInt()
          buf.getInt()   // byte rate
          buf.getShort() // block align
          bits = buf.getShort()
          if (bits != 16) fail(s"not 16-bit ($bits)")
          buf.position(buf.position() + (size - 16))
        case "data" =>
          if (rate < 0) fail("data before fmt")
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort(); i += 1 }
          samples = out
        case _ =>
          buf.position(buf.position() + size)
      }
      if (samples == null && (size & 1) == 1 && buf.remaining() > 0)
        buf.get() // RIFF chunks are word-aligned
    }
    if (samples == null) fail("no data chunk")
    (rate, channels, samples)
  }

  /** Deterministic synthetic corpus (no external data): audio records carry
    * REAL WAV payloads (encoded PCM16 of a seeded integer waveform) so the
    * decode path is exercised end-to-end; image/video payloads are a seeded
    * LCG byte stream (codec-less fallback featurizer). */
  def synth(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val bytes =
        if (kind == "audio") {
          val len = 512 + (i % 5).toInt * 256
          val pcm = new Array[Short](len)
          var j = 0
          while (j < len) {
            pcm(j) = (((i + 1) * 1103515245L + j.toLong * j * 747796405L +
              j * 12345L) % 32768L - 16384L).toShort
            j += 1
          }
          encodeWav(pcm, 16000)
        } else {
          val len = 256 + (i % 7).toInt * 128
          val b = new Array[Byte](len)
          var s = i * 6364136223846793005L + 1442695040888963407L
          var j = 0
          while (j < len) {
            s = s * 6364136223846793005L + 1442695040888963407L
            b(j) = (s >>> 56).toByte
            j += 1
          }
          b
        }
      MediaRecord(f"m$i%06d",
        MediaMeta(kind, 64 + (i % 4).toInt * 32, 64, 16000, 1000 + (i % 5).toInt * 500),
        bytes)
    }
  }

  /** Interleaved multi-channel PCM → mono: per-frame channel mean with
    * integer truncation toward zero — the (L+R)/2 mixdown the analyser
    * front-end applies before analysis (`SampleAnalyser.cpp:418-569`
    * sample loading; "Mixdown / trivial projections", SURVEY §2.2). */
  def mixdown(pcm: Array[Short], channels: Int): Array[Int] = {
    if (channels <= 1) return pcm.map(_.toInt)
    val n = pcm.length / channels
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      var s = 0
      var c = 0
      while (c < channels) { s += pcm(i * channels + c); c += 1 }
      out(i) = s / channels
      i += 1
    }
    out
  }

  /** Decoded audio → the engine's canonical token contract
    * (doc_id, tokens, n_tok, source): decode, mix down to mono, map PCM16
    * onto the ±2048 token scale (>> 4), cap at [[Seqs.MaxTokens]] — from
    * here the record flows through the SAME `featuresLl`/`fvFull` pipeline
    * as any other sequence. Narrow per-row decode, no shuffle. */
  def audioToSeqs(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.filter(_.meta.kind == "audio").map { r =>
      val (_, ch, pcm) = decodeWav(r.payload)
      val mono = mixdown(pcm, ch)
      val n = math.min(mono.length, Seqs.MaxTokens)
      val tokens = new Array[Int](n)
      var i = 0
      while (i < n) { tokens(i) = mono(i) >> 4; i += 1 }
      (r.doc_id, tokens, n, "audio")
    }.toDF("doc_id", "tokens", "n_tok", "source")
  }

  /** Decode one record. Audio payloads go through the REAL WAV parser
    * (features = decoded-sample histogram + moments on the token scale);
    * image/video fall back to the deterministic byte featurizer (no codec
    * libs here — the batch shape is identical when one exists). */
  private def decode(r: MediaRecord): MediaFeatures =
    if (r.meta.kind == "audio") {
      val (_, _, pcm) = decodeWav(r.payload)
      val hist = new Array[Double](16)
      var sum = 0.0; var sumsq = 0.0
      var i = 0
      while (i < pcm.length) {
        val u = (pcm(i) + 32768) & 0xffff
        hist(u >> 12) += 1.0
        sum += pcm(i); sumsq += pcm(i).toDouble * pcm(i)
        i += 1
      }
      val n = math.max(pcm.length, 1)
      val mean = sum / n
      MediaFeatures(r.doc_id, r.meta.kind, r.payload.length,
        hist.map(_ / n) ++ Array(mean, sumsq / n - mean * mean))
    } else {
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
      it.map(decode)
    }
  }

  /** Relational view with the feature array exploded to columns. */
  def featureTable(records: Dataset[MediaRecord]): DataFrame =
    extractFeatures(records).toDF()
      .select(col("doc_id"), col("kind"), col("nBytes").as("n_bytes"),
        col("features"))
}
