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
  * pipeline as the synthetic corpus. The IMAGE path is real too: PNG
  * payloads decode through JDK ImageIO ([[decodeImage]] — in the JDK, no
  * codec deps; the front-end analog of `SampleAnalyser.cpp:443-528`) into
  * a gray-pixel featurizer with integer-exact sums, oracle-verified
  * against the analytic pixel formula (PNG is lossless, so decode must
  * reproduce it bit-for-bit). The VIDEO path is now real as well: a
  * pure-JVM uncompressed-AVI parser ([[decodeAvi]] — RIFF chunk walking
  * exactly like the WAV codec, BI_RGB 24-bit DIB frames, no codec deps)
  * feeds a per-frame featurizer with a frame-sampling operator
  * ([[videoFrameTable]], the "decode / frame-sample" multimodal op),
  * oracle-verified against the analytic per-frame pixel formula
  * (uncompressed DIB is lossless, so the same bit-for-bit argument as
  * PNG applies).
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

  // ------------------------------------------------------------------
  // PNG codec (JDK ImageIO — in the JDK, no external deps)
  // ------------------------------------------------------------------

  /** Deterministic synthetic gray value of pixel (x, y) in image `i` —
    * pure integer arithmetic, mirrored analytically by the DuckDB oracle
    * ([[duckImageFeaturesSql]]): the PNG round trip is lossless, so the
    * decoded featurization must reproduce this formula exactly. */
  def synthGray(i: Long, x: Int, y: Int): Int =
    ((x * 7 + y * 13 + i * 31) % 256).toInt

  /** Synthetic image dims: width varies with `i`, height fixed. */
  def synthDims(i: Long): (Int, Int) = (32 + (i % 4).toInt * 16, 24)

  /** Encode a gray image (row-major `gray(x, y)` in 0..255) as a truecolor
    * PNG (r = g = b) via ImageIO. Truecolor keeps the round trip exact —
    * no palette quantization, no gamma chunk. */
  def encodePng(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = gray(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a PNG/BMP/GIF payload via ImageIO → (width, height, row-major
    * gray values 0..255; gray = the blue channel — equal to r and g for the
    * truecolor-gray images this engine writes). Throws
    * IllegalArgumentException on malformed input — same salvage contract as
    * [[decodeWav]]: the caller turns it into a status row, never a dropped
    * record or garbage features. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    // Peek header-declared dimensions via the reader API BEFORE the full
    // decode: ImageIO.read allocates the whole raster from the header, so
    // a tiny crafted payload claiming 30000x30000 would drive a multi-GB
    // allocation (executor OOM — not the contracted salvage IAE) otherwise.
    // NonFatal (not just IOException): the JDK plugins throw unchecked
    // exceptions (ArrayIndexOutOfBounds, NegativeArraySize, ...) on crafted
    // chunk data — those must become the contracted salvage IAE too, never
    // a task-killing escape. Own IAEs pass through unwrapped.
    val img =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext)
            throw new IllegalArgumentException(
              "image: no registered decoder matched")
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val (hw, hh) = (reader.getWidth(0), reader.getHeight(0))
            if (hw <= 0 || hh <= 0 || hw > 32768 || hh > 32768 ||
                hw.toLong * hh > (1L << 26))
              throw new IllegalArgumentException(
                s"image: implausible dimensions ${hw}x$hh")
            reader.read(0)
          } finally reader.dispose()
        } finally iis.close()
      } catch {
        case e: IllegalArgumentException => throw e
        case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(
            s"image: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    if (img == null)
      throw new IllegalArgumentException("image: no registered decoder matched")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(y * w + x) = img.getRGB(x, y) & 0xff
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  // ------------------------------------------------------------------
  // AVI codec (pure JVM, uncompressed BI_RGB 24-bit DIB frames, no deps)
  // ------------------------------------------------------------------

  /** Deterministic synthetic gray value of pixel (x, y) in frame `f` of
    * video `i` — pure integer arithmetic, mirrored analytically by the
    * DuckDB oracle ([[duckVideoFramesSql]]): uncompressed DIB is lossless,
    * so the decoded featurization must reproduce this formula exactly
    * (the same bit-for-bit round-trip argument as [[synthGray]]/PNG). */
  def synthVideoGray(i: Long, f: Int, x: Int, y: Int): Int =
    ((x * 7 + y * 13 + f * 17 + i * 31) % 256).toInt

  /** Synthetic video dims/frame-count: width varies with `i` (multiples of
    * 8 — no DIB row padding, which keeps the oracle formula simple; the
    * decoder still handles padded strides, spec-tested with odd widths). */
  def synthVideoDims(i: Long): (Int, Int) = (16 + (i % 3).toInt * 8, 12)
  def synthVideoFrames(i: Long): Int = 4 + (i % 5).toInt

  /** Encode gray frames (`gray(f)(y * width + x)` in 0..255) as a minimal
    * uncompressed RIFF/AVI: LIST hdrl (avih + LIST strl(strh 'vids'/'DIB ',
    * strf BITMAPINFOHEADER BI_RGB 24-bit)) + LIST movi of '00db' chunks,
    * each a bottom-up BGR24 DIB with rows padded to 4-byte alignment.
    * Used for fixtures and the synthetic corpus. */
  def encodeAvi(width: Int, height: Int, frames: Array[Array[Int]],
                fps: Int = 10): Array[Byte] = {
    val stride = (width * 3 + 3) & ~3
    val frameBytes = stride * height
    val nf = frames.length
    val moviSize = 4 + nf * (8 + frameBytes)
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    cc("RIFF"); buf.putInt(riffSize); cc("AVI ")
    cc("LIST"); buf.putInt(hdrlSize); cc("hdrl")
    cc("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps).putInt(frameBytes * fps).putInt(0)
      .putInt(0 /* no flags — no idx1 index chunk is written */)
      .putInt(nf).putInt(0)
      .putInt(1).putInt(frameBytes).putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); buf.putInt(4 + (8 + 56) + (8 + 40)); cc("strl")
    cc("strh"); buf.putInt(56)
    cc("vids"); cc("DIB ")
    buf.putInt(0).putInt(0).putInt(0)            // flags, prio+lang, initial
      .putInt(1).putInt(fps)                     // scale, rate -> fps
      .putInt(0).putInt(nf).putInt(frameBytes)   // start, length, bufsize
      .putInt(-1).putInt(0)                      // quality, sampleSize
      .putShort(0).putShort(0)                   // rcFrame
      .putShort(width.toShort).putShort(height.toShort)
    cc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height)  // biSize, w, h (bottom-up)
      .putShort(1).putShort(24)                  // planes, bitcount
      .putInt(0)                                 // BI_RGB
      .putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); buf.putInt(moviSize); cc("movi")
    for (fr <- frames) {
      cc("00db"); buf.putInt(frameBytes)
      var y = height - 1                         // DIB rows are bottom-up
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val g = (fr(y * width + x) & 0xff).toByte
          buf.put(g).put(g).put(g)               // B, G, R
          x += 1
        }
        var pad = stride - width * 3
        while (pad > 0) { buf.put(0.toByte); pad -= 1 }
        y -= 1
      }
    }
    buf.array()
  }

  /** Parse an uncompressed RIFF/AVI payload → (width, height, fps, frames
    * of row-major gray values; gray = the blue channel — equal to r and g
    * for the gray videos this engine writes). Walks the chunk lists like
    * [[decodeWav]] (word-aligned), requires BITMAPINFOHEADER BI_RGB 24-bit,
    * collects '00db'/'00dc' frame chunks from LIST movi. Throws
    * IllegalArgumentException on malformed input — same salvage contract:
    * the caller turns it into a status row, never a dropped record. */
  def decodeAvi(bytes: Array[Byte]): (Int, Int, Int, Array[Array[Int]]) = {
    val (w, h, fps, _, frames) = decodeAviFrames(bytes, _ => true)
    (w, h, fps, frames.map(_._2))
  }

  /** [[decodeAvi]] with per-frame selection: pixel extraction (the
    * dominant decode cost — a per-pixel copy plus a w·h·4-byte allocation
    * per frame) runs ONLY for frame indices `keep` accepts; rejected
    * frames are chunk-skipped. At the realistic every-k-th sampling ratios
    * the frame-sample operator advertises, eager full decode would throw
    * away (k−1)/k of the work. Returns (width, height, fps, TOTAL frame
    * count, kept (frame_id, gray) pairs in stream order). */
  def decodeAviFrames(bytes: Array[Byte], keep: Int => Boolean)
      : (Int, Int, Int, Int, Array[(Int, Array[Int])]) = {
    def fail(msg: String) = throw new IllegalArgumentException(s"AVI: $msg")
    if (bytes.length < 12) fail("truncated header")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (fourcc() != "RIFF") fail("missing RIFF magic")
    buf.getInt() // riff size (trust actual buffer bounds instead)
    if (fourcc() != "AVI ") fail("not an AVI form")
    var width = -1; var height = -1; var fps = -1
    var scale = 0; var rate = 0
    var lastStrh = "" // stream type of the most recent strh (vids/auds/...)
    var nFrames = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Int])]
    // walk(limit): parse sibling chunks until `limit`; LIST recurses.
    def walk(limit: Int): Unit = {
      while (buf.position() + 8 <= limit) {
        val id = fourcc()
        val size = buf.getInt()
        if (size < 0 || buf.position() + size > limit)
          fail(s"bad chunk size in $id")
        val end = buf.position() + size
        id match {
          case "LIST" =>
            if (size < 4) fail("LIST too small")
            fourcc() // list type (hdrl/strl/movi) — contents self-identify
            walk(end)
            buf.position(end) // skip list slack the inner walk left behind
          case "strh" =>
            if (size < 32) fail("strh too small")
            lastStrh = fourcc()
            if (lastStrh == "vids") {
              buf.position(buf.position() + 16) // handler..initial
              scale = buf.getInt(); rate = buf.getInt()
              if (scale > 0) fps = rate / scale
            }
            buf.position(end)
          case "strf" =>
            // bind the format to ITS stream (the strh just seen) — a file
            // listing an audio strl first must not poison the video format
            if (lastStrh == "vids" && width < 0) {
              if (size < 40) fail("strf too small")
              buf.getInt() // biSize
              width = buf.getInt(); height = buf.getInt()
              buf.getShort()
              val bits = buf.getShort()
              val comp = buf.getInt()
              if (comp != 0) fail(s"not BI_RGB (compression $comp)")
              if (bits != 24) fail(s"not 24-bit ($bits)")
              if (width <= 0 || height == 0) fail("bad dimensions")
              if (height < 0) fail("top-down DIB unsupported")
              // header-declared dims bound the allocation below; a crafted
              // header must not drive a multi-GB array or Int overflow
              // (stride * height and width * height stay well inside Int)
              if (width > 32768 || height > 32768 ||
                  width.toLong * height > (1L << 26))
                fail(s"implausible dimensions ${width}x$height")
            }
            buf.position(end)
          case "00db" | "00dc" =>
            if (width < 0) fail("frame before stream format")
            val stride = (width * 3 + 3) & ~3
            if (size < stride * height) fail("truncated frame")
            if (keep(nFrames)) {
              val px = new Array[Int](width * height)
              var y = height - 1
              while (y >= 0) {
                val row = buf.position() + (height - 1 - y) * stride
                var x = 0
                while (x < width) {
                  px(y * width + x) = bytes(row + x * 3) & 0xff // blue
                  x += 1
                }
                y -= 1
              }
              frames += ((nFrames, px))
            }
            nFrames += 1
            buf.position(end)
          case _ =>
            buf.position(end)
        }
        if ((size & 1) == 1 && buf.position() < limit)
          buf.get() // RIFF chunks are word-aligned
      }
    }
    walk(bytes.length)
    if (width < 0) fail("no video stream format")
    if (nFrames == 0) fail("no frame chunks")
    (width, height, fps, nFrames, frames.toArray)
  }

  /** Deterministic synthetic corpus (no external data): audio records carry
    * REAL WAV payloads (encoded PCM16 of a seeded integer waveform), image
    * records REAL PNG payloads (encoded [[synthGray]] pixels), and video
    * records REAL uncompressed-AVI payloads (encoded [[synthVideoGray]]
    * frames), so all three decode paths are exercised end-to-end. */
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
        } else if (kind == "image") {
          val (w, h) = synthDims(i)
          encodePng(w, h, (x, y) => synthGray(i, x, y))
        } else {
          val (w, h) = synthVideoDims(i)
          val frames = Array.tabulate(synthVideoFrames(i)) { f =>
            Array.tabulate(w * h)(p => synthVideoGray(i, f, p % w, p / w))
          }
          encodeAvi(w, h, frames)
        }
      val (mw, mh) =
        if (kind == "image") synthDims(i)
        else if (kind == "video") synthVideoDims(i)
        else (64 + (i % 4).toInt * 32, 64)
      MediaRecord(f"m$i%06d",
        MediaMeta(kind, mw, mh, 16000, 1000 + (i % 5).toInt * 500),
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

  /** 16-bin gray histogram + integer sum/sumsq of one pixel array,
    * accumulated INTO the caller's counters (so multi-frame callers share
    * one histogram) — the single implementation behind every gray
    * featurizer here; counts/sums are exact Longs, divided once at the
    * boundary. */
  private[sources] def accumGray(gray: Array[Int],
                                 hist: Array[Long]): (Long, Long) = {
    var sum = 0L; var sumsq = 0L
    var i = 0
    while (i < gray.length) {
      val g = gray(i)
      hist(g >> 4) += 1L
      sum += g; sumsq += g.toLong * g
      i += 1
    }
    (sum, sumsq)
  }

  /** Decode one record. Audio payloads go through the REAL WAV parser
    * (features = decoded-sample histogram + moments on the token scale);
    * image payloads through the REAL ImageIO PNG decoder (gray histogram +
    * moments, integer-exact sums); video payloads through the REAL
    * uncompressed-AVI parser (gray histogram + moments over all frames'
    * pixels). */
  private def decode(r: MediaRecord): MediaFeatures =
    if (r.meta.kind == "image") {
      val (w, h, gray) = decodeImage(r.payload)
      val hist = new Array[Long](16)
      val (sum, sumsq) = accumGray(gray, hist)
      val n = w * h
      val mean = sum.toDouble / n
      MediaFeatures(r.doc_id, r.meta.kind, r.payload.length,
        hist.map(_.toDouble / n) ++
          Array(mean, sumsq.toDouble / n - mean * mean))
    } else if (r.meta.kind == "audio") {
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
      val (w, h, _, frames) = decodeAvi(r.payload)
      val hist = new Array[Long](16)
      var sum = 0L; var sumsq = 0L
      for (fr <- frames) {
        val (s, sq) = accumGray(fr, hist)
        sum += s; sumsq += sq
      }
      val n = w * h * frames.length
      val mean = sum.toDouble / n
      MediaFeatures(r.doc_id, r.meta.kind, r.payload.length,
        hist.map(_.toDouble / n) ++
          Array(mean, sumsq.toDouble / n - mean * mean))
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

  /** Image records decoded (REAL ImageIO PNG decode) and featurized:
    * (doc_id, width, height, mean_gray, var_gray, hist[16]). Sums are
    * integer-exact (Long) with a single double division at the boundary,
    * so the result is bitwise-stable and mirrored by the analytic DuckDB
    * oracle [[duckImageFeaturesSql]] — the oracle computes the SAME
    * features from the [[synthGray]] formula without decoding, which
    * green-lights the whole encode→decode→featurize path (PNG is
    * lossless; any decoder deviation breaks the hash). Narrow per-row
    * decode, no shuffle. */
  def imageFeatureTable(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.filter(_.meta.kind == "image").map { r =>
      val (w, h, gray) = decodeImage(r.payload)
      val histC = new Array[Long](16)
      val (sum, sumsq) = accumGray(gray, histC)
      val n = w * h
      val mean = sum.toDouble / n
      (r.doc_id, w, h, mean, sumsq.toDouble / n - mean * mean,
        histC.map(_.toDouble / n))
    }.toDF("doc_id", "width", "height", "mean_gray", "var_gray", "hist")
  }

  /** DuckDB mirror of [[imageFeatureTable]] over [[synth]]`(n)`: the
    * synthetic pixel formula evaluated analytically (no PNG involved) —
    * kinds cycle image/audio/video so images are `i % 3 = 0`. */
  def duckImageFeaturesSql(n: Int): String =
    s"""WITH imgs AS (
       |  SELECT i, 32 + (i % 4) * 16 AS w, 24 AS h
       |  FROM range($n) t(i) WHERE i % 3 = 0),
       |pix AS (
       |  SELECT i, w, h, unnest(range(w * h)) AS p FROM imgs),
       |g AS (
       |  SELECT i, w, h,
       |    ((p % w) * 7 + (p // w) * 13 + i * 31) % 256 AS g
       |  FROM pix),
       |agg AS (
       |  SELECT i, w, h, count(*) AS n,
       |    CAST(sum(g) AS BIGINT) AS s, CAST(sum(g * g) AS BIGINT) AS ss
       |  FROM g GROUP BY i, w, h),
       |bins AS (SELECT i, unnest(range(16)) AS b FROM imgs),
       |cnt AS (
       |  SELECT i, g // 16 AS b, count(*) AS c FROM g GROUP BY i, g // 16),
       |hist AS (
       |  SELECT bins.i,
       |    list(CAST(coalesce(cnt.c, 0) AS DOUBLE)
       |         / (SELECT a.n FROM agg a WHERE a.i = bins.i)
       |         ORDER BY bins.b) AS hist
       |  FROM bins LEFT JOIN cnt ON bins.i = cnt.i AND bins.b = cnt.b
       |  GROUP BY bins.i)
       |SELECT printf('m%06d', agg.i) AS doc_id,
       |  CAST(agg.w AS INTEGER) AS width, CAST(agg.h AS INTEGER) AS height,
       |  CAST(agg.s AS DOUBLE) / agg.n AS mean_gray,
       |  CAST(agg.ss AS DOUBLE) / agg.n
       |    - (CAST(agg.s AS DOUBLE) / agg.n) * (CAST(agg.s AS DOUBLE) / agg.n)
       |    AS var_gray,
       |  hist.hist AS hist
       |FROM agg JOIN hist ON agg.i = hist.i""".stripMargin

  /** Video records decoded (REAL uncompressed-AVI decode) with every
    * `sampleEvery`-th frame featurized — the multimodal decode /
    * frame-sample op: (doc_id, frame_id, width, height, n_frames,
    * mean_gray, var_gray). Sums are integer-exact (Long) with a single
    * double division at the boundary, mirrored by the analytic DuckDB
    * oracle [[duckVideoFramesSql]] (which computes the same features from
    * the [[synthVideoGray]] formula without decoding — uncompressed DIB is
    * lossless, so any decoder deviation breaks the hash). Narrow per-row
    * decode + explode, no shuffle; at 100 TB the payload column never
    * moves — only the tiny per-frame feature rows do. */
  def videoFrameTable(records: Dataset[MediaRecord],
                      sampleEvery: Int = 2): DataFrame = {
    require(sampleEvery > 0, s"bad sampleEvery: $sampleEvery")
    import records.sparkSession.implicits._
    records.filter(_.meta.kind == "video").flatMap { r =>
      // selective decode: skipped frames are chunk-skipped, never
      // pixel-copied (at 1-in-k sampling that is (k-1)/k of decode cost)
      val (w, h, _, nFrames, frames) =
        decodeAviFrames(r.payload, _ % sampleEvery == 0)
      frames.toSeq.map { case (f, px) =>
        val hist = new Array[Long](16) // scratch; only the moments are kept
        val (sum, sumsq) = accumGray(px, hist)
        val n = w * h
        val mean = sum.toDouble / n
        (r.doc_id, f, w, h, nFrames, mean,
          sumsq.toDouble / n - mean * mean)
      }
    }.toDF("doc_id", "frame_id", "width", "height", "n_frames",
      "mean_gray", "var_gray")
  }

  /** Box-filter 2× downsample: output pixel (X, Y) = the SUM of its 2×2
    * input block (integer-exact; the caller divides by 4 where a mean is
    * wanted — division by a power of two only shifts the FP exponent, so
    * even the double-typed mean is exact). Odd trailing row/column folds
    * into a smaller block (sum over the 1×2 / 2×1 / 1×1 remainder), with
    * the per-pixel block size returned alongside. Shared by the image and
    * video-frame paths — a frame is just an image here. */
  def downsample2(w: Int, h: Int, gray: Array[Int]): (Int, Int, Array[Long], Array[Int]) = {
    val ow = (w + 1) / 2
    val oh = (h + 1) / 2
    val sums = new Array[Long](ow * oh)
    val cnts = new Array[Int](ow * oh)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y / 2) * ow + (x / 2)
        sums(o) += gray(y * w + x)
        cnts(o) += 1
        x += 1
      }
      y += 1
    }
    (ow, oh, sums, cnts)
  }

  /** Image records decoded and box-filter 2×-downsampled — the multimodal
    * RESIZE op: (doc_id, out_w, out_h, mean_resized, var_resized,
    * pix_checksum). The synthetic corpus has even dims, so every block is
    * 2×2 and the resized pixel value is blockSum/4 — exact in binary FP;
    * mean/var come from Long sums with the division order mirrored by the
    * analytic DuckDB oracle [[duckImageResizeSql]]. `pix_checksum` =
    * Σ blockSum · (blockIndex + 1) (pure Long arithmetic) pins every
    * resized pixel to its POSITION, so a green hash proves per-pixel
    * placement, not just aggregate moments. Narrow per-row decode, no
    * shuffle — same 100 TB shape as the other decode ops. */
  def imageResizeTable(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.filter(_.meta.kind == "image").map { r =>
      val (w, h, gray) = decodeImage(r.payload)
      val (ow, oh, sums, _) = downsample2(w, h, gray)
      var s1 = 0L; var s2 = 0L; var crc = 0L
      var i = 0
      while (i < sums.length) {
        s1 += sums(i)
        s2 += sums(i) * sums(i)
        crc += sums(i) * (i + 1)
        i += 1
      }
      val n = ow * oh
      val mean = s1.toDouble / 4.0 / n
      val vr = s2.toDouble / 16.0 / n - mean * mean
      (r.doc_id, ow, oh, mean, vr, crc)
    }.toDF("doc_id", "out_w", "out_h", "mean_resized", "var_resized",
      "pix_checksum")
  }

  /** DuckDB mirror of [[imageResizeTable]] over [[synth]]`(n)`: block sums
    * of the analytic pixel formula grouped by (x/2, y/2) — no PNG, no
    * resize kernel; division order mirrors the Spark side exactly. */
  def duckImageResizeSql(n: Int): String =
    s"""WITH imgs AS (
       |  SELECT i, 32 + (i % 4) * 16 AS w, 24 AS h
       |  FROM range($n) t(i) WHERE i % 3 = 0),
       |pix AS (
       |  SELECT i, w, h, unnest(range(w * h)) AS p FROM imgs),
       |g AS (
       |  SELECT i, w, h,
       |    ((p % w) // 2) + ((p // w) // 2) * ((w + 1) // 2) AS blk,
       |    ((p % w) * 7 + (p // w) * 13 + i * 31) % 256 AS g
       |  FROM pix),
       |blocks AS (
       |  SELECT i, w, h, blk, CAST(sum(g) AS BIGINT) AS bs
       |  FROM g GROUP BY i, w, h, blk)
       |SELECT printf('m%06d', i) AS doc_id,
       |  CAST((w + 1) // 2 AS INTEGER) AS out_w,
       |  CAST((h + 1) // 2 AS INTEGER) AS out_h,
       |  CAST(sum(bs) AS DOUBLE) / 4.0 / (((w + 1) // 2) * ((h + 1) // 2))
       |    AS mean_resized,
       |  CAST(sum(bs * bs) AS DOUBLE) / 16.0
       |      / (((w + 1) // 2) * ((h + 1) // 2))
       |    - (CAST(sum(bs) AS DOUBLE) / 4.0
       |       / (((w + 1) // 2) * ((h + 1) // 2)))
       |      * (CAST(sum(bs) AS DOUBLE) / 4.0
       |         / (((w + 1) // 2) * ((h + 1) // 2))) AS var_resized,
       |  CAST(sum(bs * (blk + 1)) AS BIGINT) AS pix_checksum
       |FROM blocks GROUP BY i, w, h""".stripMargin

  /** DuckDB mirror of [[videoFrameTable]] over [[synth]]`(n)`: the
    * synthetic per-frame pixel formula evaluated analytically (no AVI
    * involved) — kinds cycle image/audio/video so videos are `i % 3 = 2`. */
  def duckVideoFramesSql(n: Int, sampleEvery: Int = 2): String =
    s"""WITH vids AS (
       |  SELECT i, 16 + (i % 3) * 8 AS w, 12 AS h, 4 + (i % 5) AS nf
       |  FROM range($n) t(i) WHERE i % 3 = 2),
       |fr AS (
       |  SELECT i, w, h, nf, unnest(range(nf)) AS f FROM vids),
       |sampled AS (
       |  SELECT * FROM fr WHERE f % $sampleEvery = 0),
       |pix AS (
       |  SELECT i, w, h, nf, f, unnest(range(w * h)) AS p FROM sampled),
       |g AS (
       |  SELECT i, w, h, nf, f,
       |    ((p % w) * 7 + (p // w) * 13 + f * 17 + i * 31) % 256 AS g
       |  FROM pix)
       |SELECT printf('m%06d', i) AS doc_id,
       |  CAST(f AS INTEGER) AS frame_id,
       |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       |  CAST(nf AS INTEGER) AS n_frames,
       |  CAST(CAST(sum(g) AS BIGINT) AS DOUBLE) / (w * h) AS mean_gray,
       |  CAST(CAST(sum(g * g) AS BIGINT) AS DOUBLE) / (w * h)
       |    - (CAST(CAST(sum(g) AS BIGINT) AS DOUBLE) / (w * h))
       |      * (CAST(CAST(sum(g) AS BIGINT) AS DOUBLE) / (w * h)) AS var_gray
       |FROM g GROUP BY i, w, h, nf, f""".stripMargin
}
