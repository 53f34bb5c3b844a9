package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** The per-frame spectral battery — token-domain analogs of AFEC's
  * magnitude-spectrum features. The "magnitude spectrum" of a spectral
  * frame (2048 tokens) is its 64-bin block-RMS vector (tumbling 32-token
  * blocks, the bin analog); all downstream math then follows the reference
  * shapes exactly:
  *
  *  - band features: sub-band RMS / flatness(dB) / flux / complexity /
  *    contrast over 14 bark-analog bands
  *    (`Source/Crawler/FeatureExtraction/Source/SampleAnalyser.cpp:2067-2308`)
  *  - per-frame scalars: rolloff (85% cumulative-energy bin,
  *    `SampleAnalyser.cpp:1887-1901`, `LibXtract scalar.c:472-492`) and the
  *    band-averaged contrast (`SampleAnalyser.cpp:2253-2262`)
  *  - MFCC-analog: triangular filterbank mat-vec + log + DCT-II
  *    (`SampleAnalyser.cpp:2052-2063`, filterbank init `:183-197`,
  *    `LibXtract vector.c:350-390`)
  *  - autocorrelation: zero-crossing period estimate + normalized
  *    lag-product fold (`SampleAnalyser.cpp:2312-2398`,
  *    `Autocorrelation.cpp:62-104`)
  *
  * == Scale design ==
  * Everything here is a narrow per-row kernel over the bounded token array
  * (analysis cap `Seqs.MaxTokens`): no shuffle, no join — the whole battery
  * pipelines with the scan at any corpus size. Each kernel does one tight
  * primitive-array pass (see [[expressions]] for why HOFs are not used on
  * per-token paths).
  *
  * == Cross-engine determinism ==
  * Integer token sums are exact; float folds are ascending sequential and
  * mirrored element-for-element in the DuckDB oracle SQL. exp/ln/pow/cos
  * derived outputs (flatness, contrast, MFCC) differ by libm ulps between
  * engines and are rounded to 1e-6 at the query boundary only (engine keeps
  * full precision). Documented deviation from the reference: GeometricMean
  * uses the log-sum form rather than the reference's product-with-flush
  * (`Statistics.cpp` GeometricMean) — equal up to fp rounding, allclose-safe,
  * and expressible in both engines without stateful folds.
  */
object spectral {

  /** Block size: 2048-token frame / 32 = 64 bins — the spectrum-resolution
    * analog (reference: 2048-sample FFT → 1024 bins, `Crawler.cpp:42`). */
  val BlockSize = 32

  /** 14 bark-analog band widths over the 64 bins — same condensed-critical-
    * band shape as `sBandFrequencies[]` (`SampleAnalyser.cpp:2075-2078`):
    * narrow at the low edge, wide at the top. Sums to 64. */
  val BandWidths: Array[Int] = Array(1, 1, 1, 2, 2, 3, 3, 4, 5, 6, 7, 8, 10, 11)
  val BandStarts: Array[Int] = BandWidths.scanLeft(0)(_ + _).init
  val NBands: Int = BandWidths.length

  /** `MPeakThreshold` (`SampleAnalyser.cpp:47`). */
  val PeakThreshold = 0.25

  /** Neighbour ratio for contrast valley/peak means (`SampleAnalyser.cpp:2073`). */
  val NeighbourRatio = 0.3
  val ContrastEpsilon = 1e-30

  /** MFCC filter count (`kNumberOfCepstrumCoefficients = 14`,
    * `SampleDescriptors.h:464`) and libXtract's log clamp
    * (`xtract_macros_private.h:34`). */
  val NMfcc = 14
  val LogLimit = 2e-42

  /** Rolloff percentile (`SampleAnalyser.cpp:1891`: 85%). */
  val RolloffPct = 0.85

  /** Autocorrelation seek params — token-grid analogs of 0.8 ms / 12 ms at
    * 44.1 kHz (`SampleAnalyser.cpp:2315-2325`). */
  val AcMinPeriod = 32
  val AcSeekWidth = 256

  // ------------------------------------------------------------------
  // shared helpers
  // ------------------------------------------------------------------

  /** Tumbling block-RMS grid over the whole doc (the framing contract of
    * [[graft.core.Framing]] at F = H = BlockSize: trailing remainder < B is
    * dropped unless the doc is shorter than one block). */
  private[functions] def blockRms(arr: Array[Int], b: Int): Array[Double] = {
    val n = arr.length
    val nb = if (n >= b) (n - b) / b + 1 else 1
    val out = new Array[Double](nb)
    var g = 0
    while (g < nb) {
      val s = g * b
      val e = math.min(s + b, n)
      var q = 0L
      var i = s
      while (i < e) { val x = arr(i); q += x.toLong * x; i += 1 }
      out(g) = math.sqrt(q.toDouble / (e - s))
      g += 1
    }
    out
  }

  private[functions] def nFrames(n: Int, f: Int, h: Int): Int =
    if (n >= f) (n - f) / h + 1 else 1

  /** LinToDb (`AudioMath.inl:55-70`): exact 0 dB at 1.0, −200 dB floor. */
  private def linToDb(v: Double): Double =
    if (v == 1.0) 0.0
    else if (v > 1e-12) math.log(v) * (20.0 / math.log(10.0))
    else -200.0

  /** SFlatnessDb (`SampleAnalyser.cpp:129-133`): dB-scaled flatness limited
    * to −60 dB, mapped to [0, 1]. Log-sum geometric mean (see class doc). */
  private[functions] def flatnessDb(m: Array[Double], s: Int, n: Int): Double = {
    var sum = 0.0; var sumLog = 0.0
    var i = 0
    while (i < n) {
      val x = m(s + i)
      sum += x
      sumLog += math.log(math.abs(x) + 1e-20)
      i += 1
    }
    val amean = sum / n
    val ratio = if (amean == 0.0) 0.0 else math.exp(sumLog / n) / amean
    math.min(linToDb(ratio) / -60.0, 1.0)
  }

  /** Pearson correlation, AFEC op order (`Statistics.cpp:604-638`), with a
    * zero-padded second series (frame 0 correlates against silence). */
  private[functions] def fluxCorr(m: Array[Double], lm: Array[Double],
                       s: Int, n: Int): Double = {
    if (n == 0) return 0.0
    var ss1 = 0.0; var ss2 = 0.0; var ss11 = 0.0; var ss12 = 0.0; var ss22 = 0.0
    var i = 0
    while (i < n) {
      val x = m(s + i)
      val y = if (lm != null && s + i < lm.length) lm(s + i) else 0.0
      ss12 += x * y; ss1 += x; ss11 += x * x; ss2 += y; ss22 += y * y
      i += 1
    }
    val m1 = ss1 / n; val m2 = ss2 / n
    val denom2 = (ss11 - m1 * m1 * n) * (ss22 - m2 * m2 * n)
    val num = ss12 - m1 * m2 * n
    if (math.abs(denom2) > 1e-12) num / math.sqrt(denom2) else 0.0
  }

  // ------------------------------------------------------------------
  // band features
  // ------------------------------------------------------------------

  val BandStructType: StructType = StructType(Seq(
    StructField("frame_id", IntegerType, nullable = false),
    StructField("band", IntegerType, nullable = false),
    StructField("n_bins", IntegerType, nullable = false),
    StructField("mean", DoubleType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("flatness", DoubleType, nullable = false),
    StructField("flux", DoubleType, nullable = false),
    StructField("complexity", IntegerType, nullable = false),
    StructField("contrast", DoubleType, nullable = false)))

  /** graft_band_features(tokens, frameSize, hop) →
    * ARRAY<STRUCT<frame_id,band,n_bins,rms,flatness,flux,complexity,contrast>>
    * (`SampleAnalyser.cpp:2067-2308`). Bands past the frame's bin count
    * (short docs) emit all-zero rows with n_bins = 0. */
  case class BandFeatures(tokens: Expression, frameSizeE: Expression,
      hopE: Expression) extends Expression with CodegenFallback {
    private val frameSize = expressions.litIntPub(frameSizeE)
    private val hop = expressions.litIntPub(hopE)
    override def children: Seq[Expression] = Seq(tokens, frameSizeE, hopE)
    override def dataType: DataType = ArrayType(BandStructType, containsNull = false)
    override def nullable: Boolean = tokens.nullable
    override def eval(input: InternalRow): Any = {
      val tAny = tokens.eval(input)
      if (tAny == null) return null
      val arr = tAny.asInstanceOf[ArrayData].toIntArray()
      val blocks = blockRms(arr, BlockSize)
      new GenericArrayData(bandRows(blocks,
        nFrames(arr.length, frameSize, hop), frameSize / BlockSize,
        hop / BlockSize))
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
      copy(tokens = c(0), frameSizeE = c(1), hopE = c(2))
  }

  /** Shared band-battery core over a doc's block grid (used by both
    * [[BandFeatures]] and [[FrameSpectral]]). One row struct per
    * (frame, band), frame-major. */
  private[graft] def bandRows(blocks: Array[Double], nf: Int, fb: Int,
                       hb: Int): Array[Any] = {
    val out = new Array[Any](nf * NBands)
    var f = 0
    while (f < nf) {
      val s0 = f * hb
      val e0 = math.min(s0 + fb, blocks.length)
      val len = e0 - s0
      // frame-local spectra (current + previous hop's)
      val m = java.util.Arrays.copyOfRange(blocks, s0, e0)
      val lm: Array[Double] =
        if (f == 0) null
        else java.util.Arrays.copyOfRange(blocks,
          (f - 1) * hb, math.min((f - 1) * hb + fb, blocks.length))
      var b = 0
      var cb = 0 // current bin walk (reference CurrentBin)
      while (b < NBands) {
          val nBins = math.min(BandWidths(b), len - cb)
          if (nBins <= 0) {
            out(f * NBands + b) = new GenericInternalRow(Array[Any](
              f, b, 0, 0.0, 0.0, 0.0, 0.0, 0, 0.0))
          } else {
            // mean + rms (ascending folds)
            var sum = 0.0; var sq = 0.0
            var i = 0
            while (i < nBins) { val x = m(cb + i); sum += x; sq += x * x; i += 1 }
            val bandMean = sum / nBins
            val rms = math.sqrt(sq / nBins)
            val flat = flatnessDb(m, cb, nBins)
            val flux = fluxCorr(m, lm, cb, nBins)
            // complexity: local peaks above 0.25 * band max, neighbors from
            // the UNSORTED full-frame spectrum (cross band edges allowed)
            var bmax = 0.0
            i = 0
            while (i < nBins) { if (m(cb + i) > bmax) bmax = m(cb + i); i += 1 }
            val thr = bmax * PeakThreshold
            var cplx = 0
            if (thr > 0.0) {
              i = 0
              while (i < nBins) {
                val j = cb + i
                if (m(j) > thr && j > 0 && j < len - 1 &&
                    m(j) > m(j - 1) && m(j) > m(j + 1)) cplx += 1
                i += 1
              }
            }
            // contrast: sorted-neighborhood valley/peak means
            val sorted = java.util.Arrays.copyOfRange(m, cb, cb + nBins)
            java.util.Arrays.sort(sorted)
            val nbr = math.max(1, (NeighbourRatio * nBins).toInt)
            var vsum = 0.0
            i = 0
            while (i < nbr && i < nBins) { vsum += sorted(i); i += 1 }
            val valley = vsum / nbr + ContrastEpsilon
            var psum = 0.0
            i = nBins
            while (i > nBins - nbr) { psum += sorted(i - 1); i -= 1 }
            val peak = psum / nbr + ContrastEpsilon
            val contrast = -1.0 * math.pow(peak / valley,
              1.0 / math.log(bandMean + ContrastEpsilon))
            out(f * NBands + b) = new GenericInternalRow(Array[Any](
              f, b, nBins, bandMean, rms, flat, flux, cplx, contrast))
          }
        cb += math.max(nBins, 0)
        b += 1
      }
      f += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // per-frame scalars: rolloff + contrast average + MFCC
  // ------------------------------------------------------------------

  /** Equal-gain triangular filterbank over the 64-bin grid — the
    * `xtract_init_mfcc(..., XTRACT_EQUAL_GAIN, ...)` analog
    * (`LibXtract init.c:312-318`): peak height 1, boundaries log-spaced
    * (mel-analog) at `exp(k/15 · ln 65) − 1`, k = 0..15. */
  lazy val MelWeights: Array[Array[Double]] = {
    val nb = 64
    val bounds = (0 to NMfcc + 1).map(k =>
      math.exp(k.toDouble / (NMfcc + 1) * math.log(nb + 1.0)) - 1.0).toArray
    Array.tabulate(NMfcc) { k0 =>
      val (l, c, r) = (bounds(k0), bounds(k0 + 1), bounds(k0 + 2))
      Array.tabulate(nb) { j =>
        val x = j.toDouble
        val w =
          if (x <= l || x >= r) 0.0
          else if (x <= c) (x - l) / (c - l)
          else (r - x) / (r - c)
        w
      }
    }
  }

  /** DCT-II basis (`LibXtract vector.c:373-390`):
    * `cos(π · n/N · (m + 0.5))`, N = [[NMfcc]]. */
  lazy val DctBasis: Array[Array[Double]] = Array.tabulate(NMfcc) { n =>
    Array.tabulate(NMfcc) { m =>
      math.cos(math.Pi * (n.toDouble / NMfcc) * (m + 0.5))
    }
  }

  val FrameSpectralStructType: StructType = StructType(Seq(
    StructField("frame_id", IntegerType, nullable = false),
    StructField("rolloff_bins", IntegerType, nullable = false),
    StructField("contrast_avg", DoubleType, nullable = false),
    StructField("srms", DoubleType, nullable = false),
    StructField("sflatness", DoubleType, nullable = false),
    StructField("sflux", DoubleType, nullable = false),
    StructField("scomplexity", IntegerType, nullable = false),
    StructField("scentroid", DoubleType, nullable = false),
    StructField("sspread", DoubleType, nullable = false),
    StructField("sskewness", DoubleType, nullable = false),
    StructField("skurtosis", DoubleType, nullable = false),
    StructField("mfcc", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** Per-frame index moments over the frame's bin spectrum — centroid /
    * spread / skewness / kurtosis (`SampleAnalyser.cpp:1822-1883`,
    * `Statistics.cpp:459-554`): index-weighted centroid `Σ j·x / Σ x`,
    * spread `Σ (j−c)²·x / Σ x`, then value-domain skew `Σ((x−c)/s)³ / N`
    * and kurtosis `Σ((x−c)/s)⁴ / N − 3` gated on |spread| > MEpsilon.
    * Ascending folds (reference loops descend — documented ulp-level
    * deviation, same as the 13-stat block); pure +·/ — bitwise
    * cross-engine, no rounding. */
  private[functions] def indexMoments(m: Array[Double], s: Int,
                                      n: Int): (Double, Double, Double, Double) = {
    var ssum = 0.0
    var i = 0
    while (i < n) { ssum += m(s + i); i += 1 }
    var centroid = 0.0
    var spread = 0.0
    if (ssum != 0.0) {
      var acc = 0.0
      i = 0
      while (i < n) { acc += i.toDouble * m(s + i); i += 1 }
      centroid = acc / ssum
      acc = 0.0
      i = 0
      while (i < n) { val t = i - centroid; acc += t * t * m(s + i); i += 1 }
      spread = acc / ssum
    }
    var skew = 0.0
    var kurt = 0.0
    if (n > 0 && math.abs(spread) > Stats.Eps) {
      var a3 = 0.0
      var a4 = 0.0
      i = 0
      while (i < n) {
        val t = (m(s + i) - centroid) / spread
        a3 += t * t * t
        val tt = t * t
        a4 += tt * tt
        i += 1
      }
      skew = a3 / n
      kurt = a4 / n - 3.0
    }
    (centroid, spread, skew, kurt)
  }

  /** graft_frame_spectral(tokens, frameSize, hop) →
    * ARRAY<STRUCT<frame_id, rolloff_bins, contrast_avg, mfcc>>. */
  case class FrameSpectral(tokens: Expression, frameSizeE: Expression,
      hopE: Expression) extends Expression with CodegenFallback {
    private val frameSize = expressions.litIntPub(frameSizeE)
    private val hop = expressions.litIntPub(hopE)
    override def children: Seq[Expression] = Seq(tokens, frameSizeE, hopE)
    override def dataType: DataType =
      ArrayType(FrameSpectralStructType, containsNull = false)
    override def nullable: Boolean = tokens.nullable
    override def eval(input: InternalRow): Any = {
      val tAny = tokens.eval(input)
      if (tAny == null) return null
      val arr = tAny.asInstanceOf[ArrayData].toIntArray()
      val blocks = blockRms(arr, BlockSize)
      val hb = hop / BlockSize
      val fb = frameSize / BlockSize
      val nf = nFrames(arr.length, frameSize, hop)
      // band rows feed contrast_avg (shared core, computed once per doc)
      val bands = bandRows(blocks, nf, fb, hb)
      val out = new Array[Any](nf)
      var f = 0
      while (f < nf) {
        val s0 = f * hb
        val e0 = math.min(s0 + fb, blocks.length)
        val len = e0 - s0
        // rolloff (LibXtract scalar.c:472-492): first n with
        // cumsum(m) >= 0.85 * sum(m)
        var pivot = 0.0
        var i = 0
        while (i < len) { pivot += blocks(s0 + i); i += 1 }
        pivot *= RolloffPct
        var temp = 0.0
        var nro = 0
        while (temp < pivot) { temp += blocks(s0 + nro); nro += 1 }
        // contrast avg + complexity sum over the 14 bands, band order
        // (contrast at struct idx 8, complexity at 7 — see BandStructType)
        var csum = 0.0
        var cplxSum = 0
        var b = 0
        while (b < NBands) {
          val row = bands(f * NBands + b).asInstanceOf[GenericInternalRow]
          csum += row.getDouble(8)
          cplxSum += row.getInt(7)
          b += 1
        }
        // whole-spectrum rms / flatness(dB) / flux over all bins of the frame
        var sq = 0.0
        i = 0
        while (i < len) { val x = blocks(s0 + i); sq += x * x; i += 1 }
        val srms = math.sqrt(sq / len)
        val sflat = flatnessDb(blocks, s0, len)
        val lm: Array[Double] =
          if (f == 0) null
          else java.util.Arrays.copyOfRange(blocks,
            (f - 1) * hb, math.min((f - 1) * hb + fb, blocks.length))
        val m = java.util.Arrays.copyOfRange(blocks, s0, e0)
        val sflux = fluxCorr(m, lm, 0, len)
        // MFCC: filterbank mat-vec + clamped log + DCT-II
        val loge = new Array[Double](NMfcc)
        var k = 0
        while (k < NMfcc) {
          val w = MelWeights(k)
          var e = 0.0
          i = 0
          while (i < len && i < w.length) { e += blocks(s0 + i) * w(i); i += 1 }
          loge(k) = math.log(if (e < LogLimit) LogLimit else e)
          k += 1
        }
        val mfcc = new Array[Double](NMfcc)
        var n = 0
        while (n < NMfcc) {
          val basis = DctBasis(n)
          var acc = 0.0
          var mm = 0
          while (mm < NMfcc) { acc += loge(mm) * basis(mm); mm += 1 }
          mfcc(n) = acc
          n += 1
        }
        val (scen, sspr, sskw, skur) = indexMoments(blocks, s0, len)
        out(f) = new GenericInternalRow(Array[Any](
          f, nro, csum / NBands, srms, sflat, sflux, cplxSum,
          scen, sspr, sskw, skur,
          UnsafeArrayData.fromPrimitiveArray(mfcc)))
        f += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
      copy(tokens = c(0), frameSizeE = c(1), hopE = c(2))
  }

  // ------------------------------------------------------------------
  // autocorrelation
  // ------------------------------------------------------------------

  val AutoCorrStructType: StructType = StructType(Seq(
    StructField("frame_id", IntegerType, nullable = false),
    StructField("period", IntegerType, nullable = false),
    StructField("autocorr", DoubleType, nullable = false)))

  /** graft_autocorr(tokens, frameSize, hop) →
    * ARRAY<STRUCT<frame_id, period, autocorr>>
    * (`SampleAnalyser.cpp:2312-2398`, `Autocorrelation.cpp:62-104`):
    * rising-edge period estimate, then normalized integer lag-product fold,
    * best coefficient past period/2. Lag products are exact int64 (token
    * magnitudes ≤ 2048 ⇒ no overflow below 2^53), so the output double is
    * one exact division — bitwise across engines, no rounding needed. */
  case class AutoCorr(tokens: Expression, frameSizeE: Expression,
      hopE: Expression) extends Expression with CodegenFallback {
    private val frameSize = expressions.litIntPub(frameSizeE)
    private val hop = expressions.litIntPub(hopE)
    override def children: Seq[Expression] = Seq(tokens, frameSizeE, hopE)
    override def dataType: DataType =
      ArrayType(AutoCorrStructType, containsNull = false)
    override def nullable: Boolean = tokens.nullable
    override def eval(input: InternalRow): Any = {
      val tAny = tokens.eval(input)
      if (tAny == null) return null
      val arr = tAny.asInstanceOf[ArrayData].toIntArray()
      val n = arr.length
      val nf = nFrames(n, frameSize, hop)
      val maxSeek = frameSize / 2
      val out = new Array[Any](nf)
      var f = 0
      while (f < nf) {
        val fs = f * hop
        var remaining = n - fs
        // first rising edge (zero-crossing analog, SampleAnalyser.cpp:2330-2341)
        var start = fs
        var i = 0
        var found = false
        val lim1 = math.min(remaining, maxSeek) - 1
        while (!found && i < lim1) {
          if (arr(fs + i + 1) > arr(fs + i)) {
            start = fs + i; remaining -= i; found = true
          }
          i += 1
        }
        // next rising edge after the minimum period offset (:2343-2356)
        val offset = math.min(remaining, AcMinPeriod)
        var end = start + offset
        i = 0
        found = false
        val lim2 = math.min(remaining - offset, maxSeek) - 1
        while (!found && i < lim2) {
          if (arr(start + offset + i + 1) > arr(start + offset + i)) {
            end = start + offset + i; found = true
          }
          i += 1
        }
        val period = end - start
        if (remaining == 0 || period >= remaining) {
          out(f) = new GenericInternalRow(Array[Any](f, period, 0.0))
        } else {
          val width = math.min(remaining, AcSeekWidth)
          // r[0] and best past period/2, exact int64 lag products
          var r0 = 0L
          var j = 0
          while (j < width) {
            r0 += arr(start + j).toLong * arr(start + j); j += 1
          }
          var best = 0.0
          var lag = period / 2
          while (lag < width) {
            var r = 0L
            j = 0
            val jEnd = width - lag
            while (j < jEnd) {
              r += arr(start + j).toLong * arr(start + j + lag); j += 1
            }
            val rn = if (r0 != 0L) r.toDouble / r0.toDouble else r.toDouble
            if (rn > best) best = rn
            lag += 1
          }
          out(f) = new GenericInternalRow(Array[Any](f, period, best))
        }
        f += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
      copy(tokens = c(0), frameSizeE = c(1), hopE = c(2))
  }

  /** Register the spectral kernels (idempotent; called from
    * [[expressions.register]]). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_band_features",
      es => BandFeatures(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_frame_spectral",
      es => FrameSpectral(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_autocorr",
      es => AutoCorr(es(0), es(1), es(2)), "built-in")
  }
}
