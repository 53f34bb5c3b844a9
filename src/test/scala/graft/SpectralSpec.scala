package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.features.FeatureVector
import graft.functions.spectral

/** Per-frame spectral battery + rhythm kernels: hand-checks, causality, and
  * the full feature-vector layout contract. */
class SpectralSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df(tokens: Seq[Int]) =
    Seq(("d1", tokens, tokens.length, "s"))
      .toDF("doc_id", "tokens", "n_tok", "source")

  private def bandRows(tokens: Seq[Int]): Seq[Row] =
    df(tokens).select(explode(expr("graft_band_features(tokens, 2048, 1024)")))
      .select("col.*").orderBy("frame_id", "band").collect().toSeq

  test("band features on a constant frame: flat, peakless, contrast -1") {
    val rows = bandRows(Seq.fill(2048)(100))
    assert(rows.length == spectral.NBands)
    rows.foreach { r =>
      assert(r.getAs[Double]("rms") == 100.0)
      assert(r.getAs[Double]("mean") == 100.0)
      // gmean/amean ~ 1 up to the +1e-20 shift -> dB-flatness ~ 0
      assert(math.abs(r.getAs[Double]("flatness")) < 1e-9)
      assert(r.getAs[Double]("flux") == 0.0) // frame 0 vs silence
      assert(r.getAs[Int]("complexity") == 0) // no strict local maxima
      assert(r.getAs[Double]("contrast") == -1.0) // peak == valley
    }
  }

  test("band widths cover the 64-bin grid exactly") {
    assert(spectral.BandWidths.sum == 64)
    assert(spectral.BandStarts.last + spectral.BandWidths.last == 64)
  }

  test("rolloff of a constant spectrum: ceil(0.85 * 64) bins") {
    val r = df(Seq.fill(2048)(100))
      .select(explode(expr("graft_frame_spectral(tokens, 2048, 1024)")))
      .select("col.*").collect().head
    assert(r.getAs[Int]("rolloff_bins") == 55) // 54.4 -> 55th bin crosses
    assert(r.getAs[Double]("srms") == 100.0)
    assert(r.getAs[scala.collection.Seq[Double]]("mfcc").length == spectral.NMfcc)
  }

  test("autocorrelation detects a strong period") {
    // period-64 square-ish wave, loud enough to matter
    val toks = Seq.tabulate(4096)(i => if ((i / 32) % 2 == 0) 800 else -800)
    val rows = df(toks)
      .select(explode(expr("graft_autocorr(tokens, 2048, 1024)")))
      .select("col.*").collect()
    // unnormalized-overlap autocorr of a perfect period-64 wave at lag 64
    // is (width-64)/width = 0.75 of r0 (reference normalizes by r0 only)
    assert(rows.forall(_.getAs[Double]("autocorr") > 0.6))
  }

  test("whitening: rising magnitudes stay 1, falling drop below 1") {
    // frame 0 loud, frame 1 quiet (overlap region loud-then-quiet)
    val toks = Seq.tabulate(3072)(i => if (i < 1024) 1000 else 10)
    val rows = df(toks)
      .select(explode(expr("graft_whiten(tokens, 2048, 1024)")))
      .select("col.*").collect()
    val f0 = rows.filter(_.getAs[Int]("frame_id") == 0)
    assert(f0.forall(_.getAs[Double]("white") == 1.0)) // peak state = mag
    val f1quiet = rows.filter(r =>
      r.getAs[Int]("frame_id") == 1 && r.getAs[Int]("bin") < 32)
    // bins that were loud in frame 0 and quiet now: white = 10 / decayed peak
    assert(f1quiet.forall(_.getAs[Double]("white") < 0.1))
  }

  test("canny sharpening is the summary-only exception: it reads ahead") {
    val base = Array.fill(60)(0.0)
    base(30) = 4.0
    val out1 = spark.sql(
      s"SELECT graft_canny(CAST(array(${base.mkString(",")}) AS ARRAY<DOUBLE>)) AS c")
      .collect().head.getAs[scala.collection.Seq[Double]]("c")
    base(40) = 9.0 // change a FUTURE value
    val out2 = spark.sql(
      s"SELECT graft_canny(CAST(array(${base.mkString(",")}) AS ARRAY<DOUBLE>)) AS c")
      .collect().head.getAs[scala.collection.Seq[Double]]("c")
    assert(out1(30) != out2(30)) // earlier output changed => look-ahead
  }

  test("rhythm metrics: isolated peaks found, strength in [0,1]") {
    val xs = Array.tabulate(120)(i => if (i % 40 == 5) 2.0 else 0.05)
    val r = spark.sql(
      s"SELECT graft_rhythm_metrics(CAST(array(${xs.mkString(",")}) AS ARRAY<DOUBLE>)) AS m")
      .select("m.*").collect().head
    assert(r.getAs[Int]("n_peaks") == 3)
    assert(r.getAs[Double]("strength") == math.min(1.0, 2.0 / 4.0))
    assert(r.getAs[Double]("contrast") <= 0.0)
  }

  test("harmonics: comb spectrum yields f0 and unit tristimulus mass") {
    // frame 0 is flat (whitening normalizes a first sighting to all-ones,
    // aubio semantics); frame 2 raises a comb against the decayed history,
    // so its whitened spectrum has strict local maxima
    val toks = Seq.tabulate(4096)(i =>
      if (i < 2048) 500
      else if ((i / 32) % 4 == 2) 900 else 50)
    val r = df(toks)
      .select(explode(expr("graft_harmonics(tokens, 2048, 1024)")))
      .select("col.*").collect().find(_.getAs[Int]("frame_id") == 2).get
    assert(r.getAs[Int]("f0_bin") > 0)
    assert(r.getAs[Int]("n_hpeaks") > 0)
    val mass = r.getAs[Double]("tri1") + r.getAs[Double]("tri2") +
      r.getAs[Double]("tri3")
    assert(mass >= 0.0 && mass <= 1.0 + 1e-12)
  }

  test("plateau peak walk: fixtures + equivalence with the declarative run rule") {
    import graft.functions.rhythm
    def runRule(a: Array[Double], thr: Double): Seq[Int] = {
      val n = a.length
      if (n <= 2) return Nil
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      if (a(0) > a(1) && a(0) > thr) out += 0
      var s = 0
      while (s < n) {
        var e = s
        while (e + 1 < n && a(e + 1) == a(s)) e += 1
        if (s >= 1 && e <= n - 3 && a(s - 1) < a(s) && a(e + 1) < a(s) &&
            a(s) > thr) out += (s + e) / 2
        s = e + 1
      }
      if (n >= 3 && a(n - 3) < a(n - 2) && a(n - 1) < a(n - 2) &&
          a(n - 2) > thr) out += n - 2
      if (a(n - 1) > a(n - 2) && a(n - 1) > thr) out += n - 1
      out.toSeq
    }
    // plateau collapses to ONE peak at the middle bin (strict maxima: none)
    assert(rhythm.peakWalk(Array(0.0, 1, 3, 3, 3, 1, 0), 0.5).toSeq == Seq(3))
    // boundary quirks: first, strict N-2, last
    assert(rhythm.peakWalk(Array(5.0, 1, 2, 1, 9), 0.5).toSeq == Seq(0, 2, 4))
    assert(rhythm.peakWalk(Array(0.0, 1, 5, 1), 0.5).toSeq == Seq(2))
    // trailing plateau at N-2 emits nothing (reference quirk)
    assert(rhythm.peakWalk(Array(0.0, 3, 3, 1), 0.5).toSeq == Seq())
    // randomized plateau-heavy arrays: walk == run rule
    var seed = 12345L
    def next(m: Int): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; ((seed >>> 33) % m).toInt }
    for (_ <- 0 until 300) {
      val n = 3 + next(20)
      val a = Array.fill(n)(next(4).toDouble) // small alphabet -> many plateaus
      val w = rhythm.peakWalk(a, 0.5).toSeq
      val r = runRule(a, 0.5)
      assert(w == r, s"walk=$w rule=$r on ${a.mkString(",")}")
    }
  }

  test("spectral index moments: uniform spectrum gives closed-form centroid/spread") {
    // constant tokens -> all 64 bins equal -> centroid = mean index 31.5,
    // spread = population variance of 0..63 = (64^2 - 1)/12 = 341.25
    val r = df(Seq.fill(2048)(100))
      .select(explode(expr("graft_frame_spectral(tokens, 2048, 1024)")))
      .select("col.*").collect().head
    assert(r.getAs[Double]("scentroid") == 31.5)
    assert(r.getAs[Double]("sspread") == 341.25)
    // all values equal -> t identical per bin -> skew = t^3, kurt = t^4 - 3
    val t = (100.0 - 31.5) / 341.25
    assert(math.abs(r.getAs[Double]("sskewness") - t * t * t) < 1e-15)
    assert(math.abs(r.getAs[Double]("skurtosis") - ((t * t) * (t * t) - 3.0)) < 1e-15)
  }

  test("feature vector: width, layout bases, and padding rule") {
    assert(FeatureVector.Width == 1920)
    assert(FeatureVector.Width % 48 == 0)
    assert(FeatureVector.SeriesBase == 14 * 48)
    assert(FeatureVector.PadCount ==
      FeatureVector.Width - FeatureVector.UnpaddedWidth)
    val fv = FeatureVector.fvFull(df(Seq.tabulate(3072)(i => i % 97)))
      .collect().head.getAs[scala.collection.Seq[Double]]("fv")
    assert(fv.length == FeatureVector.Width)
    // padding positions all equal the srms-series mean
    val pad = fv.slice(FeatureVector.UnpaddedWidth, FeatureVector.Width)
    assert(pad.distinct.length == 1)
  }

  test("point-in-time positions are causal: appending a frame never changes them") {
    val toks = Seq.tabulate(3072)(i => (i * 37) % 512 - 256)
    val ext = toks ++ Seq.tabulate(1024)(i => (i * 53) % 512 - 256)
    val fv1 = FeatureVector.fvFull(df(toks)).collect().head.getAs[scala.collection.Seq[Double]]("fv")
    val fv2 = FeatureVector.fvFull(df(ext)).collect().head.getAs[scala.collection.Seq[Double]]("fv")
    val nfOld = 2 // (3072-2048)/1024+1
    val offs = graft.features.PointInTime.TimeOffsets
    // signature + the six series: offsets pointing at completed frames
    for (b <- 0 until 14; (t, ti) <- offs.zipWithIndex if t < nfOld)
      assert(fv1(b * 48 + ti) == fv2(b * 48 + ti), s"sig b=$b t=$t leaked")
    for (k <- 0 until 6; (t, ti) <- offs.zipWithIndex if t < nfOld) {
      val p = FeatureVector.SeriesBase + k * 48 + ti
      assert(fv1(p) == fv2(p), s"series $k t=$t leaked")
    }
    for ((t, ti) <- offs.zipWithIndex if t < nfOld) {
      val p = FeatureVector.AmpSeriesBase + ti
      assert(fv1(p) == fv2(p), s"amp series t=$t leaked")
    }
  }
}
