package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Framing
import graft.functions.spectral
import graft.sources.Seqs

/** Oracle-checked queries for the per-frame spectral battery
  * ([[graft.functions.spectral]]): band features, rolloff + contrast
  * average, MFCC-analog, autocorrelation.
  *
  * Boundary conventions (see spectral's class doc): exp/ln/pow/cos-derived
  * columns rounded to 1e-6 at the query boundary; every float column
  * canonicalized (`x = 0.0 → 0.0`) because the two engines may disagree on
  * the sign of zero; everything else is bitwise via ascending sequential
  * folds mirrored element-for-element in the DuckDB SQL.
  */
object SpectralQueries {

  private def seqs(s: SparkSession, dir: String): DataFrame =
    Seqs.fromDocuments(s, dir)

  private val F = Seqs.FrameSize
  private val H = Seqs.Hop
  private val B = spectral.BlockSize

  private val duckSeqs = s"seqs AS (${Seqs.duckSql})"
  private[queries] val duckBlocks =
    s"$duckSeqs,\n${Framing.duckFrameCtes(B, B, Seqs.SilenceThreshold, "b")}"

  /** Same CTE chain with a doc predicate applied at the source — for
    * oracles whose DuckDB mirror is super-linear in corpus size (the gate
    * must stay minutes, not hours; the engine side subsamples identically
    * at the query boundary only). */
  private[queries] def duckBlocksWhere(pred: String) =
    s"""seqs AS (SELECT * FROM (${Seqs.duckSql}) WHERE $pred),
       |${Framing.duckFrameCtes(B, B, Seqs.SilenceThreshold, "b")}""".stripMargin

  /** Shared CTEs: per-(doc, spectral frame) block spectrum `m` + previous
    * hop's spectrum `lm` (NULL for frame 0 = silence). */
  private[queries] val duckSpectrum: String = {
    val hb = H / B
    val fb = F / B
    s"""sf AS (
       |  SELECT doc_id, n_tok,
       |    unnest(range(CASE WHEN n_tok >= $F THEN (n_tok - $F) // $H + 1
       |                      ELSE 1 END)) AS f
       |  FROM seqs),
       |mspec AS (
       |  SELECT s.doc_id, CAST(s.f AS INTEGER) AS f,
       |         list(b.rms ORDER BY b.frame_id) AS m
       |  FROM sf s JOIN bframes b ON b.doc_id = s.doc_id
       |    AND b.frame_id >= s.f * $hb AND b.frame_id < s.f * $hb + $fb
       |  GROUP BY s.doc_id, s.f),
       |mlag AS (
       |  SELECT *, lag(m) OVER (PARTITION BY doc_id ORDER BY f) AS lm
       |  FROM mspec)""".stripMargin
  }

  /** Ascending sequential sum fold (bitwise mirror of the kernel loops). */
  private def fold(xs: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $xs), (a, x) -> a + x)"

  private val duckBandValues: String =
    spectral.BandStarts.zip(spectral.BandWidths).zipWithIndex
      .map { case ((cb, w), b) => s"($b, $cb, $w)" }.mkString(", ")

  /** Band-feature CTEs over [[duckSpectrum]] — yields `bfeat(doc_id, f,
    * band, n_bins, rms, flatness, flux, complexity, contrast)`. */
  private[queries] val duckBandFeat: String = {
    val eps = spectral.ContrastEpsilon
    s"""bands(band, cb, w) AS (VALUES $duckBandValues),
       |bx AS (
       |  SELECT doc_id, f, band, cb, m, lm, len(m) AS L,
       |         least(w, len(m) - cb) AS nb
       |  FROM mlag, bands),
       |bslice AS (
       |  SELECT *,
       |    CASE WHEN nb > 0 THEN m[cb + 1 : cb + nb]
       |         ELSE CAST([] AS DOUBLE[]) END AS ms,
       |    CASE WHEN nb > 0 THEN
       |      list_transform(range(CAST(nb AS BIGINT)),
       |        i -> coalesce(lm[cb + i + 1], CAST(0.0 AS DOUBLE)))
       |    ELSE CAST([] AS DOUBLE[]) END AS ls
       |  FROM bx),
       |bsum AS (
       |  SELECT *,
       |    ${fold("ms")} AS s1,
       |    ${fold("list_transform(ms, x -> x * x)")} AS sq,
       |    ${fold("list_transform(ms, x -> ln(abs(x) + 1e-20))")} AS slog,
       |    ${fold("ls")} AS t1,
       |    ${fold("list_transform(ls, x -> x * x)")} AS t2,
       |    ${fold("list_transform(ms, (x, i) -> x * ls[i])")} AS s12,
       |    list_max(ms) AS bmax
       |  FROM bslice),
       |bmean AS (
       |  SELECT *, s1 / nb AS bandmean FROM bsum WHERE nb > 0),
       |bflat AS (
       |  SELECT *,
       |    CASE WHEN bandmean = 0.0 THEN CAST(0.0 AS DOUBLE)
       |         ELSE exp(slog / nb) / bandmean END AS ratio
       |  FROM bmean),
       |bflat2 AS (
       |  SELECT *,
       |    least(CASE WHEN ratio = 1.0 THEN CAST(0.0 AS DOUBLE)
       |               WHEN ratio > 1e-12
       |                 THEN ln(ratio) * (20.0 / ln(CAST(10.0 AS DOUBLE)))
       |               ELSE CAST(-200.0 AS DOUBLE) END / -60.0,
       |          CAST(1.0 AS DOUBLE)) AS flatness
       |  FROM bflat),
       |bflux AS (
       |  SELECT *,
       |    CASE WHEN abs((sq - (s1/nb) * (s1/nb) * nb)
       |                * (t2 - (t1/nb) * (t1/nb) * nb)) > 1e-12
       |         THEN (s12 - (s1/nb) * (t1/nb) * nb)
       |              / sqrt((sq - (s1/nb) * (s1/nb) * nb)
       |                   * (t2 - (t1/nb) * (t1/nb) * nb))
       |         ELSE CAST(0.0 AS DOUBLE) END AS flux
       |  FROM bflat2),
       |bcplx AS (
       |  SELECT *,
       |    CASE WHEN bmax * CAST(${spectral.PeakThreshold} AS DOUBLE) > 0.0 THEN
       |      CAST(len(list_filter(range(CAST(nb AS BIGINT)), i ->
       |        m[cb + i + 1] > bmax * CAST(${spectral.PeakThreshold} AS DOUBLE)
       |        AND cb + i > 0 AND cb + i < L - 1
       |        AND m[cb + i + 1] > m[cb + i]
       |        AND m[cb + i + 1] > m[cb + i + 2])) AS INTEGER)
       |    ELSE 0 END AS complexity
       |  FROM bflux),
       |bcon AS (
       |  SELECT *,
       |    greatest(1, CAST(trunc(CAST(0.3 AS DOUBLE) * nb) AS INTEGER)) AS nbr,
       |    list_sort(ms) AS sorted
       |  FROM bcplx),
       |bcon2 AS (
       |  SELECT *,
       |    ${fold("sorted[1 : nbr]")} / nbr + $eps AS valley,
       |    ${fold("list_reverse(sorted)[1 : nbr]")} / nbr + $eps AS peak
       |  FROM bcon),
       |bfeat0 AS (
       |  SELECT doc_id, f, band, nb AS n_bins, bandmean AS mean,
       |    sqrt(sq / nb) AS rms, flatness, flux, complexity,
       |    -1.0 * pow(peak / valley,
       |               1.0 / ln(bandmean + $eps)) AS contrast
       |  FROM bcon2),
       |bfeat AS (
       |  SELECT doc_id, f, band, n_bins, mean, rms, flatness, flux,
       |         complexity, contrast
       |  FROM bfeat0
       |  UNION ALL
       |  SELECT doc_id, f, band, 0, CAST(0.0 AS DOUBLE), 0.0, 0.0, 0.0, 0, 0.0
       |  FROM bx WHERE nb <= 0)""".stripMargin
  }

  /** Canonicalize the sign of zero (both dialects hash bit patterns). */
  private def cz(e: String): String = s"CASE WHEN $e = 0.0 THEN 0.0 ELSE $e END"

  /** Index-moment CTE stages (mirror of [[spectral.indexMoments]]): from a
    * CTE `src` carrying (…, m DOUBLE[], L, s1 = ascending Σm), yields
    * `${p}3` with scentroid/sspread/sskewness/skurtosis appended. Exact
    * +·/ folds, element order ascending — bitwise vs the kernel. */
  private[queries] def duckMomentStages(src: String, p: String): String = {
    val eps = graft.functions.Stats.Eps
    val t = "((x - scentroid) / sspread)"
    s"""${p}1 AS (
       |  SELECT *, CASE WHEN s1 = 0.0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE ${fold("list_transform(m, (x, i) -> (i - 1) * x)")} / s1
       |  END AS scentroid FROM $src),
       |${p}2 AS (
       |  SELECT *, CASE WHEN s1 = 0.0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE ${fold(
      "list_transform(m, (x, i) -> ((i - 1) - scentroid) * ((i - 1) - scentroid) * x)")} / s1
       |  END AS sspread FROM ${p}1),
       |${p}3 AS (
       |  SELECT *,
       |    CASE WHEN L > 0 AND abs(sspread) > $eps
       |      THEN ${fold(s"list_transform(m, x -> $t * $t * $t)")} / L
       |      ELSE CAST(0.0 AS DOUBLE) END AS sskewness,
       |    CASE WHEN L > 0 AND abs(sspread) > $eps
       |      THEN ${fold(s"list_transform(m, x -> ($t * $t) * ($t * $t))")} / L - 3.0
       |      ELSE CAST(0.0 AS DOUBLE) END AS skurtosis
       |  FROM ${p}2)""".stripMargin
  }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // sub-band battery (SampleAnalyser.cpp:2067-2308)
    "band_features" -> ((s, dir) =>
      seqs(s, dir)
        .select(col("doc_id"),
          explode(expr(s"graft_band_features(tokens, $F, $H)")).as("bf"))
        .select(col("doc_id"), col("bf.frame_id").as("frame_id"),
          col("bf.band").as("band"), col("bf.n_bins").as("n_bins"),
          expr(s"IF(bf.rms = 0.0, 0.0, bf.rms)").as("rms"),
          expr("IF(round(bf.flatness, 6) = 0.0, 0.0, round(bf.flatness, 6))")
            .as("flatness"),
          expr("IF(bf.flux = 0.0, 0.0, bf.flux)").as("flux"),
          col("bf.complexity").as("complexity"),
          expr("IF(round(bf.contrast, 6) = 0.0, 0.0, round(bf.contrast, 6))")
            .as("contrast"))),

    // bin-range predicate: energy of spectrum slice [8, 24) per frame with
    // an activity gate (the `slice` of SampleDescriptors spectrum access;
    // integer energies -> bitwise)
    "bin_slice" -> ((s, dir) =>
      Framing.withFrames(seqs(s, dir), B, B)
        .withColumn("nsf", expr(
          s"CASE WHEN n_tok >= $F THEN ((n_tok - $F) div $H) + 1 ELSE 1 END"))
        .select(col("doc_id"), col("frames"), col("nsf"),
          explode(expr("sequence(0, CAST(nsf - 1 AS INT))")).as("f"))
        .withColumn("slice_e", expr(
          """aggregate(filter(frames, fr ->
            |  fr.frame_id >= f * 32 + 8 AND fr.frame_id < f * 32 + 24),
            |  CAST(0 AS BIGINT), (a, fr) -> a + fr.fsumsq)""".stripMargin))
        .withColumn("total_e", expr(
          """aggregate(filter(frames, fr ->
            |  fr.frame_id >= f * 32 AND fr.frame_id < f * 32 + 64),
            |  CAST(0 AS BIGINT), (a, fr) -> a + fr.fsumsq)""".stripMargin))
        .select(col("doc_id"), col("f").as("frame_id"),
          col("slice_e"), col("total_e"),
          expr("total_e > 0 AND CAST(slice_e AS DOUBLE) / total_e > 0.25")
            .as("band_active"))),

    // rolloff + band-averaged contrast (SampleAnalyser.cpp:1887-1901, 2253-2262)
    "spectral_frame" -> ((s, dir) =>
      seqs(s, dir)
        .select(col("doc_id"),
          explode(expr(s"graft_frame_spectral(tokens, $F, $H)")).as("fs"))
        .select(col("doc_id"), col("fs.frame_id").as("frame_id"),
          col("fs.rolloff_bins").as("rolloff_bins"),
          expr("IF(round(fs.contrast_avg, 6) = 0.0, 0.0, round(fs.contrast_avg, 6))")
            .as("contrast_avg"))),

    // per-frame index moments over the bin spectrum
    // (SampleAnalyser.cpp:1822-1883, Statistics.cpp:459-554) — exact folds,
    // bitwise, zero-canonicalized only
    "spectral_moments" -> ((s, dir) =>
      seqs(s, dir)
        .select(col("doc_id"),
          explode(expr(s"graft_frame_spectral(tokens, $F, $H)")).as("fs"))
        .select(col("doc_id"), col("fs.frame_id").as("frame_id"),
          expr("IF(fs.scentroid = 0.0, 0.0, fs.scentroid)").as("scentroid"),
          expr("IF(fs.sspread = 0.0, 0.0, fs.sspread)").as("sspread"),
          expr("IF(fs.sskewness = 0.0, 0.0, fs.sskewness)").as("sskewness"),
          expr("IF(fs.skurtosis = 0.0, 0.0, fs.skurtosis)").as("skurtosis"))),

    // MFCC-analog coefficients (SampleAnalyser.cpp:2052-2063)
    "mfcc" -> ((s, dir) =>
      seqs(s, dir)
        .select(col("doc_id"),
          explode(expr(s"graft_frame_spectral(tokens, $F, $H)")).as("fs"))
        .select(col("doc_id"), col("fs.frame_id").as("frame_id"),
          posexplode(col("fs.mfcc")).as(Seq("coef", "v")))
        .select(col("doc_id"), col("frame_id"), col("coef"),
          expr("IF(round(v, 6) = 0.0, 0.0, round(v, 6))").as("mfcc_val"))),

    // autocorrelation (SampleAnalyser.cpp:2312-2398) — doc subset keeps the
    // O(width^2) DuckDB oracle tractable; the kernel itself runs on all docs
    // in features_ll (integer lag products: bitwise, no rounding)
    "autocorr" -> ((s, dir) =>
      seqs(s, dir)
        .filter(expr("CAST(substring(doc_id, 2) AS INT) % 20 = 0"))
        .select(col("doc_id"),
          explode(expr(s"graft_autocorr(tokens, $F, $H)")).as("ac"))
        .select(col("doc_id"), col("ac.frame_id").as("frame_id"),
          col("ac.period").as("period"),
          expr("IF(ac.autocorr = 0.0, 0.0, ac.autocorr)").as("autocorr")))
  )

  // ------------------------------------------------------------------
  // oracles
  // ------------------------------------------------------------------

  def oracles: Map[String, String] = Map(

    "band_features" ->
      s"""WITH $duckBlocks,
         |$duckSpectrum,
         |$duckBandFeat
         |SELECT doc_id, f AS frame_id, band, n_bins,
         |  ${cz("rms")} AS rms,
         |  ${cz("round(flatness, 6)")} AS flatness,
         |  ${cz("flux")} AS flux,
         |  complexity,
         |  ${cz("round(contrast, 6)")} AS contrast
         |FROM bfeat""".stripMargin,

    "bin_slice" ->
      s"""WITH $duckBlocks,
         |nsf AS (
         |  SELECT doc_id,
         |    unnest(range(CASE WHEN n_tok >= $F THEN (n_tok - $F) // $H + 1
         |                      ELSE 1 END)) AS f
         |  FROM seqs),
         |es AS (
         |  SELECT n.doc_id, CAST(n.f AS INTEGER) AS frame_id,
         |    CAST(sum(CASE WHEN b.frame_id >= n.f * 32 + 8
         |                   AND b.frame_id < n.f * 32 + 24
         |                  THEN b.fsumsq ELSE 0 END) AS BIGINT) AS slice_e,
         |    CAST(sum(CASE WHEN b.frame_id >= n.f * 32
         |                   AND b.frame_id < n.f * 32 + 64
         |                  THEN b.fsumsq ELSE 0 END) AS BIGINT) AS total_e
         |  FROM nsf n JOIN bframes b ON b.doc_id = n.doc_id
         |    AND b.frame_id >= n.f * 32 AND b.frame_id < n.f * 32 + 64
         |  GROUP BY n.doc_id, n.f)
         |SELECT doc_id, frame_id, slice_e, total_e,
         |  total_e > 0 AND CAST(slice_e AS DOUBLE) / total_e > 0.25
         |    AS band_active
         |FROM es""".stripMargin,

    "spectral_frame" ->
      s"""WITH $duckBlocks,
         |$duckSpectrum,
         |$duckBandFeat,
         |ro AS (
         |  SELECT doc_id, f, m, len(m) AS L,
         |    ${fold("m")} * CAST(${spectral.RolloffPct} AS DOUBLE) AS pv
         |  FROM mlag),
         |ro2 AS (
         |  SELECT doc_id, f,
         |    CAST(len(list_filter(range(CAST(L AS BIGINT)),
         |      i -> ${fold("m[1 : i]")} < pv)) AS INTEGER) AS rolloff_bins
         |  FROM ro),
         |ca AS (
         |  SELECT doc_id, f,
         |    ${fold("list(contrast ORDER BY band)")} / ${spectral.NBands}
         |      AS contrast_avg
         |  FROM bfeat GROUP BY doc_id, f)
         |SELECT r.doc_id, r.f AS frame_id, r.rolloff_bins,
         |  ${cz("round(c.contrast_avg, 6)")} AS contrast_avg
         |FROM ro2 r JOIN ca c ON r.doc_id = c.doc_id AND r.f = c.f""".stripMargin,

    "spectral_moments" ->
      s"""WITH $duckBlocks,
         |$duckSpectrum,
         |fm0 AS (
         |  SELECT doc_id, f, m, len(m) AS L, ${fold("m")} AS s1 FROM mlag),
         |${duckMomentStages("fm0", "fm")}
         |SELECT doc_id, f AS frame_id,
         |  ${cz("scentroid")} AS scentroid,
         |  ${cz("sspread")} AS sspread,
         |  ${cz("sskewness")} AS sskewness,
         |  ${cz("skurtosis")} AS skurtosis
         |FROM fm3""".stripMargin,

    "mfcc" -> {
      val wLit = Duck.litMatrix(spectral.MelWeights)
      val dLit = Duck.litMatrix(spectral.DctBasis)
      val n = spectral.NMfcc
      s"""WITH $duckBlocks,
         |$duckSpectrum,
         |consts AS (SELECT CAST($wLit AS DOUBLE[][]) AS W,
         |                  CAST($dLit AS DOUBLE[][]) AS D),
         |loge AS (
         |  SELECT doc_id, f,
         |    list_transform(range($n), k ->
         |      ln(CASE WHEN ${fold(s"list_transform(range(CAST(least(len(m), 64) AS BIGINT)), i -> m[i + 1] * W[k + 1][i + 1])")} < ${spectral.LogLimit}
         |              THEN ${spectral.LogLimit}
         |              ELSE ${fold(s"list_transform(range(CAST(least(len(m), 64) AS BIGINT)), i -> m[i + 1] * W[k + 1][i + 1])")} END)) AS le
         |  FROM mlag, consts),
         |dct AS (
         |  SELECT doc_id, f, le, D,
         |    unnest(range($n)) AS coef
         |  FROM loge, consts)
         |SELECT doc_id, f AS frame_id, CAST(coef AS INTEGER) AS coef,
         |  ${cz(s"round(${fold(s"list_transform(range($n), mm -> le[mm + 1] * D[coef + 1][mm + 1])")}, 6)")}
         |    AS mfcc_val
         |FROM dct""".stripMargin
    },

    "autocorr" -> {
      val (minP, seekW) = (spectral.AcMinPeriod, spectral.AcSeekWidth)
      val maxSeek = F / 2
      s"""WITH $duckSeqs,
         |sub AS (
         |  SELECT doc_id, n_tok, tokens,
         |    list_transform(tokens, t -> CAST(t AS BIGINT)) AS tk
         |  FROM seqs
         |  WHERE CAST(substring(doc_id, 2) AS INTEGER) % 20 = 0),
         |sf AS (
         |  SELECT doc_id, n_tok, tk,
         |    unnest(range(CASE WHEN n_tok >= $F THEN (n_tok - $F) // $H + 1
         |                      ELSE 1 END)) AS f
         |  FROM sub),
         |st AS (
         |  SELECT doc_id, CAST(f AS INTEGER) AS f, tk, n_tok,
         |    CAST(f * $H AS BIGINT) AS fs,
         |    n_tok - f * $H AS rem0
         |  FROM sf),
         |st2 AS (
         |  SELECT *,
         |    list_filter(range(CAST(least(rem0, $maxSeek) - 1 AS BIGINT)),
         |      i -> tk[fs + i + 2] > tk[fs + i + 1])[1] AS i1
         |  FROM st),
         |st3 AS (
         |  SELECT doc_id, f, tk, fs,
         |    fs + coalesce(i1, 0) AS start,
         |    rem0 - coalesce(i1, 0) AS rem
         |  FROM st2),
         |st4 AS (
         |  SELECT *, least(rem, $minP) AS off FROM st3),
         |st5 AS (
         |  SELECT *,
         |    list_filter(range(CAST(least(rem - off, $maxSeek) - 1 AS BIGINT)),
         |      i -> tk[start + off + i + 2] > tk[start + off + i + 1])[1] AS i2
         |  FROM st4),
         |st6 AS (
         |  SELECT doc_id, f, tk, start, rem,
         |    CAST(off + coalesce(i2, 0) AS INTEGER) AS period
         |  FROM st5),
         |st7 AS (
         |  SELECT *, least(rem, $seekW) AS width FROM st6),
         |st8 AS (
         |  SELECT *,
         |    CASE WHEN rem = 0 OR period >= rem THEN CAST(0 AS BIGINT)
         |         ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(CAST(width AS BIGINT)),
         |             j -> tk[start + j + 1] * tk[start + j + 1])),
         |           (a, x) -> a + x) END AS r0
         |  FROM st7),
         |ac AS (
         |  SELECT doc_id, f, period,
         |    CASE WHEN rem = 0 OR period >= rem THEN CAST(0.0 AS DOUBLE)
         |    ELSE list_max(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(CAST(period // 2 AS BIGINT),
         |                           CAST(width AS BIGINT)), lag ->
         |        CASE WHEN r0 <> 0
         |             THEN CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |               list_transform(range(CAST(width - lag AS BIGINT)),
         |                 j -> tk[start + j + 1] * tk[start + j + lag + 1])),
         |               (a, x) -> a + x) AS DOUBLE) / CAST(r0 AS DOUBLE)
         |             ELSE CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |               list_transform(range(CAST(width - lag AS BIGINT)),
         |                 j -> tk[start + j + 1] * tk[start + j + lag + 1])),
         |               (a, x) -> a + x) AS DOUBLE) END)))
         |    END AS autocorr
         |  FROM st8)
         |SELECT doc_id, f AS frame_id, period,
         |  ${cz("autocorr")} AS autocorr
         |FROM ac""".stripMargin
    }
  )
}
