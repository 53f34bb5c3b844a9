package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Framing
import graft.features.{FeatureVector => FV, PointInTime}
import graft.functions.{spectral, Stats}
import graft.sources.Seqs

/** The full-width feature-vector query (`fv_full`) and its DuckDB oracle —
  * the 48-offset × 35-row assembly of [[graft.features.FeatureVector]]
  * verified element-by-element: output is (doc_id, fv_idx, fv_val) with
  * every value rounded to 1e-6 and zero-canonicalized at the boundary
  * (components mix exact folds with exp/pow-derived values; the engine
  * keeps full precision).
  *
  * The oracle reuses the already-verified CTE builders (band battery,
  * block spectrum, canny/rhythm walk, 13-stat blocks) and assembles
  * positions from the same Scala layout constants as the Spark side, so
  * the two cannot drift. */
object FeatureVectorQueries {

  private val F = Seqs.FrameSize
  private val H = Seqs.Hop
  private val NB = spectral.NBands
  private val NM = spectral.NMfcc
  private val nOff = PointInTime.TimeOffsets.length
  private val SubMod = 10

  private def fold(xs: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $xs), (a, x) -> a + x)"

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // rounding happens at source, per the FeatureVector policy (libm-derived
    // positions only); the boundary just canonicalizes the sign of zero.
    // 1-in-5 doc subsample: the DuckDB mirror of the full assembly costs
    // ~10 min on the whole sf0.01 corpus (the rhythm walk + 35 stat blocks
    // are interpreted there) — the gate needs minutes. The engine runs the
    // full corpus in Bench/features paths; only this verification boundary
    // subsamples, identically on both sides.
    "fv_full" -> ((s, dir) =>
      FV.fvFull(Seqs.fromDocuments(s, dir)
          .filter(expr(s"CAST(substring(doc_id, 2) AS INT) % $SubMod = 0")))
        .select(col("doc_id"), posexplode(col("fv")).as(Seq("fv_idx", "fv_val")))
        .withColumn("fv_val", expr("IF(fv_val = 0.0, 0.0, fv_val)")))
  )

  def oracles: Map[String, String] = Map("fv_full" -> oracleSql)

  private lazy val oracleSql: String = {
    val offsVals = PointInTime.TimeOffsets.zipWithIndex
      .map { case (t, ti) => s"($ti, $t)" }.mkString(", ")

    // --- per-frame full-spectrum scalars (mirrors FrameSpectral kernel)
    val fsc =
      s"""fls AS (
         |  SELECT doc_id, f, m, len(m) AS L,
         |    list_transform(range(CAST(len(m) AS BIGINT)),
         |      i -> coalesce(lm[i + 1], CAST(0.0 AS DOUBLE))) AS ls
         |  FROM mlag),
         |fsum AS (
         |  SELECT doc_id, f, m, L,
         |    ${fold("m")} AS s1,
         |    ${fold("list_transform(m, x -> x * x)")} AS sq,
         |    ${fold("list_transform(m, x -> ln(abs(x) + 1e-20))")} AS slog,
         |    ${fold("ls")} AS t1,
         |    ${fold("list_transform(ls, x -> x * x)")} AS t2,
         |    ${fold("list_transform(m, (x, i) -> x * ls[i])")} AS s12
         |  FROM fls),
         |frat AS (
         |  SELECT *, CASE WHEN s1 / L = 0.0 THEN CAST(0.0 AS DOUBLE)
         |                 ELSE exp(slog / L) / (s1 / L) END AS ratio
         |  FROM fsum),
         |${SpectralQueries.duckMomentStages("frat", "fvm")},
         |fsc AS (
         |  SELECT doc_id, f, scentroid, sspread, sskewness, skurtosis,
         |    sqrt(sq / L) AS srms,
         |    least(CASE WHEN ratio = 1.0 THEN CAST(0.0 AS DOUBLE)
         |               WHEN ratio > 1e-12
         |                 THEN ln(ratio) * (20.0 / ln(CAST(10.0 AS DOUBLE)))
         |               ELSE CAST(-200.0 AS DOUBLE) END / -60.0,
         |          CAST(1.0 AS DOUBLE)) AS sflat,
         |    CASE WHEN abs((sq - (s1/L) * (s1/L) * L)
         |                * (t2 - (t1/L) * (t1/L) * L)) > 1e-12
         |         THEN (s12 - (s1/L) * (t1/L) * L)
         |              / sqrt((sq - (s1/L) * (s1/L) * L)
         |                   * (t2 - (t1/L) * (t1/L) * L))
         |         ELSE CAST(0.0 AS DOUBLE) END AS sflux
         |  FROM fvm3),
         |fagg AS (
         |  SELECT doc_id, f,
         |    CAST(sum(complexity) AS INTEGER) AS scomplexity,
         |    ${fold("list(contrast ORDER BY band)")} / $NB AS scontrast
         |  FROM bfeat GROUP BY doc_id, f),
         |f0c AS (
         |  SELECT doc_id, frame_id AS f,
         |    least(CAST(peak AS DOUBLE) / 2048.0, CAST(1.0 AS DOUBLE)) AS f0conf
         |  FROM frames),
         |fsq AS (
         |  SELECT c.doc_id, c.f, c.srms, c.sflat, c.sflux,
         |         a.scontrast, a.scomplexity, p.f0conf,
         |         c.scentroid, c.sspread, c.sskewness, c.skurtosis
         |  FROM fsc c
         |  JOIN fagg a ON a.doc_id = c.doc_id AND a.f = c.f
         |  JOIN f0c p ON p.doc_id = c.doc_id AND p.f = c.f)""".stripMargin

    // --- raw MFCC values per (doc, frame, coef)
    val dot = fold(
      s"list_transform(range(CAST(least(len(m), 64) AS BIGINT)), i -> m[i + 1] * W[k + 1][i + 1])")
    val mfv =
      s"""consts AS (SELECT CAST(${Duck.litMatrix(spectral.MelWeights)} AS DOUBLE[][]) AS W,
         |                  CAST(${Duck.litMatrix(spectral.DctBasis)} AS DOUBLE[][]) AS D),
         |loge AS (
         |  SELECT doc_id, f,
         |    list_transform(range($NM), k ->
         |      ln(CASE WHEN $dot < ${spectral.LogLimit}
         |              THEN ${spectral.LogLimit} ELSE $dot END)) AS le
         |  FROM mlag, consts),
         |mfv AS (
         |  SELECT doc_id, f, CAST(coef AS INTEGER) AS coef,
         |    ${fold(s"list_transform(range($NM), mm -> le[mm + 1] * D[coef + 1][mm + 1])")} AS v
         |  FROM (SELECT doc_id, f, le, D, unnest(range($NM)) AS coef
         |        FROM loge, consts))""".stripMargin

    // --- stat-block CTE groups (prefix -> (inner, keys))
    // exp/pow-derived series quantized to 1e-6 before stats (see
    // FeatureVector: flatness-stat is ill-conditioned on near-zero-mean
    // series, so stat inputs must be bit-identical across engines)
    val serCols = Seq("srms", "round(sflat, 6)", "sflux", "round(scontrast, 6)",
      "CAST(scomplexity AS DOUBLE)", "f0conf",
      "scentroid", "sspread", "sskewness", "skurtosis")
    val fsBlocks = serCols.zipWithIndex.map { case (c, k) =>
      Stats.duckBlockCtes(
        s"SELECT doc_id, list($c ORDER BY f) AS xs FROM fsq GROUP BY doc_id",
        Seq("doc_id"), "xs", s"fs$k")
    }
    val bandBlocks = FV.BandDefs.zipWithIndex.map { case (d, i) =>
      val c =
        if (d == "complexity") "CAST(complexity AS DOUBLE)"
        else if (d == "flatness" || d == "contrast") s"round($d, 6)"
        else d
      Stats.duckBlockCtes(
        s"SELECT doc_id, band, list($c ORDER BY f) AS xs FROM bfeat GROUP BY doc_id, band",
        Seq("doc_id", "band"), "xs", s"bd$i")
    }
    val mfcBlock = Stats.duckBlockCtes(
      "SELECT doc_id, coef, list(round(v, 6) ORDER BY f) AS xs FROM mfv GROUP BY doc_id, coef",
      Seq("doc_id", "coef"), "xs", "mfc")
    val ampBlock = Stats.duckBlockCtes(
      "SELECT doc_id, list(rms ORDER BY frame_id) AS xs FROM frames GROUP BY doc_id",
      Seq("doc_id"), "xs", "amp")
    val silBlock = Stats.duckBlockCtes(
      """SELECT doc_id, list(CASE WHEN is_audible THEN CAST(1.0 AS DOUBLE)
        |  ELSE CAST(0.0 AS DOUBLE) END ORDER BY frame_id) AS xs
        |FROM frames GROUP BY doc_id""".stripMargin,
      Seq("doc_id"), "xs", "sil")
    val statCtes = (fsBlocks ++ bandBlocks :+ mfcBlock :+ ampBlock :+ silBlock)
      .map(_._1).mkString(",\n")

    // --- tempo + effective length + scalars
    val tempoEff =
      s"""ovl AS (
         |  SELECT doc_id, frame_id, v,
         |    lag(v) OVER (PARTITION BY doc_id ORDER BY frame_id) AS prev_v
         |  FROM ov),
         |tagg AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN v > 0.1 AND (prev_v IS NULL OR prev_v <= 0.1)
         |                  THEN 1 ELSE 0 END) AS DOUBLE) AS n_onsets
         |  FROM ovl GROUP BY doc_id),
         |traw AS (
         |  SELECT s.doc_id, t.n_onsets * 61440.0 / s.n_tok AS tempo_raw
         |  FROM seqs s JOIN tagg t USING (doc_id)),
         |ta AS (SELECT doc_id, CASE WHEN tempo_raw < 20.0 OR tempo_raw > 300.0
         |                          THEN CAST(0.0 AS DOUBLE) ELSE tempo_raw END AS x
         |       FROM traw),
         |tb AS (SELECT doc_id, CASE WHEN x > 0.0 AND x < 80.0 THEN x * 2.0
         |                          ELSE x END AS x FROM ta),
         |tc AS (SELECT doc_id, CASE WHEN x > 0.0 AND x < 80.0 THEN x * 2.0
         |                          ELSE x END AS x FROM tb),
         |tf AS (SELECT doc_id, CASE WHEN x >= 200.0 THEN x / 2.0 ELSE x END
         |                        AS tempo FROM tc),
         |eff AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN count(CASE WHEN abs(v) > 128 THEN 1 END) = 0 THEN 0
         |         ELSE max(CASE WHEN abs(v) > 128 THEN pos END)
         |            - min(CASE WHEN abs(v) > 128 THEN pos END) + 1
         |    END AS DOUBLE) AS eff_len
         |  FROM tok GROUP BY doc_id),
         |scl AS (
         |  SELECT s.doc_id,
         |    [str.strength,
         |     round(CASE WHEN c.peakmean <> 0.0
         |          THEN -1.0 * pow(c.peakmean / c.valleymean,
         |                          1.0 / ln(c.totalmean + 0.0001))
         |          ELSE CAST(0.0 AS DOUBLE) END, 6),
         |     t.tempo, e.eff_len] AS vals
         |  FROM seqs s
         |  JOIN strength str USING (doc_id)
         |  JOIN contrast c USING (doc_id)
         |  JOIN tf t USING (doc_id)
         |  JOIN eff e USING (doc_id))""".stripMargin

    // --- assembly pieces (doc_id, pos, val)
    def statUnnest(prefix: String, keyExtra: String, base: String,
                   from: String): String = {
      // rounding policy: only the flatness statistic is libm-derived
      val arr = FV.FvStats.map {
        case "flatness" => s"round(${prefix}_flatness, 6)"
        case s => s"${prefix}_$s"
      }.mkString("[", ", ", "]")
      s"""SELECT doc_id, $base + gs - 1 AS pos, u AS val
         |FROM (SELECT doc_id$keyExtra, unnest($arr) AS u,
         |             generate_subscripts($arr, 1) AS gs FROM $from)""".stripMargin
    }

    val sigPiece =
      s"""SELECT s.doc_id, bb.band * $nOff + o.ti AS pos,
         |  CASE WHEN bf.mean IS NULL THEN CAST(0.0 AS DOUBLE)
         |       ELSE round(pow(bf.mean / 2048.0 * 1.25, ${FV.SixthLit}), 6) END AS val
         |FROM seqs s
         |CROSS JOIN bands bb
         |CROSS JOIN offs o
         |LEFT JOIN bfeat bf ON bf.doc_id = s.doc_id AND bf.f = o.t
         |  AND bf.band = bb.band""".stripMargin

    val duckSeriesCols = Seq(
      ("srms", "CAST(0.0 AS DOUBLE)"),
      ("round(q.sflat, 6)", "CAST(1.0 AS DOUBLE)"),
      ("sflux", "CAST(0.0 AS DOUBLE)"),
      ("round(q.scontrast, 6)", "CAST(-1.0 AS DOUBLE)"),
      ("CAST(q.scomplexity AS DOUBLE)", "CAST(0.0 AS DOUBLE)"),
      ("f0conf", "CAST(0.0 AS DOUBLE)"),
      ("scentroid", "CAST(0.0 AS DOUBLE)"),
      ("sspread", "CAST(0.0 AS DOUBLE)"),
      ("sskewness", "CAST(0.0 AS DOUBLE)"),
      ("skurtosis", "CAST(0.0 AS DOUBLE)"))
    val seriesPieces = duckSeriesCols.zipWithIndex.map { case ((c, fb), k) =>
      val cc = if (c.contains("q.") || c.startsWith("CAST")) c else s"q.$c"
      s"""SELECT s.doc_id, ${FV.SeriesBase + k * nOff} + o.ti AS pos,
         |  coalesce($cc, $fb) AS val
         |FROM seqs s CROSS JOIN offs o
         |LEFT JOIN fsq q ON q.doc_id = s.doc_id AND q.f = o.t""".stripMargin
    }

    val specStatPieces = serCols.indices.map { k =>
      statUnnest(s"fs$k", "", s"${FV.SpecStatsBase + k * 7}", s"__fs${k}st")
    }
    val bandStatPieces = FV.BandDefs.indices.map { i =>
      statUnnest(s"bd$i", ", band",
        s"${FV.BandStatsBase + i * NB * 7} + band * 7", s"__bd${i}st")
    }
    val mfccStatPiece =
      statUnnest("mfc", ", coef", s"${FV.MfccStatsBase} + coef * 7", "__mfcst")

    val ampSeriesPiece =
      s"""SELECT s.doc_id, ${FV.AmpSeriesBase} + o.ti AS pos,
         |  coalesce(fr.rms, CAST(0.0 AS DOUBLE)) AS val
         |FROM seqs s CROSS JOIN offs o
         |LEFT JOIN frames fr ON fr.doc_id = s.doc_id AND fr.frame_id = o.t""".stripMargin
    val ampStatPiece = statUnnest("amp", "", s"${FV.AmpStatsBase}", "__ampst")
    val silStatPiece = statUnnest("sil", "", s"${FV.SilStatsBase}", "__silst")

    val scalarsPiece =
      s"""SELECT doc_id, ${FV.ScalarsBase} + gs - 1 AS pos, u AS val
         |FROM (SELECT doc_id, unnest(vals) AS u,
         |             generate_subscripts(vals, 1) AS gs FROM scl)""".stripMargin

    val padPiece =
      s"""SELECT st.doc_id, ${FV.UnpaddedWidth} + p.pi AS pos,
         |  st.fs0_mean AS val
         |FROM __fs0st st
         |CROSS JOIN (SELECT unnest(range(${FV.PadCount})) AS pi) p""".stripMargin

    val allPieces = (Seq(sigPiece) ++ seriesPieces ++ specStatPieces ++
      bandStatPieces ++ Seq(mfccStatPiece, ampSeriesPiece, ampStatPiece,
        silStatPiece, scalarsPiece, padPiece)).mkString("\nUNION ALL\n")

    s"""WITH RECURSIVE ${SpectralQueries.duckBlocksWhere(
        s"CAST(substring(doc_id, 2) AS INTEGER) % $SubMod = 0")},
       |${Framing.duckFrameCtes()},
       |${Framing.duckFrameCtes(Seqs.RFrameSize, Seqs.RHop, Seqs.SilenceThreshold, "r")},
       |${SpectralQueries.duckSpectrum},
       |${SpectralQueries.duckBandFeat},
       |$fsc,
       |$mfv,
       |$statCtes,
       |${RhythmQueries.duckSharp},
       |${RhythmQueries.duckRhythmMetricCtes},
       |$tempoEff,
       |offs(ti, t) AS (VALUES $offsVals)
       |SELECT doc_id, CAST(pos AS INTEGER) AS fv_idx,
       |  CASE WHEN val = 0.0 THEN 0.0 ELSE val END AS fv_val
       |FROM (
       |$allPieces
       |)""".stripMargin
  }
}
