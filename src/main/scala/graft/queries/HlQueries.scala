package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Framing
import graft.features.{FeaturesHl, Pipeline}
import graft.functions.{Stats, expressions}
import graft.sources.Seqs

/** High-level descriptor queries (SampleAnalyser.cpp:1070-1711 analogs). */
object HlQueries {

  private def hl(s: SparkSession, dir: String): DataFrame =
    FeaturesHl.featuresHl(Pipeline.featuresLl(Seqs.fromDocuments(s, dir)))

  private val duckFrames = s"seqs AS (${Seqs.duckSql}),\n${Framing.duckFrameCtes()}"

  /** Shared HL oracle scaffolding: per-doc series, stripped peak envelope,
    * fade-decay correlation, confidences. */
  private val duckHlCtes: String = {
    s"""$duckFrames,
       |${Framing.duckFrameCtes(Seqs.RFrameSize, Seqs.RHop,
           Seqs.SilenceThreshold, "r")},
       |hmed AS (
       |  SELECT doc_id, frame_id, rms,
       |    (list_sort(list(rms) OVER hw))[
       |      ((len(list(rms) OVER hw) - 1) // 2) + 1] AS base
       |  FROM rframes
       |  WINDOW hw AS (PARTITION BY doc_id ORDER BY frame_id
       |                ROWS BETWEEN ${TokenQueries.MedianSpan - 1} PRECEDING
       |                AND CURRENT ROW)),
       |hov AS (
       |  SELECT doc_id, frame_id,
       |    greatest(rms - base, CAST(0.0 AS DOUBLE))
       |      / ${RhythmQueries.OnsetScale} AS v,
       |    lag(greatest(rms - base, CAST(0.0 AS DOUBLE))
       |      / ${RhythmQueries.OnsetScale})
       |      OVER (PARTITION BY doc_id ORDER BY frame_id) AS pv
       |  FROM hmed),
       |hons AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN v > 0.1 AND (pv IS NULL OR pv <= 0.1)
       |                  THEN 1 ELSE 0 END) AS INTEGER) AS n_onsets
       |  FROM hov GROUP BY doc_id),
       |ser AS (
       |  SELECT doc_id, any_value(n_tok) AS n_tok,
       |         count(*) AS n_frames,
       |         CAST(sum(CASE WHEN is_audible THEN 1 ELSE 0 END) AS INTEGER)
       |           AS audible_frames,
       |         list(rms ORDER BY frame_id) AS xs,
       |         list(CAST(peak AS DOUBLE) ORDER BY frame_id) AS peaks
       |  FROM frames GROUP BY doc_id),
       |bounds AS (
       |  SELECT doc_id,
       |    coalesce(min(CASE WHEN peak > ${FeaturesHl.HeuristicFloor}
       |                      THEN frame_id END), -1) AS pfirst,
       |    coalesce(max(CASE WHEN peak > ${FeaturesHl.HeuristicFloor}
       |                      THEN frame_id END), -1) AS plast
       |  FROM frames GROUP BY doc_id),
       |env0 AS (
       |  SELECT s.doc_id, s.n_tok, s.n_frames, s.audible_frames, s.xs,
       |    CASE WHEN b.pfirst = -1 THEN CAST([] AS DOUBLE[])
       |         ELSE s.peaks[b.pfirst + 1 : b.plast + 1] END AS env
       |  FROM ser s JOIN bounds b USING (doc_id)),
       |env1 AS (
       |  SELECT *,
       |    CASE WHEN len(env) < 2 THEN CAST([] AS DOUBLE[])
       |         ELSE list_transform(
       |           list_transform(range(CAST(len(env) AS BIGINT)),
       |             i -> 1.0 - CAST(i AS DOUBLE) / (len(env) - 1)),
       |           y -> (y * y) * (y * y)) END AS fade
       |  FROM env0),
       |corr AS (
       |  SELECT *,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), fade), (a, x) -> a + x) AS ss1,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(fade, x -> x * x)), (a, x) -> a + x) AS ss11,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), env), (a, x) -> a + x) AS ss2,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(env, x -> x * x)), (a, x) -> a + x) AS ss22,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(fade, (x, i) -> x * env[i])), (a, x) -> a + x) AS ss12,
       |    len(env) AS ne
       |  FROM env1),
       |conf AS (
       |  SELECT doc_id, n_tok, n_frames, audible_frames, xs,
       |    CASE WHEN ne < 2 THEN 0.0
       |         WHEN abs((ss11 - (ss1/ne) * (ss1/ne) * ne)
       |                * (ss22 - (ss2/ne) * (ss2/ne) * ne)) > 1e-12
       |         THEN (ss12 - (ss1/ne) * (ss2/ne) * ne)
       |              / sqrt((ss11 - (ss1/ne) * (ss1/ne) * ne)
       |                   * (ss22 - (ss2/ne) * (ss2/ne) * ne))
       |         ELSE 0.0 END AS env_correlation
       |  FROM corr),
       |conf2 AS (
       |  SELECT c.*, o.n_onsets,
       |    least(1.0, abs(env_correlation)) AS env_confidence,
       |    CASE WHEN n_tok < 2048 THEN 0.85
       |         WHEN n_tok < 4096 AND o.n_onsets <= 2 THEN 0.75
       |         ELSE sqrt(CAST(1.0 AS DOUBLE)
       |           - least(CAST(16384.0 AS DOUBLE),
       |               greatest(CAST(0.0 AS DOUBLE),
       |                 CAST(n_tok AS DOUBLE) - 4096.0)) / 16384.0)
       |    END AS length_confidence
       |  FROM conf c JOIN hons o USING (doc_id)),
       |conf3 AS (
       |  SELECT *,
       |    CASE WHEN n_tok < 2048 OR (n_tok < 4096 AND n_onsets <= 2)
       |         THEN length_confidence
       |         ELSE length_confidence * 0.3 + env_confidence * 0.7
       |    END AS oneshot_confidence
       |  FROM conf2)""".stripMargin
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // cubic-resampled spectrum-signature analog (SampleAnalyser.cpp:1490-1523).
    // Exploded to scalar rows (the driver's pandas hasher can't hash array
    // cells); -0.0 canonicalized at the boundary in both dialects.
    "hl_signature" -> ((s, dir) =>
      hl(s, dir).select(col("doc_id"),
          posexplode(col("signature")).as(Seq("sig_idx", "sig_val")))
        .withColumn("sig_val", expr("IF(sig_val = 0.0, 0.0, sig_val)"))),

    // one-shot heuristic chain (ClassificationHeuristics.cpp:12-98).
    // Every float column is canonicalized (x = 0.0 → 0.0) in both dialects:
    // PearsonCorr's numerator can be -0.0 in one engine and +0.0 in the
    // other (float == treats them equal but the driver hashes canonical
    // bit patterns).
    "hl_heuristics" -> ((s, dir) =>
      hl(s, dir).select(Seq(col("doc_id"), col("n_onsets")) ++
        Seq("env_correlation", "env_confidence", "length_confidence",
          "oneshot_confidence").map(n =>
          expr(s"IF($n = 0.0, 0.0, $n)").as(n)) :+
        col("is_oneshot"): _*)),

    // bagged-ensemble element-wise mean (Bagging.h:191-217): three derived
    // prediction vectors per doc (quantized strengths, their squares, their
    // complements) averaged per class — the ensemble-combination operator
    // (GBDT member inference itself is out of scope: model blob LFS-missing)
    "ensemble_mean" -> ((s, dir) => {
      graft.ops.Ensemble.baggedMean(
        hl(s, dir)
          .withColumn("p1", expr("transform(category_strengths, x -> round(x, 6))"))
          .withColumn("p2", expr("transform(p1, x -> x * x)"))
          .withColumn("p3", expr("transform(p1, x -> 1.0 - x)")),
        Seq("p1", "p2", "p3"), "ens")
        .select(col("doc_id"), posexplode(col("ens")).as(Seq("class_id", "mean_pred")))
        .withColumn("mean_pred", expr("IF(mean_pred = 0.0, 0.0, mean_pred)"))
    }),

    // characteristics + category strengths (SampleAnalyser.cpp:1354-1444,
    // ClassificationTools.cpp:7-128); flatness-derived values rounded at the
    // query boundary (exp/ln libm ulps)
    "hl_characteristics" -> ((s, dir) =>
      hl(s, dir).select(col("doc_id"),
        col("brightness"), col("noisiness"),
        round(col("harmonicity"), 6).as("harmonicity"),
        round(element_at(col("category_strengths"), 1), 6).as("strength_oneshot"),
        round(element_at(col("category_strengths"), 2), 6).as("strength_loop"),
        round(element_at(col("category_strengths"), 3), 6).as("strength_noise"),
        round(element_at(col("category_strengths"), 4), 6).as("strength_tonal")))
  )

  def oracles: Map[String, String] = Map(

    "hl_signature" -> {
      val resample = expressions.duckCubicResampleCtes(
        "ser2", FeaturesHl.SignatureFrames.toString, "cs")
      s"""WITH $duckFrames,
         |ser2 AS (SELECT doc_id, list(rms ORDER BY frame_id) AS xs
         |         FROM frames GROUP BY doc_id),
         |$resample
         |SELECT doc_id,
         |  CAST(gs - 1 AS INTEGER) AS sig_idx,
         |  CASE WHEN u = 0.0 THEN 0.0 ELSE u END AS sig_val
         |FROM (SELECT doc_id, unnest(sig) AS u,
         |             generate_subscripts(sig, 1) AS gs FROM cssig)""".stripMargin
    },

    "hl_heuristics" -> {
      val canon = Seq("env_correlation", "env_confidence",
        "length_confidence", "oneshot_confidence").map(n =>
        s"CASE WHEN $n = 0.0 THEN 0.0 ELSE $n END AS $n").mkString(",\n       ")
      s"""WITH RECURSIVE $duckHlCtes
         |SELECT doc_id, n_onsets, $canon,
         |       n_tok < 2048 OR (n_tok < 4096 AND n_onsets <= 2)
         |         OR oneshot_confidence > 0.7 AS is_oneshot
         |FROM conf3""".stripMargin
    },

    "hl_characteristics" ->
      s"""WITH ${duckStrengthCtes}
         |SELECT doc_id,
         |  (br * br) * (br * br) AS brightness,
         |  no * no AS noisiness,
         |  round(ha * ha, 6) AS harmonicity,
         |  round(st[1], 6) AS strength_oneshot,
         |  round(st[2], 6) AS strength_loop,
         |  round(st[3], 6) AS strength_noise,
         |  round(st[4], 6) AS strength_tonal
         |FROM strengths""".stripMargin,

    // bagged-ensemble element-wise mean (Bagging.h:191-217) over three
    // derived prediction vectors; inputs quantized to 1e-6 (the strengths
    // chain is flatness/libm-contaminated), arithmetic exact after that
    "ensemble_mean" ->
      s"""WITH ${duckStrengthCtes},
         |ens0 AS (
         |  SELECT doc_id, list_transform(st, x -> round(x, 6)) AS p1
         |  FROM strengths),
         |ens1 AS (
         |  SELECT doc_id, p1,
         |    list_transform(p1, x -> x * x) AS p2,
         |    list_transform(p1, x -> 1.0 - x) AS p3
         |  FROM ens0),
         |ens2 AS (
         |  SELECT doc_id,
         |    list_transform(range(${FeaturesHl.CategoryNames.length}), c ->
         |      ((p1[c + 1] + p2[c + 1]) + p3[c + 1]) / 3.0) AS ens
         |  FROM ens1)
         |SELECT doc_id,
         |  CAST(gs - 1 AS INTEGER) AS class_id,
         |  CASE WHEN u = 0.0 THEN 0.0 ELSE u END AS mean_pred
         |FROM (SELECT doc_id, unnest(ens) AS u,
         |             generate_subscripts(ens, 1) AS gs FROM ens2)""".stripMargin
  )

  /** Shared strengths scaffolding (characteristics + ensemble oracles):
    * conf3 + 13-stat block + chars/cats/strengths chain. */
  private lazy val duckStrengthCtes: String = {
      // stats block for min/max/mean/centroid/flatness over xs
      val statsBlock = Stats.duckBlock(
        inner = "SELECT doc_id, xs FROM conf3",
        keys = Seq("doc_id"), xs = "xs", p = "rms", prelude = duckHlCtes)
      s"""hlstats AS ($statsBlock),
         |joined AS (
         |  SELECT c.*, h.rms_min, h.rms_max, h.rms_mean, h.rms_centroid,
         |         h.rms_flatness
         |  FROM (WITH $duckHlCtes SELECT * FROM conf3) c
         |  JOIN hlstats h USING (doc_id)),
         |chars AS (
         |  SELECT *,
         |    0.7 * least(rms_centroid / n_frames, CAST(1.0 AS DOUBLE))
         |      + 0.3 * least(rms_max / 2048.0, CAST(1.0 AS DOUBLE)) AS br,
         |    0.2 * (1.0 - least(rms_min / 2048.0, CAST(1.0 AS DOUBLE)))
         |      + 0.6 * (1.0 - least(rms_mean / 2048.0, CAST(1.0 AS DOUBLE)))
         |      + 0.2 * (1.0 - least(rms_max / 2048.0, CAST(1.0 AS DOUBLE))) AS no,
         |    0.4 * least(1.0, 1.5 * rms_flatness)
         |      + 0.3 * least(1.0, 2.0 * env_confidence)
         |      + 0.3 * rms_flatness AS ha
         |  FROM joined),
         |cats AS (
         |  SELECT *,
         |    [oneshot_confidence,
         |     least(1.0, CAST(audible_frames AS DOUBLE) / n_frames),
         |     no * no,
         |     ha * ha] AS w
         |  FROM chars),
         |cats2 AS (
         |  SELECT *,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_filter(w, x -> x >= ${FeaturesHl.MinCategoryWeight})),
         |      (a, x) -> a + x) AS wsum
         |  FROM cats),
         |strengths AS (
         |  SELECT *,
         |    list_transform(w, x ->
         |      CASE WHEN wsum = 0.0 OR x < ${FeaturesHl.MinCategoryWeight}
         |           THEN 0.0 ELSE x / wsum END) AS st
         |  FROM cats2)""".stripMargin
  }
}
