package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Framing
import graft.functions.Stats
import graft.sources.Seqs

/** Vector-series operators: per-band framed features with per-band
  * statistic blocks (the `TFramedVectorData<N>` analog,
  * `SampleDescriptors.h:264-356` — per-frame fixed-width band arrays with
  * 13 stats per band), the band-energy rebucketing agg
  * (`SampleAnalyser.cpp:1450-1488, 2015-2047`), the global normalizer
  * fit+apply (`ClassificationTestDataSet.cpp:277-305`), and the
  * data-dependent two-pass confidence filter
  * (`SampleAnalyser.cpp:1236-1292`).
  */
object VectorQueries {

  /** Bands per spectral frame: frame 2048 = 16 tumbling 128-token blocks. */
  val NBands = 16
  val BlockSize = 128

  /** Confidence tiers — mean-derived threshold selection
    * (`MLow/Medium/HighPitchConfidenceValue`, `SampleAnalyser.cpp:64-66`):
    * the per-doc mean rms picks which multiplier gates the frames. */
  val TierHigh = 650.0
  val TierMid = 550.0

  private val duckSeqs = s"seqs AS (${Seqs.duckSql})"
  private val duckFrames = s"$duckSeqs,\n${Framing.duckFrameCtes()}"
  private val duckBlocks =
    s"$duckSeqs,\n${Framing.duckFrameCtes(BlockSize, BlockSize, Seqs.SilenceThreshold, "b")}"

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // per-band framed series + 13-stat block per (doc, band):
    // band b of spectral frame f = tumbling block 8f+b (F=2H ⇒ 8 blocks/hop)
    "band_stats" -> ((s, dir) => {
      val withBlocks = Framing.withFrames(Seqs.fromDocuments(s, dir),
          BlockSize, BlockSize)
        .withColumn("block_rms", expr("transform(frames, fr -> fr.rms)"))
        .withColumn("n_sf", expr(
          s"CASE WHEN n_tok >= ${Seqs.FrameSize} THEN ((n_tok - ${Seqs.FrameSize}) div ${Seqs.Hop}) + 1 ELSE 1 END"))
      val perBand = withBlocks
        .select(col("doc_id"), col("block_rms"), col("n_sf"),
          explode(expr(s"sequence(0, ${NBands - 1})")).as("band"))
        // series over spectral frames: block 8f + band (clamped to existing
        // blocks for the short-doc single-frame case)
        .withColumn("xs", expr(
          """filter(
            |  transform(sequence(0, n_sf - 1),
            |    f -> get(block_rms, 8 * f + band)),
            |  v -> v IS NOT NULL)""".stripMargin))
        .withColumn("__st", expr("graft_stats_block(xs)"))
      Stats.StatNames.foldLeft(perBand)((d, n) =>
        d.withColumn(s"band_$n",
          if (n == "gmean" || n == "flatness") round(col(s"__st.$n"), 6)
          else col(s"__st.$n")))
        .select(Seq(col("doc_id"), col("band")) ++
          Stats.StatNames.map(n => col(s"band_$n")): _*)
    }),

    // band-energy rebucketing: 16 bands merged to 8 by index map with the
    // compress shape pow(x*1.25, 1/6) ~ deterministic alternative
    // sqrt(sqrt(x*1.25)) retained bitwise in both engines
    "band_merge" -> ((s, dir) => {
      Framing.withFrames(Seqs.fromDocuments(s, dir), BlockSize, BlockSize)
        .select(col("doc_id"), explode(col("frames")).as("fr"))
        .select(col("doc_id"),
          expr("CAST(fr.frame_id div 2 AS INT)").as("mblock"),
          expr("fr.fsumsq").as("e0"))
        .groupBy(col("doc_id"), col("mblock"))
        .agg(sum(col("e0")).as("se"))
        .withColumn("merged_energy", expr(
          "sqrt(sqrt(CAST(se AS DOUBLE) * 1.25))"))
    }),

    // global normalizer: fit mean/var_pop per feature over the whole table
    // (ordered fold for cross-engine bitwise equality; production uses
    // var_pop whose partial aggregation is order-free up to fp rounding),
    // then z-score with ±3σ clamp per ClassificationTestDataSet.cpp:277-305
    "normalizer" -> ((s, dir) => {
      val feats = Framing.withFrames(Seqs.fromDocuments(s, dir))
        .withColumn("xs", expr("transform(frames, fr -> fr.rms)"))
        .withColumn("__st", expr("graft_stats_block(xs)"))
        .select(col("doc_id"), col("__st.mean").as("x"))
      val fit = feats
        .agg(expr("sort_array(collect_list(struct(doc_id, x)))").as("all"))
        .select(
          expr("transform(all, p -> p.x)").as("vals"))
        .select(expr("graft_stats_block(vals)").as("st"))
        .select(col("st.mean").as("mu"),
          expr("sqrt(st.variance)").as("sigma"))
      feats.crossJoin(broadcast(fit))
        .withColumn("z", expr(
          "greatest(CAST(-3.0 AS DOUBLE), least(CAST(3.0 AS DOUBLE), (x - mu) / sigma))"))
        .select(col("doc_id"), col("x"), col("z"))
    }),

    // two-pass data-dependent filter: per-doc mean picks the gate tier,
    // frames above the gate are kept; outputs exact-integer summaries
    "confident_filter" -> ((s, dir) => {
      val fr = Framing.frameRows(Seqs.fromDocuments(s, dir))
      val means = fr.groupBy(col("doc_id"))
        .agg((sum(col("fsumsq")) / sum(col("n_samp"))).as("msq"))
        .withColumn("gate", expr(
          s"""CASE WHEN sqrt(msq) >= $TierHigh THEN 0.8
             |     WHEN sqrt(msq) >= $TierMid THEN 0.5
             |     ELSE 0.2 END""".stripMargin))
      fr.join(means, Seq("doc_id"))
        .filter(expr(s"rms > gate * $TierHigh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_confident"),
          sum(col("fsumsq")).as("energy_confident"),
          max(col("peak")).as("peak_confident"))
    })
  )

  def oracles: Map[String, String] = Map(

    "band_stats" -> {
      val inner =
        s"""SELECT doc_id, band, list_transform(
           |    list_filter(range(n_sf), f -> 8 * f + band + 1 <= len(blocks)),
           |    f -> blocks[8 * f + band + 1]) AS xs
           |FROM (
           |  SELECT b.doc_id, b.blocks, n.n_sf, unnest(range($NBands)) AS band
           |  FROM (SELECT doc_id, list(rms ORDER BY frame_id) AS blocks
           |        FROM bframes GROUP BY doc_id) b
           |  JOIN (SELECT doc_id,
           |          CASE WHEN n_tok >= ${Seqs.FrameSize}
           |               THEN ((n_tok - ${Seqs.FrameSize}) // ${Seqs.Hop}) + 1
           |               ELSE 1 END AS n_sf
           |        FROM seqs) n USING (doc_id))""".stripMargin
      val block = Stats.duckBlock(inner, Seq("doc_id", "band"), "xs", "band",
        prelude = duckBlocks)
      val outer = Seq("doc_id", "CAST(band AS INT) AS band") ++ Stats.StatNames.map {
        case n @ ("gmean" | "flatness") => s"round(band_$n, 6) AS band_$n"
        case n => s"band_$n"
      }
      s"SELECT ${outer.mkString(", ")} FROM ($block)"
    },

    "band_merge" ->
      s"""WITH $duckBlocks
         |SELECT doc_id,
         |  CAST(frame_id // 2 AS INTEGER) AS mblock,
         |  CAST(sum(fsumsq) AS BIGINT) AS se,
         |  sqrt(sqrt(CAST(sum(fsumsq) AS DOUBLE) * 1.25)) AS merged_energy
         |FROM bframes
         |GROUP BY doc_id, frame_id // 2""".stripMargin,

    "normalizer" ->
      s"""WITH $duckFrames,
         |ser AS (SELECT doc_id, list(rms ORDER BY frame_id) AS xs
         |        FROM frames GROUP BY doc_id),
         |feats AS (
         |  SELECT doc_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs), (a, b) -> a + b)
         |      / len(xs) AS x
         |  FROM ser),
         |fitv AS (SELECT list(x ORDER BY doc_id) AS vals FROM feats),
         |fit1 AS (
         |  SELECT vals, len(vals) AS n,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
         |      (a, b) -> a + b) AS s
         |  FROM fitv),
         |fit2 AS (SELECT *, s / n AS mu FROM fit1),
         |fit3 AS (
         |  SELECT mu,
         |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(vals, v -> (v - mu) * (v - mu))),
         |      (a, b) -> a + b) / n) AS sigma
         |  FROM fit2)
         |SELECT f.doc_id, f.x,
         |  greatest(CAST(-3.0 AS DOUBLE),
         |           least(CAST(3.0 AS DOUBLE), (f.x - t.mu) / t.sigma)) AS z
         |FROM feats f CROSS JOIN fit3 t""".stripMargin,

    "confident_filter" ->
      s"""WITH $duckFrames,
         |m AS (
         |  SELECT doc_id,
         |    CAST(sum(fsumsq) AS DOUBLE) / sum(n_samp) AS msq
         |  FROM frames GROUP BY doc_id),
         |g AS (
         |  SELECT doc_id,
         |    CASE WHEN sqrt(msq) >= $TierHigh THEN 0.8
         |         WHEN sqrt(msq) >= $TierMid THEN 0.5
         |         ELSE 0.2 END AS gate
         |  FROM m)
         |SELECT f.doc_id,
         |  count(*) AS n_confident,
         |  CAST(sum(f.fsumsq) AS BIGINT) AS energy_confident,
         |  CAST(max(f.peak) AS INTEGER) AS peak_confident
         |FROM frames f JOIN g USING (doc_id)
         |WHERE f.rms > g.gate * $TierHigh
         |GROUP BY f.doc_id""".stripMargin
  )
}
