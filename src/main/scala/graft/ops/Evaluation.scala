package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed binary-classifier evaluation — the eval stage of a
  * training pipeline: per-group EXACT AUC plus threshold confusion
  * metrics, computed from rank statistics rather than a threshold sweep.
  *
  * AUC via the tie-aware Mann–Whitney identity: with ascending-score
  * ranks, a tie group's average rank is `r + (c−1)/2` (r = min rank,
  * c = tie size), so TWICE the positive rank-sum `S2 = Σ_{label}
  * (2r + c − 1)` is an exact integer, and
  * `AUC = (S2 − nP(nP+1)) / (2·nP·nN)` is one IEEE divide of exact
  * integers — bitwise across engines and partitionings, no float
  * accumulation anywhere. Confusion metrics are single divides of
  * integer counts; ratios with zero denominators are NULL.
  *
  * Scale: two windows per group partition (rank by score, tie count) +
  * one group agg — parallelism = group cardinality, each partition one
  * sort. For a single giant group the sort is the cost of exactness; the
  * sketch alternative (fixed score-histogram AUC) trades exactness for a
  * narrow map-side pass and is deliberately not the oracle path.
  *
  * Reference analog: classifier training prints per-category test-set
  * error from the bagged ensemble's predictions
  * (`Source/Crawler/Classification/Source/Models/Bagging.h:191-217`). */
object Evaluation {

  /** Per-`group` metrics of `score` against boolean `label` at decision
    * threshold `thr`. Output: (group, n, n_pos, n_neg, tp, fp, fn, tn,
    * auc, accuracy, precision, recall). */
  def binaryMetrics(scored: DataFrame, group: String, score: String,
                    label: String, thr: Double): DataFrame = {
    val g = col(group); val s = col(score); val l = col(label)
    val ranked = scored
      .withColumn("rk", rank().over(Window.partitionBy(g).orderBy(s))
        .cast("long"))
      .withColumn("tc", count(lit(1)).over(Window.partitionBy(g, s)))
    val pos = when(l, 1L).otherwise(0L)
    val agg = ranked.groupBy(g)
      .agg(count(lit(1)).as("n"),
        sum(pos).as("n_pos"),
        sum(when(l, lit(2L) * col("rk") + col("tc") - 1L).otherwise(0L))
          .as("s2"),
        sum(when(l && s > thr, 1L).otherwise(0L)).as("tp"),
        sum(when(!l && s > thr, 1L).otherwise(0L)).as("fp"),
        sum(when(l && !(s > thr), 1L).otherwise(0L)).as("fn"),
        sum(when(!l && !(s > thr), 1L).otherwise(0L)).as("tn"))
      .withColumn("n_neg", col("n") - col("n_pos"))
    agg
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("s2") - col("n_pos") * (col("n_pos") + 1L)).cast("double")
            / (lit(2L) * col("n_pos") * col("n_neg")).cast("double")))
      .withColumn("accuracy",
        (col("tp") + col("tn")).cast("double") / col("n").cast("double"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp")).cast("double")))
      .withColumn("recall",
        when(col("n_pos") > 0,
          col("tp").cast("double") / col("n_pos").cast("double")))
      .select(g, col("n"), col("n_pos"), col("n_neg"), col("tp"),
        col("fp"), col("fn"), col("tn"), col("auc"), col("accuracy"),
        col("precision"), col("recall"))
  }

  /** DuckDB mirror of [[binaryMetrics]] over `scoredSql` — a full SELECT
    * (may carry its own WITH; it is wrapped as a subquery) yielding at
    * least (group, score, label) columns with those names bound by the
    * parameters. */
  def duckSql(scoredSql: String, group: String, score: String,
              label: String, thr: Double): String =
    s"""WITH scored AS (SELECT * FROM ($scoredSql) q),
       |r AS (
       |  SELECT $group AS grp, $score AS s, $label AS lbl,
       |    CAST(rank() OVER (PARTITION BY $group ORDER BY $score) AS BIGINT)
       |      AS rk,
       |    count(*) OVER (PARTITION BY $group, $score) AS tc
       |  FROM scored),
       |a AS (
       |  SELECT grp,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |    CAST(sum(CASE WHEN lbl THEN 2 * rk + tc - 1 ELSE 0 END) AS BIGINT)
       |      AS s2,
       |    CAST(sum(CASE WHEN lbl AND s > CAST($thr AS DOUBLE)
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN NOT lbl AND s > CAST($thr AS DOUBLE)
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN lbl AND NOT (s > CAST($thr AS DOUBLE))
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN NOT lbl AND NOT (s > CAST($thr AS DOUBLE))
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM r GROUP BY grp)
       |SELECT grp AS $group, n, n_pos, n - n_pos AS n_neg, tp, fp, fn, tn,
       |  CASE WHEN n_pos > 0 AND n - n_pos > 0 THEN
       |    CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
       |      / CAST(2 * n_pos * (n - n_pos) AS DOUBLE) END AS auc,
       |  CAST(tp + tn AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy,
       |  CASE WHEN tp + fp > 0 THEN
       |    CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
       |  CASE WHEN n_pos > 0 THEN
       |    CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE) END AS recall
       |FROM a""".stripMargin

  /** Threshold SWEEP: the precision/recall curve a filter designer reads
    * to pick an operating point. Thresholds are the `buckets`−1 decile
    * boundary scores (`max(score)` of each ntile bucket — the VALUE at a
    * fixed global rank position, deterministic under ties regardless of
    * tie ordering); at each, exact int64 confusion counts for the
    * `score > thr` decision and single-divide precision/recall (NULL on
    * zero denominators). Output: `(q, thr, tp, fp, fn, tn, precision,
    * recall)`, one row per interior boundary.
    *
    * Plan/scale: the ntile is ONE global-order window — the exactness
    * cost (same note as [[LanguageModel.perplexityBuckets]]; at extreme
    * scale substitute sketch-percentile thresholds, this form is that
    * approximation's oracle). The sweep itself is a broadcast of the
    * tiny threshold table over the scored set (buckets× map-side
    * expansion, partial aggs) + one `buckets`-row agg — no corpus
    * shuffle. */
  def prCurve(scored: DataFrame, score: String, label: String,
              buckets: Int): DataFrame = {
    val s = col(score); val l = col(label)
    val thr = scored.select(s.as("__s"))
      .withColumn("q", ntile(buckets).over(Window.orderBy(col("__s"))))
      .filter(col("q") < buckets)
      .groupBy(col("q")).agg(max(col("__s")).as("thr"))
    scored.crossJoin(broadcast(thr))
      .groupBy(col("q"), col("thr"))
      .agg(
        sum(when(l && s > col("thr"), 1L).otherwise(0L)).as("tp"),
        sum(when(!l && s > col("thr"), 1L).otherwise(0L)).as("fp"),
        sum(when(l && !(s > col("thr")), 1L).otherwise(0L)).as("fn"),
        sum(when(!l && !(s > col("thr")), 1L).otherwise(0L)).as("tn"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp")).cast("double")))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn")).cast("double")))
  }

  /** Reliability (calibration) report: bin documents on a FIXED
    * milli-score grid and compare each bin's mean predicted score with
    * its empirical positive rate — the "is the score honest as a
    * probability proxy" complement of [[prCurve]]'s operating-point
    * sweep (a well-RANKED scorer can still be badly calibrated after
    * resampling or loss reweighting; this report catches that).
    *
    * Scores are quantized to integer MILLI-units first
    * (`floor(s*1000 + 0.5)` — the shared grid rule, NOT `round(x, 3)`;
    * see [[TreeEnsemble.quant6Sql]]), so the per-bin score sum is an
    * exact int64 and every output is a single divide of exact integers —
    * bitwise across engines and partitionings (a raw float score sum
    * would be accumulation-order-dependent). Bin assignment clamps into
    * [0, bins) BEFORE the integer divide, so truncating (Spark `div`)
    * and flooring (DuckDB `//`) division agree: operands are
    * non-negative. Out-of-grid scores land in the edge bins (their
    * `mean_score` can therefore sit outside [lo_milli, hi_milli) — the
    * usual open-ended-edge-bin convention).
    *
    * Scale: one narrow projection + one `bins`-row aggregation with
    * map-side partials — no corpus-sized shuffle at all. Empty bins are
    * absent from the output (all their counts are zero). */
  def calibrationBins(scored: DataFrame, score: String, label: String,
                      loMilli: Long, binMilli: Long, bins: Int): DataFrame = {
    require(binMilli > 0 && bins > 0, s"bad calibration grid: $binMilli x $bins")
    val l = col(label)
    scored
      .withColumn("__sm",
        floor(col(score) * lit(1000.0) + lit(0.5)).cast("long"))
      .withColumn("bin",
        least(
          expr(s"(greatest(__sm, ${loMilli}L) - ${loMilli}L) div ${binMilli}L"),
          lit((bins - 1).toLong)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(l, 1L).otherwise(0L)).as("n_pos"),
        sum(col("__sm")).as("sum_milli"))
      .withColumn("lo_milli", lit(loMilli) + col("bin") * lit(binMilli))
      .withColumn("hi_milli", lit(loMilli) + (col("bin") + lit(1L)) * lit(binMilli))
      .withColumn("mean_score",
        col("sum_milli").cast("double")
          / (lit(1000.0) * col("n").cast("double")))
      .withColumn("frac_pos",
        col("n_pos").cast("double") / col("n").cast("double"))
      .select(col("bin"), col("lo_milli"), col("hi_milli"), col("n"),
        col("n_pos"), col("mean_score"), col("frac_pos"))
  }

  /** DuckDB mirror of [[calibrationBins]] (same milli grid, same clamp
    * order, same divide shapes). */
  def duckCalibrationSql(scoredSql: String, score: String, label: String,
                         loMilli: Long, binMilli: Long, bins: Int): String =
    s"""WITH scored AS (SELECT * FROM ($scoredSql) src),
       |q AS (
       |  SELECT CAST(floor($score * CAST(1000.0 AS DOUBLE)
       |                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS sm,
       |    $label AS lbl
       |  FROM scored),
       |b AS (
       |  SELECT least((greatest(sm, $loMilli) - $loMilli) // $binMilli,
       |               ${bins - 1}) AS bin,
       |    sm, lbl
       |  FROM q)
       |SELECT bin,
       |  $loMilli + bin * $binMilli AS lo_milli,
       |  $loMilli + (bin + 1) * $binMilli AS hi_milli,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  CAST(sum(sm) AS DOUBLE)
       |    / (CAST(1000.0 AS DOUBLE) * CAST(count(*) AS DOUBLE))
       |    AS mean_score,
       |  CAST(sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS frac_pos
       |FROM b GROUP BY bin""".stripMargin

  /** Isotonic (monotone) calibration fit over the reliability bins — the
    * pool-adjacent-violators regression, computed by PAV's minimax
    * characterization `iso(i) = max_{j≤i} min_{k≥i} mean(y, j..k)`
    * instead of the sequential pooling loop: every candidate segment mean
    * comes from two exact cumulative int64 sums (ONE IEEE divide each),
    * and the min/max lattice over the ≤ bins³ (i, j, k) triples is pure
    * comparison — no float accumulation anywhere, bitwise across engines.
    *
    * == Scale shape ==
    * The corpus touches ONLY [[calibrationBins]]' narrow projection +
    * bins-row aggregation; everything after is model-sized (`bins` ≤ a
    * few dozen → the triple grid is thousands of rows), so the global-
    * order cumsum window and the two tiny aggregations cost nothing at
    * any corpus size. The output is the serving-side calibration map:
    * monotone `iso_rate` per score bin, the lookup table a scorer applies
    * with one broadcast join. */
  def isotonicFit(scored: DataFrame, score: String, label: String,
                  loMilli: Long, binMilli: Long, bins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = calibrationBins(scored, score, label, loMilli, binMilli, bins)
      .select(col("bin"), col("lo_milli"), col("n"), col("n_pos"),
        col("frac_pos"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = b.select(col("bin"), col("n"), col("n_pos"),
      sum(col("n")).over(w).as("cn"), sum(col("n_pos")).over(w).as("cp"))
    val segStart = cum.select(col("bin").as("j"),
      (col("cn") - col("n")).as("cn_jm1"),
      (col("cp") - col("n_pos")).as("cp_jm1"))
    val segEnd = cum.select(col("bin").as("k"), col("cn").as("cn_k"),
      col("cp").as("cp_k"))
    val pairs = segStart.join(segEnd, col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("cp_k") - col("cp_jm1")).cast("double")
          / (col("cn_k") - col("cn_jm1")).cast("double")).as("m"))
    val minByJ = b.select(col("bin").as("i"))
      .join(pairs, col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j")).agg(min(col("m")).as("mn"))
    val iso = minByJ.groupBy(col("i")).agg(max(col("mn")).as("iso_rate"))
    b.join(iso, col("bin") === col("i"))
      .select(col("bin"), col("lo_milli"), col("n"), col("n_pos"),
        col("frac_pos"), col("iso_rate"))
  }

  /** DuckDB mirror of [[isotonicFit]] — same bins, cumsums, and minimax
    * lattice. */
  def duckIsotonicSql(scoredSql: String, score: String, label: String,
                      loMilli: Long, binMilli: Long, bins: Int): String =
    s"""WITH bcal AS (
       |  SELECT bin, lo_milli, n, n_pos, frac_pos
       |  FROM (${duckCalibrationSql(scoredSql, score, label,
                                     loMilli, binMilli, bins)}) q0),
       |cum AS (
       |  SELECT bin, n, n_pos,
       |    CAST(sum(n) OVER (ORDER BY bin
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
       |    CAST(sum(n_pos) OVER (ORDER BY bin
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp
       |  FROM bcal),
       |pairs AS (
       |  SELECT a.bin AS j, k.bin AS k,
       |    CAST(k.cp - (a.cp - a.n_pos) AS DOUBLE)
       |      / CAST(k.cn - (a.cn - a.n) AS DOUBLE) AS m
       |  FROM cum a JOIN cum k ON a.bin <= k.bin),
       |minbyj AS (
       |  SELECT i.bin AS i, p.j, min(p.m) AS mn
       |  FROM bcal i JOIN pairs p ON p.j <= i.bin AND p.k >= i.bin
       |  GROUP BY 1, 2),
       |iso AS (
       |  SELECT i, max(mn) AS iso_rate FROM minbyj GROUP BY 1)
       |SELECT b.bin, b.lo_milli, b.n, b.n_pos, b.frac_pos, s.iso_rate
       |FROM bcal b JOIN iso s ON s.i = b.bin""".stripMargin

  /** DuckDB mirror of [[prCurve]]. */
  def duckPrCurveSql(scoredSql: String, score: String, label: String,
                     buckets: Int): String =
    s"""WITH scored AS (SELECT * FROM ($scoredSql) src),
       |t AS (
       |  SELECT CAST(q AS INTEGER) AS q, max(s) AS thr
       |  FROM (SELECT $score AS s,
       |          ntile($buckets) OVER (ORDER BY $score) AS q
       |        FROM scored)
       |  WHERE q < $buckets GROUP BY q),
       |a AS (
       |  SELECT t.q, t.thr,
       |    CAST(sum(CASE WHEN $label AND $score > t.thr
       |             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN NOT $label AND $score > t.thr
       |             THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN $label AND NOT ($score > t.thr)
       |             THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN NOT $label AND NOT ($score > t.thr)
       |             THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM scored CROSS JOIN t GROUP BY t.q, t.thr)
       |SELECT q, thr, tp, fp, fn, tn,
       |  CASE WHEN tp + fp > 0 THEN
       |    CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
       |  CASE WHEN tp + fn > 0 THEN
       |    CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall
       |FROM a""".stripMargin
}
