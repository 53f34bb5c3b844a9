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
