package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First-order behavioral Markov model over the event stream: the
  * event-type transition matrix, estimated per SESSION (a transition
  * only counts when the gap to the previous event is within the session
  * horizon — cross-session "transitions" are spurious). The model behind
  * funnel analysis, next-action prediction baselines and bot-pattern
  * screens (a scripted client's transition rows are near-deterministic;
  * a human's are mixed).
  *
  * Exactness: ordering is `(ts_us, event_id)` — a total order, so the
  * lag pairs are unique under any partitioning; counts are exact int64
  * and each probability is ONE IEEE divide of exact integers (bitwise
  * both engines). Scale: one user-keyed window (the sessionize exchange)
  * + a |types|²-sized count aggregation with map-side partials — the
  * model table is alphabet-sized, never corpus-sized. */
object Markov {

  /** (from_type, to_type, cnt, row_total, p) — rows normalize over the
    * outgoing type. */
  def transitions(events: DataFrame, sessionGapUs: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val pairs = events
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .filter(col("prev_type").isNotNull &&
        col("ts_us") - col("prev_us") <= sessionGapUs)
    val counts = pairs
      .groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val rowTot = counts.groupBy(col("from_type"))
      .agg(sum(col("cnt")).as("row_total"))
    counts.join(rowTot, Seq("from_type"))
      .selectExpr("from_type", "to_type", "cnt", "row_total",
        "CAST(cnt AS DOUBLE) / CAST(row_total AS DOUBLE) AS p")
  }

  /** Empirical entropy rate of the session transition chain —
    * `H = −Σ_ij (c_ij/N)·ln(c_ij/n_i)` in nats (c from
    * [[transitions]]; N total transitions, n_i the from-state mass): the
    * one-number predictability score. Low H = near-deterministic
    * behavior (scripted client / template bot); high H = mixed organic
    * behavior. Exact: each `ln` of an exact integer ratio is micro-nat
    * quantized once per (from, to) CELL ([[LanguageModel]] discipline),
    * the weighted sum `Σ c_ij·mn_ij` is an exact order-free int64, and H
    * is ONE divide. Alphabet-sized everything after the transition
    * count. */
  def entropyRate(events: DataFrame, sessionGapUs: Long): DataFrame = {
    val t = transitions(events, sessionGapUs)
    t.selectExpr("cnt", "row_total",
        """cnt * CAST(round(ln(CAST(row_total AS DOUBLE)
          |  / CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT) AS wmn"""
          .stripMargin)
      .agg(sum(col("cnt")).as("n_transitions"),
        sum(col("wmn")).as("__s"))
      .selectExpr("n_transitions",
        "CAST(__s AS DOUBLE) / CAST(n_transitions AS DOUBLE)" +
          " / CAST(1000000 AS DOUBLE) AS entropy_rate_nats")
  }

  /** DuckDB mirror of [[entropyRate]]. */
  def duckEntropyRateSql(sessionGapUs: Long,
      table: String = "events"): String =
    s"""WITH t AS (${duckSql(sessionGapUs, table)})
       |SELECT CAST(sum(cnt) AS BIGINT) AS n_transitions,
       |  CAST(sum(cnt * CAST(round(ln(CAST(row_total AS DOUBLE)
       |      / CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT)) AS DOUBLE)
       |    / CAST(sum(cnt) AS DOUBLE) / CAST(1000000 AS DOUBLE)
       |    AS entropy_rate_nats
       |FROM t""".stripMargin

  /** Cohort retention table — the product-analytics standard read over
    * the event stream: users grouped by FIRST-ACTIVITY week (cohort),
    * and for each week offset `w ≥ 0` the count and fraction of the
    * cohort active in cohort-week + w. Weeks are pure integer arithmetic
    * on microsecond epochs (`ts_us div 7·86400·10⁶` — fixed 7-day bins,
    * no calendar/timezone ambiguity to diverge on), the fraction ONE
    * IEEE divide of exact counts.
    *
    * Scale: one user-keyed min-aggregation (first week), one distinct
    * (user, week) pass joined back on user (co-partitioned with the
    * first exchange), and a (cohort, offset)-keyed count — the output is
    * weeks²-sized, never user-sized. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val WeekUs = 7L * 86400 * 1000000
    val uw = events
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .select(col("user_id"), expr(s"ts_us DIV ${WeekUs}L").as("week"))
      .distinct()
    val first = uw.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
    val cohortSize = first.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_users"))
    uw.join(first, Seq("user_id"))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(cohortSize, Seq("cohort"))
      .selectExpr("cohort", "offset", "n_active", "cohort_users",
        "CAST(n_active AS DOUBLE) / CAST(cohort_users AS DOUBLE)" +
          " AS retention")
  }

  /** DuckDB mirror of [[retentionCohorts]]. */
  def duckRetentionSql(table: String = "events"): String = {
    val weekUs = 7L * 86400 * 1000000
    s"""WITH uw AS (
       |  SELECT DISTINCT user_id,
       |    epoch_us(CAST(ts AS TIMESTAMP)) // $weekUs AS week
       |  FROM $table),
       |f AS (SELECT user_id, min(week) AS cohort FROM uw GROUP BY 1),
       |cs AS (SELECT cohort, count(*) AS cohort_users FROM f GROUP BY 1)
       |SELECT a.cohort, a.offset, a.n_active, cs.cohort_users,
       |  CAST(a.n_active AS DOUBLE) / CAST(cs.cohort_users AS DOUBLE)
       |    AS retention
       |FROM (
       |  SELECT f.cohort, uw.week - f.cohort AS offset,
       |    count(*) AS n_active
       |  FROM uw JOIN f USING (user_id)
       |  GROUP BY 1, 2) a
       |JOIN cs USING (cohort)""".stripMargin
  }

  /** Ordered funnel conversion — the third classic product read next to
    * [[transitions]] and [[retentionCohorts]]: for a declared step
    * sequence, a user REACHES step k when their first occurrences are
    * time-ordered `t₁ ≤ t₂ ≤ … ≤ t_k` (first-touch attribution). Per
    * step: users reached, conversion from the previous step and from the
    * top — all exact counts, each fraction one IEEE divide.
    *
    * Scale: one user-keyed min-per-type aggregation (conditional mins in
    * a single pass — no per-step scans), then a steps-sized rollup. The
    * step list is a literal; the reached-k predicate is a pure column
    * conjunction. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "a funnel needs >= 2 steps")
    val spark = events.sparkSession
    import spark.implicits._
    val minCols = steps.zipWithIndex.map { case (st, i) =>
      min(when(col("event_type") === st, col("ts_us"))).as(s"t$i")
    }
    val mins = events
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .groupBy(col("user_id"))
      .agg(minCols.head, minCols.tail: _*)
    def reached(k: Int): String =
      (0 to k).map(i => s"t$i IS NOT NULL")
        .mkString("", " AND ", "") +
        (1 to k).map(i => s" AND t${i - 1} <= t$i").mkString
    val nCols = steps.indices.map(k =>
      sum(expr(s"IF(${reached(k)}, 1L, 0L)")).as(s"n$k"))
    val counts = mins.agg(nCols.head, nCols.tail: _*)
    val rows = steps.indices.map(k =>
      (k + 1, steps(k), s"n$k")).toDF("step", "event_type", "__col")
    // steps-sized cross join against the 1-row count table
    rows.crossJoin(broadcast(counts))
      .selectExpr("step", "event_type",
        s"CASE ${steps.indices.map(k => s"WHEN step = ${k + 1} THEN n$k")
          .mkString(" ")} END AS n_reached",
        s"CASE WHEN step = 1 THEN CAST(NULL AS DOUBLE) ${
          (1 until steps.size).map(k =>
            s"WHEN step = ${k + 1} THEN CASE WHEN n${k - 1} = 0" +
              s" THEN CAST(NULL AS DOUBLE)" +
              s" ELSE CAST(n$k AS DOUBLE) / CAST(n${k - 1} AS DOUBLE) END")
            .mkString(" ")} END AS conv_prev",
        s"""CASE WHEN n0 = 0 THEN CAST(NULL AS DOUBLE)
           |ELSE CAST(CASE ${steps.indices.map(k =>
          s"WHEN step = ${k + 1} THEN n$k").mkString(" ")} END AS DOUBLE)
           |  / CAST(n0 AS DOUBLE) END AS conv_top""".stripMargin)
  }

  /** DuckDB mirror of [[funnel]]. */
  def duckFunnelSql(steps: Seq[String],
      table: String = "events"): String = {
    val minsCols = steps.zipWithIndex.map { case (st, i) =>
      s"min(CASE WHEN event_type = '$st' THEN ts_us END) AS t$i"
    }.mkString(",\n    ")
    def reached(k: Int): String =
      (0 to k).map(i => s"t$i IS NOT NULL").mkString(" AND ") +
        (1 to k).map(i => s" AND t${i - 1} <= t$i").mkString
    val nCols = steps.indices.map(k =>
      s"CAST(sum(CASE WHEN ${reached(k)} THEN 1 ELSE 0 END) AS BIGINT)" +
        s" AS n$k").mkString(",\n    ")
    val stepRows = steps.zipWithIndex.map { case (st, k) =>
      s"(${k + 1}, '$st')" }.mkString(", ")
    s"""WITH mins AS (
       |  SELECT user_id,
       |    $minsCols
       |  FROM (SELECT user_id, event_type,
       |          epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM $table)
       |  GROUP BY 1),
       |c AS (
       |  SELECT
       |    $nCols
       |  FROM mins),
       |st(step, event_type) AS (VALUES $stepRows)
       |SELECT st.step, st.event_type,
       |  CASE ${steps.indices.map(k =>
      s"WHEN st.step = ${k + 1} THEN c.n$k").mkString(" ")} END
       |    AS n_reached,
       |  CASE WHEN st.step = 1 THEN CAST(NULL AS DOUBLE) ${
      (1 until steps.size).map(k =>
        s"WHEN st.step = ${k + 1} THEN CASE WHEN c.n${k - 1} = 0" +
          s" THEN CAST(NULL AS DOUBLE)" +
          s" ELSE CAST(c.n$k AS DOUBLE) / CAST(c.n${k - 1} AS DOUBLE) END")
        .mkString(" ")} END AS conv_prev,
       |  CASE WHEN c.n0 = 0 THEN CAST(NULL AS DOUBLE)
       |    ELSE CAST(CASE ${steps.indices.map(k =>
      s"WHEN st.step = ${k + 1} THEN c.n$k").mkString(" ")} END AS DOUBLE)
       |      / CAST(c.n0 AS DOUBLE) END AS conv_top
       |FROM st CROSS JOIN c""".stripMargin
  }

  /** DuckDB mirror of [[transitions]]. */
  def duckSql(sessionGapUs: Long, table: String = "events"): String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, event_type,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
       |  FROM $table),
       |lagged AS (
       |  SELECT event_type,
       |    lag(event_type) OVER w AS prev_type,
       |    ts_us - lag(ts_us) OVER w AS gap
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |c AS (
       |  SELECT prev_type AS from_type, event_type AS to_type,
       |    count(*) AS cnt
       |  FROM lagged
       |  WHERE prev_type IS NOT NULL AND gap <= $sessionGapUs
       |  GROUP BY 1, 2),
       |rt AS (
       |  SELECT from_type, CAST(sum(cnt) AS BIGINT) AS row_total
       |  FROM c GROUP BY 1)
       |SELECT c.from_type, c.to_type, CAST(c.cnt AS BIGINT) AS cnt,
       |  rt.row_total,
       |  CAST(c.cnt AS DOUBLE) / CAST(rt.row_total AS DOUBLE) AS p
       |FROM c JOIN rt USING (from_type)""".stripMargin
}
