package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Oracle-checked queries over the `events` stream table (event-time
  * operators on a genuine timestamp column: as-of join, gap sessionization,
  * lag/lead/rank, running aggregates). Time arithmetic is done on exact
  * microsecond longs (`unix_micros` / `epoch_us`) so Spark and DuckDB agree
  * bitwise; money-like running sums use exact integer cents. */
object EventQueries {

  /** Session gap: 30 minutes, in microseconds. */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** As-of freshness budget: 1 hour, in microseconds. */
  val AsOfTolUs: Long = 60L * 60 * 1000000

  /** Label-attribution horizon: 1 day, in microseconds. */
  val LabelHorizonUs: Long = 24L * 60 * 60 * 1000000

  /** Multi-horizon trailing feature widths: 1 h, 1 d, 7 d (microseconds). */
  val TrailingWindowsUs: Seq[Long] =
    Seq(AsOfTolUs, LabelHorizonUs, 7L * LabelHorizonUs)

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // gap-based sessionization per user (session_window batch analog)
    "events_sessionize" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      ev.withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .withColumn("is_new",
          when(col("gap").isNull || col("gap") > SessionGapUs, 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("is_new")).as("n_sessions"),
          min(col("ts_us")).as("first_us"),
          max(col("ts_us")).as("last_us"))
    }),

    // as-of join: each click gets the latest view's value at-or-before it
    "events_asof" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      val probes = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      val series = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_us").as("v_us"), col("value"))
      AsOfJoin.asOf(probes, series, "user_id", "ts_us", "v_us", Seq("value"))
        .withColumnRenamed("value", "last_view_value")
    }),

    // staleness-bounded as-of: a view older than 1 h is no feature at all
    "events_asof_tol" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      val probes = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      val series = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_us").as("v_us"), col("value"))
      AsOfJoin.asOfTolerance(probes, series, "user_id", "ts_us", "v_us",
          Seq("value"), tolerance = AsOfTolUs)
        .withColumnRenamed("value", "fresh_view_value")
    }),

    // label attribution: first purchase strictly after each click, within
    // 1 day — the outcome-join that turns events into training labels
    "events_label_join" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      val probes = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      val outcomes = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("o_us"), col("value"))
      AsOfJoin.leadJoin(probes, outcomes, "user_id", "ts_us", "o_us",
          Seq("value"), horizon = LabelHorizonUs,
          defaults = Map("value" -> lit(0.0)))
        .withColumnRenamed("value", "label_purchase_value")
    }),

    // trailing point-in-time window feature: purchases in the 24 h before
    // each click (count + exact-cents sum; empty history = 0, not null)
    "events_trailing" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("cents", round(col("value") * 100).cast("long"))
      val probes = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      val series = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("p_us"), col("cents"))
      graft.operators.WindowFeatures.trailingAgg(probes, series,
        "user_id", "ts_us", "p_us", "cents", window = LabelHorizonUs)
    }),

    // multi-horizon trailing features (1 h / 1 d / 7 d) in ONE window pass
    "events_trailing_multi" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("cents", round(col("value") * 100).cast("long"))
      val probes = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      val series = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("p_us"), col("cents"))
      graft.operators.WindowFeatures.trailingAggMulti(probes, series,
        "user_id", "ts_us", "p_us", "cents", TrailingWindowsUs)
    }),

    // FLAGSHIP composition: leakage-free training-set assembly — as-of
    // state feature (1 h freshness) + 3-horizon trailing history + 1-day
    // forward label, all from one declarative plan
    "training_set" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("cents", round(col("value") * 100).cast("long"))
      graft.features.TrainingSet.assemble(
        probes = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("ts_us")),
        state = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts_us").as("v_us"), col("value")),
        stateTs = "v_us", stateVal = "value",
        outcomes = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us").as("o_us"), col("cents")),
        outcomeTs = "o_us", outcomeVal = "cents",
        key = "user_id", probeTs = "ts_us",
        freshness = AsOfTolUs, horizons = TrailingWindowsUs,
        labelH = LabelHorizonUs)
    }),

    // lag / lead / rank / running exact-integer sum per user
    "events_window" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("cents", round(col("value") * 100).cast("long"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      ev.select(col("event_id"), col("user_id"),
        row_number().over(w).as("rn"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        sum(col("cents")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum_cents"))
    })
  )

  def oracles: Map[String, String] = Map(

    "events_sessionize" ->
      s"""WITH ev AS (SELECT *, epoch_us(ts) AS ts_us FROM events),
         |g AS (
         |  SELECT user_id, ts_us,
         |    ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS gap
         |  FROM ev)
         |SELECT user_id,
         |  count(*) AS n_events,
         |  CAST(sum(CASE WHEN gap IS NULL OR gap > $SessionGapUs THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_sessions,
         |  min(ts_us) AS first_us,
         |  max(ts_us) AS last_us
         |FROM g GROUP BY user_id""".stripMargin,

    "events_asof" ->
      """WITH ev AS (SELECT *, epoch_us(ts) AS ts_us FROM events),
        |probes AS (SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'click'),
        |ser AS (SELECT user_id, ts_us AS v_us, value FROM ev WHERE event_type = 'view')
        |SELECT p.user_id, p.event_id, p.ts_us, s.value AS last_view_value
        |FROM probes p ASOF LEFT JOIN ser s
        |  ON p.user_id = s.user_id AND p.ts_us >= s.v_us""".stripMargin,

    "events_asof_tol" ->
      s"""WITH ev AS (SELECT *, epoch_us(ts) AS ts_us FROM events),
        |probes AS (SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'click'),
        |ser AS (SELECT user_id, ts_us AS v_us, value FROM ev WHERE event_type = 'view')
        |SELECT p.user_id, p.event_id, p.ts_us,
        |  CASE WHEN p.ts_us - s.v_us <= ${AsOfTolUs}
        |       THEN s.value END AS fresh_view_value
        |FROM probes p ASOF LEFT JOIN ser s
        |  ON p.user_id = s.user_id AND p.ts_us >= s.v_us""".stripMargin,

    "events_label_join" ->
      s"""WITH ev AS (SELECT *, epoch_us(ts) AS ts_us FROM events),
        |probes AS (SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'click'),
        |outc AS (SELECT user_id, ts_us AS o_us, value FROM ev WHERE event_type = 'purchase')
        |SELECT p.user_id, p.event_id, p.ts_us,
        |  CASE WHEN o.o_us IS NOT NULL AND o.o_us - p.ts_us <= ${LabelHorizonUs}
        |       THEN o.value ELSE 0.0e0 END AS label_purchase_value
        |FROM probes p ASOF LEFT JOIN outc o
        |  ON p.user_id = o.user_id AND p.ts_us < o.o_us""".stripMargin,

    "events_trailing" -> graft.operators.WindowFeatures.duckTrailingSql(
      "click", "purchase", LabelHorizonUs),

    "events_trailing_multi" ->
      graft.operators.WindowFeatures.duckTrailingMultiSql(
        "click", "purchase", TrailingWindowsUs),

    "training_set" -> {
      val histCols = TrailingWindowsUs.indices
        .flatMap(i => Seq(s"w_n_$i", s"w_sum_$i")).mkString(", ")
      s"""WITH st AS (
         |  WITH ev AS (SELECT *, epoch_us(ts) AS ts_us FROM events),
         |  probes AS (SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'click'),
         |  ser AS (SELECT user_id, ts_us AS v_us, value FROM ev WHERE event_type = 'view')
         |  SELECT p.user_id, p.event_id, p.ts_us,
         |    CASE WHEN p.ts_us - s.v_us <= $AsOfTolUs THEN s.value END AS f_state
         |  FROM probes p ASOF LEFT JOIN ser s
         |    ON p.user_id = s.user_id AND p.ts_us >= s.v_us),
         |hist AS (
         |  ${graft.operators.WindowFeatures
                .duckTrailingMultiSql("click", "purchase", TrailingWindowsUs)
                .replace("\n", "\n  ")}),
         |lab AS (
         |  WITH ev AS (SELECT *, epoch_us(ts) AS ts_us,
         |                     CAST(round(value * 100) AS BIGINT) AS cents
         |             FROM events),
         |  probes AS (SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'click'),
         |  outc AS (SELECT user_id, ts_us AS o_us, cents FROM ev WHERE event_type = 'purchase')
         |  SELECT p.event_id,
         |    CASE WHEN o.o_us IS NOT NULL AND o.o_us - p.ts_us <= $LabelHorizonUs
         |         THEN o.cents ELSE CAST(0 AS BIGINT) END AS label
         |  FROM probes p ASOF LEFT JOIN outc o
         |    ON p.user_id = o.user_id AND p.ts_us < o.o_us)
         |SELECT st.user_id, st.event_id, st.ts_us, st.f_state,
         |  $histCols, lab.label
         |FROM st
         |JOIN hist ON hist.event_id = st.event_id
         |JOIN lab ON lab.event_id = st.event_id""".stripMargin
    },

    "events_window" ->
      """WITH ev AS (SELECT *, epoch_us(ts) AS ts_us,
        |                    CAST(round(value * 100) AS BIGINT) AS cents
        |            FROM events)
        |SELECT event_id, user_id,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  lag(value) OVER w AS prev_value,
        |  lead(value) OVER w AS next_value,
        |  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)""".stripMargin
  )
}
