package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential drift ALARM over the event stream: a two-sided CUSUM
  * control chart (Page 1954) per event type on its daily mean value
  * series — the monitoring complement of the snapshot drift screens
  * (PSI / KS / JSD / centroid drift compare two distributions; CUSUM
  * accumulates small persistent shifts over TIME and fires mid-series,
  * its first-alarm index estimating the change point).
  *
  * == Exactness ==
  * Daily means are exact integer micro-dollars
  * (`(Σcents·10⁴) intdiv n` — floor division, identical both engines);
  * the per-type reference μ is the integer mean of the daily means; the
  * CUSUM recursion is pure int64 ([[graft.functions.expressions
  * .CusumStats]]; the DuckDB mirror replays it as a recursive CTE — the
  * envelope-scan oracle pattern) and its summary (alarm counts, first
  * indices, final states) pins the whole trajectory.
  *
  * == Scale shape ==
  * One (type, day)-keyed aggregation with map-side partials is the only
  * corpus exchange; the series tables are |types|×days — model-sized —
  * so the collect_list per type is bounded by the monitoring horizon,
  * never the event count. */
object Cusum {

  val DayUs = 86400000000L

  /** One row per event type: (event_type, n_days, mu_micro, n_up,
    * n_down, first_up, first_down). k/h in micro-dollars. */
  def dailyValueCusum(events: DataFrame, kMicro: Long,
      hMicro: Long): DataFrame = {
    graft.functions.expressions.register(events.sparkSession)
    val daily = events
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(col("event_type"),
        expr(s"ts_us DIV ${DayUs}L").as("day"))
      .agg(sum(col("cents")).as("sc"), count(lit(1)).as("n"))
      .selectExpr("event_type", "day", "(sc * 10000L) DIV n AS x")
    daily.groupBy(col("event_type"))
      .agg(expr("transform(sort_array(collect_list(struct(day, x))), " +
        "e -> e.x)").as("xs"),
        sum(col("x")).as("sx"), count(lit(1)).as("nd"))
      .selectExpr("event_type", "CAST(nd AS BIGINT) AS n_days",
        "sx DIV nd AS mu_micro", "xs")
      .selectExpr("event_type", "n_days", "mu_micro",
        s"graft_cusum(xs, mu_micro, ${kMicro}L, ${hMicro}L) AS st")
      .selectExpr("event_type", "n_days", "mu_micro",
        "element_at(st, 1) AS n_up", "element_at(st, 2) AS n_down",
        "element_at(st, 3) AS first_up", "element_at(st, 4) AS first_down")
  }

  /** DuckDB mirror of [[dailyValueCusum]] — the same integer recursion
    * replayed as a recursive CTE over per-type day indices. */
  def duckSql(kMicro: Long, hMicro: Long,
      table: String = "events"): String =
    s"""WITH RECURSIVE daily AS (
       |  SELECT event_type, day, (sc * 10000) // n AS x
       |  FROM (
       |    SELECT event_type,
       |      epoch_us(CAST(ts AS TIMESTAMP)) // $DayUs AS day,
       |      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
       |        AS sc,
       |      count(*) AS n
       |    FROM $table
       |    GROUP BY 1, 2)),
       |idx AS (
       |  SELECT event_type, x,
       |    row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
       |      AS t
       |  FROM daily),
       |mu AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       |    CAST(sum(x) AS BIGINT) // count(*) AS mu_micro
       |  FROM daily GROUP BY 1),
       |rec AS (
       |  SELECT event_type, CAST(-1 AS BIGINT) AS t,
       |    CAST(0 AS BIGINT) AS s_up, CAST(0 AS BIGINT) AS s_dn,
       |    CAST(0 AS BIGINT) AS n_up, CAST(0 AS BIGINT) AS n_dn,
       |    CAST(-1 AS BIGINT) AS first_up, CAST(-1 AS BIGINT) AS first_dn
       |  FROM mu
       |  UNION ALL
       |  SELECT r.event_type, r.t + 1,
       |    CASE WHEN greatest(0, r.s_up + (i.x - m.mu_micro - $kMicro))
       |              > $hMicro THEN 0
       |         ELSE greatest(0, r.s_up + (i.x - m.mu_micro - $kMicro))
       |    END,
       |    CASE WHEN greatest(0, r.s_dn + (m.mu_micro - i.x - $kMicro))
       |              > $hMicro THEN 0
       |         ELSE greatest(0, r.s_dn + (m.mu_micro - i.x - $kMicro))
       |    END,
       |    r.n_up + CASE WHEN greatest(0,
       |        r.s_up + (i.x - m.mu_micro - $kMicro)) > $hMicro
       |      THEN 1 ELSE 0 END,
       |    r.n_dn + CASE WHEN greatest(0,
       |        r.s_dn + (m.mu_micro - i.x - $kMicro)) > $hMicro
       |      THEN 1 ELSE 0 END,
       |    CASE WHEN r.first_up < 0 AND greatest(0,
       |        r.s_up + (i.x - m.mu_micro - $kMicro)) > $hMicro
       |      THEN r.t + 1 ELSE r.first_up END,
       |    CASE WHEN r.first_dn < 0 AND greatest(0,
       |        r.s_dn + (m.mu_micro - i.x - $kMicro)) > $hMicro
       |      THEN r.t + 1 ELSE r.first_dn END
       |  FROM rec r
       |  JOIN idx i ON i.event_type = r.event_type AND i.t = r.t + 1
       |  JOIN mu m ON m.event_type = r.event_type)
       |SELECT rec.event_type, mu.n_days, mu.mu_micro,
       |  rec.n_up, rec.n_dn AS n_down, rec.first_up,
       |  rec.first_dn AS first_down
       |FROM rec
       |JOIN mu ON mu.event_type = rec.event_type
       |WHERE rec.t = mu.n_days - 1""".stripMargin
}
