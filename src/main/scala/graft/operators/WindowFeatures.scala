package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing event-time window features: for every probe `(key, t)`, count
  * and sum the series events with `ts ∈ [t − window, t)` — "purchases in
  * the 7 days before this click", the standard point-in-time aggregate
  * feature next to the as-of join's "latest value". The upper bound is
  * STRICTLY before `t`: an event simultaneous with the probe is not part
  * of its history (zero temporal leakage, the same causality rule as
  * [[AsOfJoin.leadJoin]]'s strict lower bound).
  *
  * == Plan shape ==
  * The same union-tagging as [[AsOfJoin]]: series rows carry the value,
  * probe rows ride along, ONE hash exchange on the key + one sort on
  * `(ts, side)`, then a `RANGE BETWEEN window PRECEDING AND 1 PRECEDING`
  * frame — Spark's window operator keeps a sliding frame over the sorted
  * run, so cost is linear in events per key, never probe × series. The
  * range frame needs an integer timestamp (`-1` = strictly before); use
  * microsecond longs. Aggregates over exact integers (counts, integer
  * cents) are order-independent — bitwise across engines and
  * partitionings. */
object WindowFeatures {

  /** @param probes  `key`, `probeTs` (+ any other columns, preserved)
    * @param series  `key`, `seriesTs`, `valueCol` (integer-exact — cents,
    *                counts; float sums would be order-dependent)
    * @param window  trailing width in ts units (inclusive lower bound)
    * @return probes + `w_n` (event count) + `w_sum` (value sum, 0 when
    *         empty — an empty history is a real feature value, not null)
    */
  def trailingAgg(
      probes: DataFrame,
      series: DataFrame,
      key: String,
      probeTs: String,
      seriesTs: String,
      valueCol: String,
      window: Long): DataFrame = {
    val probeCols = probes.columns.toSeq
    val ts = "__w_ts"
    val side = "__w_side"
    val v = "__w_v"
    val nonKey = probeCols.filterNot(_ == key)

    val s = series.select(
      col(key) +: col(seriesTs).cast("long").as(ts) +: lit(0).as(side) +:
        col(valueCol).cast("long").as(v) +:
        nonKey.map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val p = probes.select(
      col(key) +: col(probeTs).cast("long").as(ts) +: lit(1).as(side) +:
        lit(null).cast("long").as(v) +:
        nonKey.map(col): _*)

    val w = Window.partitionBy(col(key)).orderBy(col(ts))
      .rangeBetween(-window, -1L)

    s.unionByName(p)
      .select(col("*"),
        count(col(v)).over(w).as("w_n"),
        coalesce(sum(col(v)).over(w), lit(0L)).as("w_sum"))
      .filter(col(side) === 1)
      .select(probeCols.map(col) :+ col("w_n") :+ col("w_sum"): _*)
  }

  /** Multi-horizon form: one `(w_n_<i>, w_sum_<i>)` pair per window width,
    * ALL from a single exchange + sort — every frame shares the same
    * `(PARTITION BY key ORDER BY ts)` spec, so Catalyst collapses them
    * into ONE Window operator with k sliding frames over one sorted run
    * (the feature-store shape: 1 h / 1 d / 7 d trailing features priced at
    * one shuffle, not k). Same strictly-before bound as [[trailingAgg]]. */
  def trailingAggMulti(
      probes: DataFrame,
      series: DataFrame,
      key: String,
      probeTs: String,
      seriesTs: String,
      valueCol: String,
      windows: Seq[Long]): DataFrame = {
    val probeCols = probes.columns.toSeq
    val ts = "__w_ts"
    val side = "__w_side"
    val v = "__w_v"
    val nonKey = probeCols.filterNot(_ == key)

    val s = series.select(
      col(key) +: col(seriesTs).cast("long").as(ts) +: lit(0).as(side) +:
        col(valueCol).cast("long").as(v) +:
        nonKey.map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val p = probes.select(
      col(key) +: col(probeTs).cast("long").as(ts) +: lit(1).as(side) +:
        lit(null).cast("long").as(v) +:
        nonKey.map(col): _*)

    val aggCols = windows.zipWithIndex.flatMap { case (win, i) =>
      val w = Window.partitionBy(col(key)).orderBy(col(ts))
        .rangeBetween(-win, -1L)
      Seq(count(col(v)).over(w).as(s"w_n_$i"),
        coalesce(sum(col(v)).over(w), lit(0L)).as(s"w_sum_$i"))
    }
    s.unionByName(p)
      .select(col("*") +: aggCols: _*)
      .filter(col(side) === 1)
      .select(probeCols.map(col) ++ windows.indices.flatMap(i =>
        Seq(col(s"w_n_$i"), col(s"w_sum_$i"))): _*)
  }

  /** The ONE trailing-variance formula, shared by [[trailingStats]] and
    * its DuckDB mirror (population variance from the exact integer
    * moments — one fixed double tree, NULL over an empty window). */
  private val TrailingVarSql =
    "CASE WHEN w_n = 0 THEN CAST(NULL AS DOUBLE)" +
      " ELSE (CAST(w_n AS DOUBLE)*CAST(w_ss AS DOUBLE)" +
      " - CAST(w_sum AS DOUBLE)*CAST(w_sum AS DOUBLE))" +
      " / (CAST(w_n AS DOUBLE)*CAST(w_n AS DOUBLE)) END"

  /** Full trailing STAT BLOCK at probe time — count / sum / min / max /
    * population variance over `[t − window, t)`, the standard
    * feature-store descriptor set beyond the count+sum of
    * [[trailingAgg]]. Same one-exchange union trick (all five aggregates
    * share one frame spec → ONE Window operator, one sort); min/max are
    * NULL over an empty history (no neutral element), variance comes from
    * the exact int64 moments (Σv, Σv²) via a fixed double tree shared
    * with the oracle, so empty-window and single-event cases are bitwise
    * (0.0, not an epsilon). Σv² bounds the value domain: cents ≤ ~10⁵ ⇒
    * v² ≤ 10¹⁰, 10⁸ in-window events before int64 pressure. */
  def trailingStats(
      probes: DataFrame,
      series: DataFrame,
      key: String,
      probeTs: String,
      seriesTs: String,
      valueCol: String,
      window: Long): DataFrame = {
    val probeCols = probes.columns.toSeq
    val ts = "__w_ts"
    val side = "__w_side"
    val v = "__w_v"
    val nonKey = probeCols.filterNot(_ == key)
    val s = series.select(
      col(key) +: col(seriesTs).cast("long").as(ts) +: lit(0).as(side) +:
        col(valueCol).cast("long").as(v) +:
        nonKey.map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val p = probes.select(
      col(key) +: col(probeTs).cast("long").as(ts) +: lit(1).as(side) +:
        lit(null).cast("long").as(v) +:
        nonKey.map(col): _*)
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
      .rangeBetween(-window, -1L)
    s.unionByName(p)
      .select(col("*"),
        count(col(v)).over(w).as("w_n"),
        coalesce(sum(col(v)).over(w), lit(0L)).as("w_sum"),
        min(col(v)).over(w).as("w_min"),
        max(col(v)).over(w).as("w_max"),
        coalesce(sum(col(v) * col(v)).over(w), lit(0L)).as("w_ss"))
      .filter(col(side) === 1)
      .select(probeCols.map(col) ++ Seq(col("w_n"), col("w_sum"),
        col("w_min"), col("w_max"),
        expr(TrailingVarSql).as("w_var")): _*)
  }

  /** DuckDB mirror of [[trailingStats]] over the `events` view. */
  def duckTrailingStatsSql(probeType: String, seriesType: String,
                           window: Long): String =
    s"""WITH ev AS (SELECT *, epoch_us(ts) AS ts_us,
       |                    CAST(round(value * 100) AS BIGINT) AS cents
       |            FROM events),
       |u AS (
       |  SELECT user_id, ts_us, 0 AS side, cents,
       |         CAST(NULL AS BIGINT) AS event_id
       |  FROM ev WHERE event_type = '$seriesType'
       |  UNION ALL
       |  SELECT user_id, ts_us, 1 AS side, NULL AS cents, event_id
       |  FROM ev WHERE event_type = '$probeType'),
       |f AS (
       |  SELECT *,
       |    CAST(count(cents) OVER w AS BIGINT) AS w_n,
       |    CAST(coalesce(sum(cents) OVER w, 0) AS BIGINT) AS w_sum,
       |    CAST(min(cents) OVER w AS BIGINT) AS w_min,
       |    CAST(max(cents) OVER w AS BIGINT) AS w_max,
       |    CAST(coalesce(sum(cents * cents) OVER w, 0) AS BIGINT) AS w_ss
       |  FROM u
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
       |    RANGE BETWEEN $window PRECEDING AND 1 PRECEDING))
       |SELECT user_id, event_id, ts_us, w_n, w_sum, w_min, w_max,
       |  $TrailingVarSql AS w_var
       |FROM f WHERE side = 1""".stripMargin

  /** Half-life DECAYED COUNTER at probe time — the classic feature-store
    * recency-weighted event counter ("decayed counts" of ad/feed ranking
    * systems), computed EXACTLY: an event of age `a ≥ 1` (strictly before
    * the probe) contributes weight `2^(scalePow − k)` with
    * `k = ceil(a / H) − 1` half-life buckets elapsed (ages `1..H` are
    * bucket 0 — the strictly-before rule shifts the boundary by one tick),
    * and events older than `nBuckets` half-lives contribute 0. All contributions are powers of two in int64
    * micro-units, so sums are order-free and bitwise across engines —
    * no floating `exp(−λΔt)` anywhere (the continuous form's libm decay
    * is irreproducible across engines; bucketed half-life decay is the
    * standard production approximation and makes the counter exact).
    *
    * == Plan shape ==
    * The same union-tagging as [[trailingAgg]]: ONE hash exchange + ONE
    * sort, then `nBuckets` RANGE frames `[t−(k+1)H, t−kH−1]` sharing the
    * same `(PARTITION BY key ORDER BY ts)` spec — Catalyst collapses them
    * into a single Window operator with k sliding frames over one sorted
    * run; cost is linear in events per key, never probe × series.
    *
    * Overflow bound: `decay_n_micro ≤ n_recent · 2^scalePow`; with the
    * default `scalePow = 40` an int64 holds ~2^22 events in the newest
    * bucket per probe — raise `H` or lower `scalePow` for hotter keys.
    *
    * @return probes + `decay_n_micro` (Σ weights, i.e. the decayed event
    *         count scaled by `2^scalePow`) + `decay_sum_micro` (decayed
    *         value sum, same scale; `valueCol` must be integer-exact) */
  def decayedCounter(
      probes: DataFrame,
      series: DataFrame,
      key: String,
      probeTs: String,
      seriesTs: String,
      valueCol: String,
      halfLife: Long,
      nBuckets: Int = 16,
      scalePow: Int = 40): DataFrame = {
    require(nBuckets <= scalePow + 1, "bucket weights must stay >= 1")
    val probeCols = probes.columns.toSeq
    val ts = "__w_ts"
    val side = "__w_side"
    val v = "__w_v"
    val nonKey = probeCols.filterNot(_ == key)

    val s = series.select(
      col(key) +: col(seriesTs).cast("long").as(ts) +: lit(0).as(side) +:
        col(valueCol).cast("long").as(v) +:
        nonKey.map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val p = probes.select(
      col(key) +: col(probeTs).cast("long").as(ts) +: lit(1).as(side) +:
        lit(null).cast("long").as(v) +:
        nonKey.map(col): _*)

    val terms = (0 until nBuckets).map { k =>
      val w = Window.partitionBy(col(key)).orderBy(col(ts))
        .rangeBetween(-(k + 1L) * halfLife, -k.toLong * halfLife - 1L)
      val weight = 1L << (scalePow - k)
      (count(col(v)).over(w) * lit(weight),
        coalesce(sum(col(v)).over(w), lit(0L)) * lit(weight))
    }
    s.unionByName(p)
      .select(col("*"),
        terms.map(_._1).reduce(_ + _).as("decay_n_micro"),
        terms.map(_._2).reduce(_ + _).as("decay_sum_micro"))
      .filter(col(side) === 1)
      .select(probeCols.map(col) :+ col("decay_n_micro") :+
        col("decay_sum_micro"): _*)
  }

  /** DuckDB mirror of [[decayedCounter]] over the `events` view. */
  def duckDecayedCounterSql(probeType: String, seriesType: String,
                            halfLife: Long, nBuckets: Int = 16,
                            scalePow: Int = 40): String = {
    val frames = (0 until nBuckets).map { k =>
      s"d$k AS (PARTITION BY user_id ORDER BY ts_us RANGE BETWEEN " +
        s"${(k + 1L) * halfLife} PRECEDING AND ${k.toLong * halfLife + 1} PRECEDING)"
    }.mkString(", ")
    val nTerms = (0 until nBuckets).map { k =>
      s"count(cents) OVER d$k * ${1L << (scalePow - k)}"
    }.mkString(" + ")
    val sTerms = (0 until nBuckets).map { k =>
      s"coalesce(sum(cents) OVER d$k, 0) * ${1L << (scalePow - k)}"
    }.mkString(" + ")
    s"""WITH ev AS (SELECT *, epoch_us(ts) AS ts_us,
       |                    CAST(round(value * 100) AS BIGINT) AS cents
       |            FROM events),
       |u AS (
       |  SELECT user_id, ts_us, 0 AS side, cents,
       |         CAST(NULL AS BIGINT) AS event_id
       |  FROM ev WHERE event_type = '$seriesType'
       |  UNION ALL
       |  SELECT user_id, ts_us, 1 AS side, NULL AS cents, event_id
       |  FROM ev WHERE event_type = '$probeType'),
       |f AS (
       |  SELECT *,
       |    CAST($nTerms AS BIGINT) AS decay_n_micro,
       |    CAST($sTerms AS BIGINT) AS decay_sum_micro
       |  FROM u
       |  WINDOW $frames)
       |SELECT user_id, event_id, ts_us, decay_n_micro, decay_sum_micro
       |FROM f WHERE side = 1""".stripMargin
  }

  /** DuckDB mirror of [[trailingAggMulti]] over the `events` view. */
  def duckTrailingMultiSql(probeType: String, seriesType: String,
                           windows: Seq[Long]): String = {
    val aggs = windows.indices.flatMap { i =>
      Seq(s"CAST(count(cents) OVER w$i AS BIGINT) AS w_n_$i",
        s"CAST(coalesce(sum(cents) OVER w$i, 0) AS BIGINT) AS w_sum_$i")
    }.mkString(",\n    ")
    val frames = windows.zipWithIndex.map { case (win, i) =>
      s"w$i AS (PARTITION BY user_id ORDER BY ts_us " +
        s"RANGE BETWEEN $win PRECEDING AND 1 PRECEDING)"
    }.mkString(", ")
    s"""WITH ev AS (SELECT *, epoch_us(ts) AS ts_us,
       |                    CAST(round(value * 100) AS BIGINT) AS cents
       |            FROM events),
       |u AS (
       |  SELECT user_id, ts_us, 0 AS side, cents,
       |         CAST(NULL AS BIGINT) AS event_id
       |  FROM ev WHERE event_type = '$seriesType'
       |  UNION ALL
       |  SELECT user_id, ts_us, 1 AS side, NULL AS cents, event_id
       |  FROM ev WHERE event_type = '$probeType'),
       |f AS (
       |  SELECT *,
       |    $aggs
       |  FROM u
       |  WINDOW $frames)
       |SELECT user_id, event_id, ts_us, ${windows.indices
        .flatMap(i => Seq(s"w_n_$i", s"w_sum_$i")).mkString(", ")}
       |FROM f WHERE side = 1""".stripMargin
  }

  /** DuckDB mirror over the `events` view: probes = `probeType` events,
    * series = `seriesType` events valued in exact integer cents. */
  def duckTrailingSql(probeType: String, seriesType: String,
                      window: Long): String =
    s"""WITH ev AS (SELECT *, epoch_us(ts) AS ts_us,
       |                    CAST(round(value * 100) AS BIGINT) AS cents
       |            FROM events),
       |u AS (
       |  SELECT user_id, ts_us, 0 AS side, cents,
       |         CAST(NULL AS BIGINT) AS event_id
       |  FROM ev WHERE event_type = '$seriesType'
       |  UNION ALL
       |  SELECT user_id, ts_us, 1 AS side, NULL AS cents, event_id
       |  FROM ev WHERE event_type = '$probeType'),
       |f AS (
       |  SELECT *,
       |    count(cents) OVER w AS w_n,
       |    coalesce(sum(cents) OVER w, 0) AS w_sum
       |  FROM u
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
       |    RANGE BETWEEN $window PRECEDING AND 1 PRECEDING))
       |SELECT user_id, event_id, ts_us,
       |  CAST(w_n AS BIGINT) AS w_n, CAST(w_sum AS BIGINT) AS w_sum
       |FROM f WHERE side = 1""".stripMargin
}
