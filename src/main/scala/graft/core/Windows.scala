package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The sequential / stateful operator library over per-entity ordered series
  * — every AFEC operator whose semantics are "look only backward in event
  * time" (SURVEY.md §2.5). All window specs partition by the entity key and
  * order by the derived event time, with frames that never extend past the
  * current row — **zero temporal leakage** by construction.
  *
  * == Scale design ==
  * Every helper here shuffles at most once, on the entity key (Spark's
  * `Window.partitionBy` requires co-located, sorted partitions — one exchange
  * + sort that AQE can also reuse across multiple window functions with the
  * same spec; we deliberately keep ONE canonical spec `(key, ts)` so Catalyst
  * collapses all of them into a single Window operator). Per-entity state is
  * bounded by the analysis cap, so no partition-size blowup. For skewed
  * sources, upstream `repartitionByRange` on (key) with AQE skew handling
  * applies (see Pipeline).
  */
object Windows {

  /** Canonical per-entity event-time window. */
  def byKey(key: String, ts: String) =
    Window.partitionBy(col(key)).orderBy(col(ts))

  /** Backward-unbounded frame (running scans). */
  def running(key: String, ts: String) =
    byKey(key, ts).rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Forward-fill: carry the last non-null (optionally gated) value forward.
    * Analog of the failsafe-F0 fill (`SampleAnalyser.cpp:875-917`): values
    * where `gate` is false are treated as missing. */
  def forwardFill(value: Column, gate: Column, key: String, ts: String): Column =
    last(when(gate, value), ignoreNulls = true).over(running(key, ts))

  /** Lag-1 with self-join-first-row semantics: the first row sees itself
    * (spectral-flux contract, `SampleAnalyser.cpp:936-940`). */
  def lagSelf(value: Column, key: String, ts: String): Column =
    coalesce(lag(value, 1).over(byKey(key, ts)), value)

  /** Running max of |value| — the prefix-audibility scan used for
    * leading-silence trim (`SampleAnalyser.cpp:646-676`): a row is "after
    * first audible" iff the running peak exceeds the floor. */
  def runningPeak(value: Column, key: String, ts: String): Column =
    max(abs(value)).over(running(key, ts))

  /** Trailing rolling median over the last `span` rows (inclusive) — onset
    * threshold baseline (`OnsetDetector.cpp:551-570`). Exact: sorts the
    * bounded trailing buffer. */
  def rollingMedian(value: Column, span: Int, key: String, ts: String): Column = {
    val buf = collect_list(value)
      .over(byKey(key, ts).rowsBetween(-(span - 1), Window.currentRow))
    // lower-middle element, matching Stats median semantics
    element_at(array_sort(buf), ((size(buf) - 1) / 2).cast("int") + 1)
  }

  /** Rising-edge detector: true where value crosses above threshold
    * (`OnsetDetector.cpp:573-587`). */
  def risingEdge(value: Column, threshold: Column, key: String, ts: String): Column =
    value > threshold && coalesce(lag(value, 1).over(byKey(key, ts)) <= threshold,
      lit(true))

  /** Gap-based sessionization (gaps-and-islands): new session when the gap
    * from the previous event exceeds `gap`. Works on any numeric/timestamp
    * ts (caller passes `ts` already cast to a subtractable type). Returns the
    * 0-based session index per key. Analog of the min-gap / session grouping
    * (`OnsetDetector.cpp:288-290`; `session_window` is the streaming analog).
    */
  def sessionId(tsNum: Column, gap: Column, key: String, ts: String): Column = {
    val prev = lag(tsNum, 1).over(byKey(key, ts))
    val isNew = when(prev.isNull || tsNum - prev > gap, 1).otherwise(0)
    sum(isNew).over(running(key, ts)) - 1
  }

  /** Refractory-gap suppression over an ordered array of event positions:
    * keep an event iff it is ≥ `gap` after the last KEPT event (iterative —
    * not expressible with lag alone; `OnsetDetector.cpp:574-586`). Pure
    * array fold, per-row, no shuffle. `arr` : array<int/long> ascending. */
  def refractoryExpr(arr: String, gap: Int): Column = expr(
    s"""aggregate($arr,
       |  named_struct('last', CAST(-$gap - 1 AS BIGINT),
       |               'kept', CAST(array() AS ARRAY<BIGINT>)),
       |  (acc, x) -> IF(CAST(x AS BIGINT) - acc.last >= $gap,
       |    named_struct('last', CAST(x AS BIGINT),
       |                 'kept', concat(acc.kept, array(CAST(x AS BIGINT)))),
       |    acc),
       |  acc -> acc.kept)""".stripMargin)

  /** One-pole envelope follower (EWMA-style recursion
    * `state = x + coef * (state - x)`, `Envelopes.inl:14-18`) over an ordered
    * `array<double>` column; returns the full envelope series (same length).
    * Sequential fold inside the row — exact, deterministic, shuffle-free. */
  def envelopeScanExpr(arr: String, coef: Double): Column = expr(
    s"""aggregate($arr,
       |  named_struct('s', CAST(0.0 AS DOUBLE),
       |               'out', CAST(array() AS ARRAY<DOUBLE>)),
       |  (acc, x) -> named_struct(
       |    's', x + $coef * (acc.s - x),
       |    'out', concat(acc.out, array(x + $coef * (acc.s - x)))),
       |  acc -> acc.out)""".stripMargin)

  /** Final envelope state only (cheaper when the series is not needed). */
  def envelopeFinalExpr(arr: String, coef: Double): Column = expr(
    s"aggregate($arr, CAST(0.0 AS DOUBLE), (acc, x) -> x + $coef * (acc - x))"
  )
}
