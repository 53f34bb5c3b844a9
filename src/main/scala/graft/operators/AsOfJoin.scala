package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for every probe row `(key, t)` attach the
  * payload of the latest series row `(key, ts)` with `ts <= t`.
  *
  * Analog of AFEC's feature-vector time-series sampling
  * (`SampleClassificationDescriptors.cpp:73-102`: value as of the requested
  * frame, silence-reference default when none exists) and the general
  * operator named by the north rule.
  *
  * == Implementation: union + ordered window fill (sort-merge as-of) ==
  * Rather than an inequality join (which Catalyst would plan as a
  * broadcast-nested-loop or a range join with quadratic blowup per key), we:
  *
  *   1. tag series rows `side = 0` carrying payload, probe rows `side = 1`
  *      with null payload;
  *   2. union and apply `last(payload, ignoreNulls) OVER (PARTITION BY key
  *      ORDER BY ts, side ROWS UNBOUNDED PRECEDING..CURRENT ROW)`;
  *   3. keep the probe rows.
  *
  * This is exactly a distributed sort-merge as-of join: ONE hash exchange on
  * `key` + one sort on `(ts, side)` — linear in input size, no row
  * multiplication, and the sort/exchange is shared by any other window over
  * the same key. Ties (`ts == t`) resolve to the series row ("at or
  * before"), because `side 0 < 1`.
  *
  * == Skew ==
  * Partitioning is hash-by-key over *all* keys, so hot `source`s do not
  * concentrate: per-key row count is bounded by the per-entity analysis cap
  * (series) + probe-grid size. When callers join series keyed by something
  * coarser (e.g. `source`), pre-salt: see [[graft.features.Pipeline]] notes.
  * For a fixed small probe grid per key, prefer
  * [[PointInTime.sampleOffsets]] (pure projection, zero shuffle).
  */
object AsOfJoin {

  /** @param probes   DataFrame with columns `key`, `probeTs` (+ any others,
    *                 preserved)
    * @param series   DataFrame with columns `key`, `seriesTs`, payload cols
    * @param payload  series columns to carry to the probes (as-of values)
    * @param defaults value per payload column when no series row precedes
    *                 the probe (AFEC's silence-reference defaults,
    *                 `SampleClassificationDescriptors.cpp:326-360`)
    */
  def asOf(
      probes: DataFrame,
      series: DataFrame,
      key: String,
      probeTs: String,
      seriesTs: String,
      payload: Seq[String],
      defaults: Map[String, Column] = Map.empty): DataFrame = {

    val probeCols = probes.columns.toSeq
    val ts = "__asof_ts"
    val side = "__asof_side"

    val s = series.select(
      col(key) +: col(seriesTs).cast("double").as(ts) +: lit(0).as(side) +:
        payload.map(c => col(c).as(s"__p_$c")) ++:
        probeCols.filterNot(_ == key).map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val p = probes.select(
      col(key) +: col(probeTs).cast("double").as(ts) +: lit(1).as(side) +:
        payload.map(c => lit(null).cast(series.schema(c).dataType).as(s"__p_$c")) ++:
        probeCols.filterNot(_ == key).map(col): _*)

    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = s.unionByName(p).select(
      col("*") +: payload.map(c =>
        last(col(s"__p_$c"), ignoreNulls = true).over(w).as(s"__f_$c")): _*)

    filled.filter(col(side) === 1)
      .select(probeCols.map(col) ++ payload.map { c =>
        defaults.get(c)
          .map(d => coalesce(col(s"__f_$c"), d).as(c))
          .getOrElse(col(s"__f_$c").as(c))
      }: _*)
  }
}
