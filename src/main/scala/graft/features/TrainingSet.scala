package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, WindowFeatures}

/** Training-set assembly — the end-to-end composition the north rule's
  * operators exist FOR: one declarative plan that turns an event stream
  * into a leakage-free observation matrix, per probe:
  *
  *   - '''state feature''' — the latest series value at-or-before the
  *     probe, within a freshness budget ([[AsOfJoin.asOfTolerance]]);
  *   - '''history features''' — count + exact-integer sum of outcomes in
  *     k trailing horizons, strictly before the probe
  *     ([[WindowFeatures.trailingAggMulti]]);
  *   - '''label''' — the first outcome strictly after the probe within
  *     the attribution horizon ([[AsOfJoin.leadJoin]]).
  *
  * Every boundary is causal by construction: features see `ts < t` (or
  * `<= t` for the as-of state), the label sees `ts > t` only — the same
  * row can never be both feature and label, and nothing after the probe
  * leaks into its features (the leakage property PipelineSpec pins for
  * the token pipeline holds here structurally).
  *
  * == Plan shape ==
  * Three union+window operators, ALL keyed on the same entity column, so
  * the composed plan is three hash exchanges on the same key (AQE reuses
  * co-partitioning where frames align) and zero joins of materialized
  * intermediates — each stage decorates the probe frame in place. At
  * 10^12 events this is 3 linear passes, never probe × series. */
object TrainingSet {

  /** @param probes    observation anchors: `key`, `probeTs` (+ id columns)
    * @param state     slowly-changing series for the as-of feature:
    *                  `key`, `stateTs`, `stateVal`
    * @param outcomes  outcome events (history + label source): `key`,
    *                  `outcomeTs`, `outcomeVal` (integer-exact for sums)
    * @param freshness as-of staleness budget (ts units)
    * @param horizons  trailing history widths (ts units)
    * @param labelH    label attribution horizon (ts units) */
  def assemble(
      probes: DataFrame,
      state: DataFrame, stateTs: String, stateVal: String,
      outcomes: DataFrame, outcomeTs: String, outcomeVal: String,
      key: String, probeTs: String,
      freshness: Long, horizons: Seq[Long], labelH: Long): DataFrame = {

    val withState = AsOfJoin.asOfTolerance(
      probes, state, key, probeTs, stateTs, Seq(stateVal), freshness)
      .withColumnRenamed(stateVal, "f_state")

    val withHistory = WindowFeatures.trailingAggMulti(
      withState, outcomes, key, probeTs, outcomeTs, outcomeVal, horizons)

    AsOfJoin.leadJoin(
      withHistory, outcomes, key, probeTs, outcomeTs, Seq(outcomeVal),
      labelH, defaults = Map(outcomeVal -> lit(0L)))
      .withColumnRenamed(outcomeVal, "label")
  }
}
