package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: match each probe row `(key, ts)` with
  * EVERY interval row `(key, from, to)` of the same key whose half-open
  * validity `[from, to)` contains `ts`. Intervals of one key may OVERLAP —
  * a probe can match several at once (concurrent campaigns, overlapping
  * experiment cohorts, SCD2 tables with parallel attribute versions). That
  * multi-match semantics is exactly what [[AsOfJoin]] can NOT express: as-of
  * returns the single latest-starting state, and composing it with a
  * staleness bound only ever yields one row per probe. Reference analog:
  * the crawler's time-scoped descriptor lookups resolve one state per
  * query; a curation engine also needs the one-to-many range form (e.g.
  * "which dedup/debias rules were ACTIVE when this doc was ingested").
  *
  * == Why not let Catalyst join on `key` alone ==
  * With only the equi key, Spark plans a SortMergeJoin on `key` and applies
  * the range predicate as a post-match filter — per-key work is
  * |probes_k| x |intervals_k|, quadratic on hot keys; with no equi key at
  * all it degenerates to BroadcastNestedLoopJoin. The classic fix (the
  * bucketed range join behind Databricks' range-join optimization and
  * Flink's interval join) is applied here as plan composition:
  *
  *  1. every interval is exploded to the coarse time buckets it spans
  *     (`from div W .. (to-1) div W`, `W` = [[bucketUs]]) — at most
  *     `span/W + 1` rows per interval, the caller's fan-out dial (pick `W`
  *     near the TYPICAL interval span so the blowup is a small constant);
  *  2. every probe maps to its single bucket `ts div W`;
  *  3. one hash equi-join on `(key, bucket)` + the exact containment
  *     filter.
  *
  * Each (probe, interval) match is found EXACTLY once — the probe lives in
  * one bucket and an interval appears once per bucket — so no dedup pass.
  *
  * == Scale shape (100 TB) ==
  * One hash exchange per side, keyed `(key, bucket)`; map-side the interval
  * side grows by the bounded bucket fan-out only. A probe's candidate set
  * is the intervals overlapping ITS bucket of ITS key — O(active intervals
  * per key-bucket), independent of corpus size and of how many intervals
  * the key has in total. Hot keys spread over the time axis (a
  * 10^9-event key shuffles into span/W independent buckets); same-instant
  * skew composes with `core.Partitioning.saltKey` on the probe side.
  * All bucket math is integer division on non-negative epoch
  * microseconds — truncating (Spark `div`) and flooring (DuckDB `//`)
  * division agree, so engine/oracle bucket assignment is bitwise-identical.
  *
  * Degenerate intervals (`to <= from` — empty half-open range) are dropped
  * before the explode: `sequence(lo, hi)` would reverse direction and
  * fabricate matches. Timestamps are required non-negative (epoch micros).
  */
object IntervalJoin {

  /** Inner point-in-interval join. `probes` carries `(key, ts, ...)`,
    * `intervals` `(key, from, to, ...)`; every other column of both sides
    * is passed through. `bucketUs` is the coarse bucket width (same time
    * unit as `ts`/`from`/`to`). */
  def pointInInterval(probes: DataFrame, intervals: DataFrame,
                      key: String, ts: String, from: String, to: String,
                      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucket width must be positive: $bucketUs")
    // Alias both sides: probes and intervals are usually projections of
    // the SAME table (event log → clicks vs campaigns), and resolving the
    // equi key by dataset lineage would then hit Spark's ambiguous
    // self-join heuristics ("trivially true equals predicate").
    val iv = intervals
      .filter(col(to) > col(from))
      .withColumn("__bkt",
        explode(sequence(
          expr(s"$from div ${bucketUs}L"),
          expr(s"($to - 1L) div ${bucketUs}L"))))
      .alias("__iv")
    val pr = probes.withColumn("__bkt", expr(s"$ts div ${bucketUs}L"))
      .alias("__pr")
    pr.join(iv,
        col(s"__pr.$key") === col(s"__iv.$key") &&
          col("__pr.__bkt") === col("__iv.__bkt") &&
          col(s"__pr.$ts") >= col(s"__iv.$from") &&
          col(s"__pr.$ts") < col(s"__iv.$to"))
      .drop(col(s"__iv.$key"))
      .drop(col("__pr.__bkt")).drop(col("__iv.__bkt"))
  }
}
