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
  * coarser (e.g. `source` — a handful of values, each carrying a large
  * fraction of the corpus), use [[asOfSalted]]: it spreads each hot key
  * over `salts` reducers. For a fixed small probe grid per key, prefer
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
      defaults: Map[String, Column] = Map.empty): DataFrame =
    asOfKeys(probes, series, Seq(key), probeTs, seriesTs, payload, defaults)

  /** [[asOf]] over a composite key (every column of `keys` must exist on
    * both sides). Same plan shape: ONE hash exchange on `keys` + one sort
    * on `(ts, side)`. */
  def asOfKeys(
      probes: DataFrame,
      series: DataFrame,
      keys: Seq[String],
      probeTs: String,
      seriesTs: String,
      payload: Seq[String],
      defaults: Map[String, Column] = Map.empty): DataFrame = {

    val probeCols = probes.columns.toSeq
    val ts = "__asof_ts"
    val side = "__asof_side"
    val nonKey = probeCols.filterNot(keys.contains)

    val s = series.select(
      keys.map(col) ++: col(seriesTs).cast("double").as(ts) +: lit(0).as(side) +:
        payload.map(c => col(c).as(s"__p_$c")) ++:
        nonKey.map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val p = probes.select(
      keys.map(col) ++: col(probeTs).cast("double").as(ts) +: lit(1).as(side) +:
        payload.map(c => lit(null).cast(series.schema(c).dataType).as(s"__p_$c")) ++:
        nonKey.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts), col(side))
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

  /** Skew-safe as-of join for COARSE keys (the north rule's "salting for
    * skewed sources"): identical results to [[asOf]], different physical
    * distribution.
    *
    * A hot key (e.g. one `source` holding 40% of the corpus) would land the
    * whole key in ONE window task under [[asOf]] — the straggler that kills
    * a 1000-executor run. Here:
    *
    *   1. probes take a deterministic salt in `[0, salts)` hashed from the
    *      whole probe row (`pmod(hash(*), salts)` — no RNG, rerun-stable);
    *   2. series rows REPLICATE to every salt (`explode(sequence(...))`) —
    *      each salt bucket sees the full per-key series, so every probe
    *      still finds its true predecessor;
    *   3. one [[asOfKeys]] on `(key, salt)`.
    *
    * Cost: the exchange moves `salts ×` the series (bounded — per-key
    * series length is capped by the analysis cap) but only `1 ×` the
    * probes, and the hot key's probe mass now spreads over `salts`
    * reducers. Choose `salts` ≈ hot-key rows / target-partition rows; the
    * probe side (the big side in the sampling workloads this engine runs)
    * is what parallelizes. Ties, defaults, and column contract are
    * exactly [[asOf]]'s — AsOfJoinSpec pins salted == unsalted on a skewed
    * fixture. */
  def asOfSalted(
      probes: DataFrame,
      series: DataFrame,
      key: String,
      probeTs: String,
      seriesTs: String,
      payload: Seq[String],
      defaults: Map[String, Column] = Map.empty,
      salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val saltCol = "__asof_salt"
    val p = probes.withColumn(saltCol,
      pmod(hash(probes.columns.map(col): _*), lit(salts)))
    val s = series.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    asOfKeys(p, s, Seq(key, saltCol), probeTs, seriesTs, payload, defaults)
      .drop(saltCol)
  }

  /** Staleness-bounded as-of join (pandas `merge_asof(tolerance=...)` /
    * Flink temporal-join-with-TTL semantics): identical to [[asOf]] except
    * a match older than `tolerance` time units (probe ts − series ts,
    * in the ts columns' own scale) is treated as NO match — the payload
    * falls back to `defaults` (or null). A feature older than its
    * freshness budget is worse than no feature: serving it would train on
    * state the production system would never see.
    *
    * Plan shape: exactly [[asOf]]'s single exchange + sort — the matched
    * series timestamp rides the same window fill as one extra payload
    * column, and the staleness test is a projection on top. `tolerance`
    * is inclusive (`age <= tolerance` keeps the match; ties at the probe
    * ts have age 0). */
  def asOfTolerance(
      probes: DataFrame,
      series: DataFrame,
      key: String,
      probeTs: String,
      seriesTs: String,
      payload: Seq[String],
      tolerance: Long,
      defaults: Map[String, Column] = Map.empty): DataFrame = {
    // the matched timestamp and the served values travel as ONE struct, so
    // they always come from the SAME series row — per-column ignoreNulls
    // fills could serve an older non-null value under a fresh matched ts,
    // silently bypassing the staleness bound this operator exists to
    // enforce (a NULL payload at the matched row is served as NULL)
    val pack = "__asof_pack"
    val s = series.withColumn(pack,
      struct(col(seriesTs).cast("double").as("__ts") +: payload.map(col): _*))
    val joined = asOfKeys(probes, s, Seq(key), probeTs, seriesTs, Seq(pack))
    val stale = col(pack).isNull ||
      col(probeTs).cast("double") - col(pack)("__ts") > tolerance
    joined.select(probes.columns.map(col) ++ payload.map { c =>
      when(stale,
        defaults.getOrElse(c, lit(null).cast(series.schema(c).dataType)))
        .otherwise(col(pack)(c)).as(c)
    }: _*)
  }

  /** Nearest-neighbor as-of join (pandas `merge_asof(direction='nearest')`):
    * for every probe `(key, t)` the series row whose timestamp is CLOSEST
    * to `t` in either direction, optionally within `tolerance`; exact ties
    * in distance resolve to the earlier (backward) row, matching pandas.
    * Completes the direction family next to [[asOf]] (backward),
    * [[asOfTolerance]] (backward + staleness bound) and [[leadJoin]]
    * (forward + horizon). Unlike those two this operator READS THE FUTURE
    * by design — it is a gap-repair / alignment tool for non-label
    * covariates (sensor resampling, clock alignment), never a training
    * feature source; the Scaladoc contract is the leakage warning.
    *
    * Plan shape: the SAME single hash exchange + one sort as [[asOf]] —
    * both direction fills are window functions over the identical
    * `(PARTITION BY key ORDER BY ts, side)` spec (backward `last` over
    * `(unbounded preceding, current)`, forward `first` over `(current,
    * unbounded following)`), so Catalyst plans ONE Window operator with two
    * frames over one sorted run. Matched ts + payload travel as one struct
    * per direction (same same-row guarantee as [[asOfTolerance]]). */
  def asOfNearest(
      probes: DataFrame,
      series: DataFrame,
      key: String,
      probeTs: String,
      seriesTs: String,
      payload: Seq[String],
      tolerance: Long = Long.MaxValue,
      defaults: Map[String, Column] = Map.empty): DataFrame = {
    val probeCols = probes.columns.toSeq
    val ts = "__nr_ts"
    val side = "__nr_side"
    val pack = "__nr_pack"
    val nonKey = probeCols.filterNot(_ == key)

    val packed = struct(col(seriesTs).cast("double").as("__ts") +:
      payload.map(col): _*)
    val s = series.select(
      col(key) +: col(seriesTs).cast("double").as(ts) +: lit(0).as(side) +:
        packed.as(pack) +:
        nonKey.map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val p = probes.select(
      col(key) +: col(probeTs).cast("double").as(ts) +: lit(1).as(side) +:
        lit(null).cast(s.schema(pack).dataType).as(pack) +:
        nonKey.map(col): _*)

    val base = Window.partitionBy(col(key)).orderBy(col(ts), col(side))
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val filled = s.unionByName(p).select(col("*"),
      last(col(pack), ignoreNulls = true).over(wb).as("__b"),
      first(col(pack), ignoreNulls = true).over(wf).as("__f"))

    // distances: backward is at-or-before (>= 0); forward is strictly after
    // (the equal-ts series row sorts before the probe, so the forward frame
    // excludes it — it is already the backward candidate at distance 0)
    val bDist = col(ts) - col("__b")("__ts")
    val fDist = col("__f")("__ts") - col(ts)
    val bOk = col("__b").isNotNull && bDist <= tolerance
    val fOk = col("__f").isNotNull && fDist <= tolerance
    val pickB = bOk && (!fOk || bDist <= fDist)

    filled.filter(col(side) === 1)
      .select(probeCols.map(col) ++ payload.map { c =>
        val miss = defaults.getOrElse(c, lit(null).cast(series.schema(c).dataType))
        when(pickB, col("__b")(c))
          .when(fOk, col("__f")(c))
          .otherwise(miss).as(c)
      }: _*)
  }

  /** Forward as-of / label-attribution join: for every probe `(key, t)`,
    * the FIRST series row STRICTLY after `t` and within `horizon`
    * (`series ts − t ∈ (0, horizon]`) — how outcomes become training
    * labels ("did a purchase follow this click within a day?"). Strictly
    * after, not at-or-after: a simultaneous outcome cannot have been
    * caused by the probe, so counting it would leak the label into the
    * features; beyond-horizon outcomes fall back to `defaults` (an
    * unconverted example, not a missing row).
    *
    * Implementation mirrors [[asOf]] with the window reversed: same
    * union-tagging (`side 0` = series — at equal ts it sorts BEFORE the
    * probe and the `[current row, following)` frame therefore EXCLUDES it,
    * giving the strict inequality), `first(payload) OVER (... ROWS BETWEEN
    * CURRENT ROW AND UNBOUNDED FOLLOWING)` — still ONE hash exchange on
    * the key + one sort, linear, no row multiplication. Series rows should
    * be unique per `(key, ts)` (duplicates make the picked row
    * order-dependent — same contract as [[asOf]]). */
  def leadJoin(
      probes: DataFrame,
      series: DataFrame,
      key: String,
      probeTs: String,
      seriesTs: String,
      payload: Seq[String],
      horizon: Long,
      defaults: Map[String, Column] = Map.empty): DataFrame = {
    val probeCols = probes.columns.toSeq
    val ts = "__lead_ts"
    val side = "__lead_side"
    val pack = "__lead_pack"
    val nonKey = probeCols.filterNot(_ == key)

    // matched ts + payloads as ONE struct (see asOfTolerance: per-column
    // fills could serve a later row's value under an in-horizon matched
    // ts, leaking a beyond-horizon outcome into the label)
    val s = series.select(
      col(key) +: col(seriesTs).cast("double").as(ts) +: lit(0).as(side) +:
        struct(col(seriesTs).cast("double").as("__ts") +: payload.map(col): _*)
          .as(pack) +:
        nonKey.map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val p = probes.select(
      col(key) +: col(probeTs).cast("double").as(ts) +: lit(1).as(side) +:
        lit(null).cast(s.schema(pack).dataType).as(pack) +:
        nonKey.map(col): _*)

    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(side))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val filled = s.unionByName(p).select(col("*"),
      first(col(pack), ignoreNulls = true).over(w).as(s"__f_$pack"))

    val f = col(s"__f_$pack")
    val miss = f.isNull || (f("__ts") - col(ts) > horizon)
    filled.filter(col(side) === 1)
      .select(probeCols.map(col) ++ payload.map { c =>
        when(miss,
          defaults.getOrElse(c, lit(null).cast(series.schema(c).dataType)))
          .otherwise(f(c)).as(c)
      }: _*)
  }
}
