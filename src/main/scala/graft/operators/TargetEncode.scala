package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Leakage-free expanding target encoding: for every row `(key, t, y)`,
  * the smoothed mean of the target over the SAME key's STRICTLY EARLIER
  * rows —
  *
  * {{{ enc = (m·prior + Σ_past y) / (m + n_past) }}}
  *
  * with `prior` the global target mean and `m` the pseudo-count weight
  * (classic empirical-Bayes category encoding). "Strictly earlier" is a
  * `RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING` frame over the
  * integer event time: rows sharing the row's own timestamp are excluded
  * on BOTH sides of the boundary, so a batch of simultaneous outcomes can
  * never encode each other — the same zero-leakage causality rule as
  * [[AsOfJoin.leadJoin]] / [[WindowFeatures]]. A key's first row falls
  * back to exactly the prior (`n_past = 0`).
  *
  * == Determinism ==
  * The target must be integer-exact (cents, counts). With `g_sum/g_cnt`
  * the global sums, the encode is computed as ONE double division of two
  * exact int64 products:
  *
  * {{{ enc = (m·g_sum + cum_sum·g_cnt) / (g_cnt·(m + n_past)) }}}
  *
  * — bitwise identical across engines and partitionings (IEEE division of
  * exactly-represented integers; all magnitudes must stay < 2^53, which
  * holds for cent-scale targets up to ~10^10 rows per key; beyond that,
  * switch the products to DECIMAL(38,0)).
  *
  * == Plan shape / scale ==
  * One global agg (map-side partials → a 1-row broadcast) + one hash
  * exchange on `key` with a sort on `ts` — the same exchange any other
  * per-key window shares. Per-key history length is what bounds the window
  * task; entity-grained keys (user, doc) are naturally bounded, and the
  * expanding frame is cumulative state, not a buffered window. For
  * COARSE keys (a handful of categories) the cumulative frame cannot be
  * salted (every row needs the full earlier history), so pre-aggregate per
  * `(key, ts)` first and join back — counts/sums per distinct timestamp
  * are order-free.
  */
object TargetEncode {

  /** @param df       input rows
    * @param key      categorical / entity column to encode
    * @param ts       integer event-time column (microsecond long)
    * @param valueCol integer-exact target column (e.g. cents)
    * @param m        smoothing pseudo-count (prior weight), > 0
    * @return df + `n_past` (count of strictly-earlier same-key rows) +
    *         `enc` (smoothed expanding mean, double)
    */
  def expandingMean(
      df: DataFrame,
      key: String,
      ts: String,
      valueCol: String,
      m: Int): DataFrame = {
    require(m > 0, s"prior weight m must be positive, got $m")
    val g = df.agg(
      sum(col(valueCol)).cast("long").as("__g_sum"),
      count(col(valueCol)).cast("long").as("__g_cnt"))
    val w = Window.partitionBy(col(key)).orderBy(col(ts).cast("long"))
      .rangeBetween(Window.unboundedPreceding, -1L)
    df.crossJoin(broadcast(g))
      .withColumn("n_past", count(col(valueCol)).over(w))
      .withColumn("__cum", coalesce(sum(col(valueCol)).over(w), lit(0L)))
      .withColumn("enc",
        (lit(m.toLong) * col("__g_sum") + col("__cum") * col("__g_cnt"))
          .cast("double") /
          (col("__g_cnt") * (lit(m.toLong) + col("n_past"))).cast("double"))
      .drop("__g_sum", "__g_cnt", "__cum")
  }
}
