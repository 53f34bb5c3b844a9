package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global feature normalizer — production form of the fit+apply pair
  * (`ClassificationTestDataSet.cpp:277-305`: per-feature mean/stddev fit
  * over the whole training set, then z-score with ±3σ clamp).
  *
  * == Scale design ==
  * [[fit]] is a single `agg(avg, var_pop)` over the feature columns:
  * Spark's declarative aggregates compute it with map-side partials — one
  * shuffle of O(partitions × features) tiny rows, no `collect_list`, no
  * single-reducer array materialization. At 10^12 rows the fit costs one
  * scan + a few KB of shuffle. (The ordered-fold variant in
  * `VectorQueries.normalizer` exists only for cross-engine bitwise oracle
  * parity — partial float aggregation is order-dependent at the ulp level,
  * which is exactly what the production form trades for scalability; the
  * two agree allclose, asserted in OpsSpec.)
  *
  * [[apply]] broadcasts the 1-row fit and applies the clamp as a pure
  * projection — no shuffle.
  */
object Normalize {

  /** Fit mean/σ (population) per feature column. Returns one row with
    * `<c>_mu` and `<c>_sigma` for each feature. */
  def fit(df: DataFrame, features: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = features.flatMap { c =>
      Seq(avg(col(c)).as(s"${c}_mu"),
        sqrt(var_pop(col(c))).as(s"${c}_sigma"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Apply the fit: z-score + ±`clamp`σ clamp per feature (columns are
    * replaced by `<c>_z`). Broadcast join — zero shuffle on the big side. */
  def apply(df: DataFrame, fitted: DataFrame, features: Seq[String],
            clamp: Double = 3.0): DataFrame = {
    val joined = df.crossJoin(broadcast(fitted))
    features.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_z", expr(
        s"""greatest(CAST(-$clamp AS DOUBLE), least(CAST($clamp AS DOUBLE),
           |  CASE WHEN ${c}_sigma = 0.0 THEN 0.0
           |       ELSE ($c - ${c}_mu) / ${c}_sigma END))""".stripMargin))
    }.drop(features.flatMap(c => Seq(s"${c}_mu", s"${c}_sigma")): _*)
  }
}
