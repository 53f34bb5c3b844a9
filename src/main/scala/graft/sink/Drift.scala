package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot drift report: per feature column, the count/mean/
  * population-variance at two committed snapshots of a [[KeyedSink]] table
  * plus their deltas — the monitoring query a production feature table
  * runs after every incremental refresh ("did this upsert shift the
  * feature distributions?"), composed from the sink's time travel exactly
  * like Iceberg snapshot analytics.
  *
  * == Shape ==
  * Each snapshot is read once and UNPIVOTED (`stack`) to long
  * `(feature, value)` form, then aggregated per feature — one narrow pass
  * + one tiny groupBy per side, joined on the feature name (k rows, k =
  * |features|). No full-table join: the report's size is the number of
  * columns, independent of row count. */
object Drift {

  /** None when either snapshot is not committed/readable. */
  def report(spark: SparkSession, path: String, m: Int, n: Int,
             features: Seq[String],
             key: String = "doc_id"): Option[DataFrame] = {
    def side(snap: Int, tag: String): Option[DataFrame] =
      KeyedSink.readAt(spark, path, snap, key).map { df =>
        val stackExpr = features
          .map(f => s"'$f', CAST($f AS DOUBLE)").mkString(", ")
        df.select(expr(
            s"stack(${features.length}, $stackExpr) AS (feature, v)"))
          .groupBy("feature")
          .agg(count(col("v")).as(s"n_$tag"),
            avg(col("v")).as(s"mean_$tag"),
            var_pop(col("v")).as(s"var_$tag"))
      }
    for (a <- side(m, "old"); b <- side(n, "new")) yield
      a.join(b, Seq("feature"), "full_outer")
        .withColumn("mean_delta", col("mean_new") - col("mean_old"))
        .withColumn("var_delta", col("var_new") - col("var_old"))
        .withColumn("n_delta", col("n_new") - col("n_old"))
  }
}
