package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bagged-ensemble model combination — the analog of
  * `TBaggingClassificationModel::OnEvaluate`
  * (`Source/Crawler/Classification/Export/Models/Bagging.h:191-217`):
  * per output class, the mean over K per-model prediction vectors.
  *
  * == Scale design ==
  * Pure per-row projection (`zip_with` chain + one `transform`) — no
  * shuffle; K is a model-count constant, so work per row is O(K·classes).
  *
  * Determinism: the sum folds models in ascending index order exactly like
  * the reference's `for (i) Mean += Results[i][c]`, then divides once —
  * bitwise reproducible and mirrored in the DuckDB oracle.
  */
object Ensemble {

  /** Element-wise mean over the K `array<double>` prediction columns. */
  def baggedMean(df: DataFrame, predCols: Seq[String], out: String): DataFrame = {
    require(predCols.nonEmpty, "need at least one model")
    val sum: Column = predCols.tail.foldLeft(col(predCols.head)) {
      (acc, c) => zip_with(acc, col(c), (x, y) => x + y)
    }
    df.withColumn(out,
      transform(sum, x => x / lit(predCols.length.toDouble)))
  }
}
