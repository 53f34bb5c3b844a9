package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value imputation — the feature-hygiene step between raw
  * event/feature tables and a trainable matrix. Reference analog: the
  * classification pipeline's per-append NaN/Inf coercion
  * (`Source/Crawler/SampleAnalyser.cpp:1782-1914`) repairs unusable
  * values before the feature vector is assembled; at corpus scale the
  * same repair is a per-GROUP statistic fill rather than a scalar
  * default, so the filled value tracks each stratum's distribution.
  *
  * == Determinism ==
  * The fill is the per-group LOWER MEDIAN (rank `floor((n+1)/2)` with a
  * total tie order on the row id — the [[TextAnalysis.lengthOutliers]]
  * selection rule): an ORDER STATISTIC, not an average, so the imputed
  * value is an exact copy of an existing double — bitwise across engines
  * and partitionings, no float arithmetic at all.
  */
object Impute {

  /** Fill `value` with its group's lower median wherever `missing` holds.
    *
    * Rows whose group has NO present value keep NULL (`was_missing` still
    * flags them) — a deliberate contract: inventing a cross-group global
    * fill would either need a single-partition global sort (a scale
    * anti-pattern) or hide a data problem the pipeline should surface.
    *
    * == Scale shape ==
    * One rank-window pass over the present rows (a sort exchange keyed by
    * `group`), then the group-count-sized median table BROADCASTS back
    * onto the unshuffled input — the big side never moves. Skewed groups
    * cost one sorted partition each, the same bound as any per-group
    * order statistic.
    *
    * @param rows    input
    * @param group   stratum column (few distinct values)
    * @param id      unique row id (total tie order for the rank rule)
    * @param value   column to repair
    * @param missing predicate marking values to treat as absent
    */
  def groupMedianFill(rows: DataFrame, group: String, id: String,
                      value: String, missing: Column): DataFrame = {
    val base = rows.select(col(group).as("g"), col(id).as("k"),
      col(value).as("v"), missing.as("is_missing"))
    val present = base.filter(!col("is_missing"))
    val w = Window.partitionBy(col("g")).orderBy(col("v").asc, col("k").asc)
    val wN = Window.partitionBy(col("g"))
    val med = present.withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wN))
      .filter(col("__r") === floor((col("__n") + 1) / 2))
      .select(col("g"), col("v").as("g_med"))
    base.join(broadcast(med), Seq("g"), "left_outer")
      .select(col("k").as(id), col("g").as(group),
        col("is_missing").as("was_missing"),
        when(col("is_missing"), col("g_med")).otherwise(col("v"))
          .as("v_filled"))
  }

  /** DuckDB mirror of [[groupMedianFill]] over a `(g, k, v, is_missing)`
    * SELECT; emits the same `(id, group, was_missing, v_filled)` shape. */
  def duckGroupMedianFillSql(baseSql: String, group: String,
                             id: String): String =
    s"""WITH base AS ($baseSql),
       |present AS (SELECT * FROM base WHERE NOT is_missing),
       |med AS (
       |  SELECT g, v AS g_med FROM (
       |    SELECT g, v,
       |      row_number() OVER (PARTITION BY g ORDER BY v, k) AS r,
       |      count(*) OVER (PARTITION BY g) AS n
       |    FROM present)
       |  WHERE r = (n + 1) // 2)
       |SELECT b.k AS $id, b.g AS $group,
       |  b.is_missing AS was_missing,
       |  CASE WHEN b.is_missing THEN m.g_med ELSE b.v END AS v_filled
       |FROM base b LEFT JOIN med m USING (g)""".stripMargin
}
