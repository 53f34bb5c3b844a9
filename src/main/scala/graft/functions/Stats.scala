package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** AFEC's 13-statistic summary block, re-expressed three ways that must agree:
  *
  *   1. [[oracle]] — a pure-Scala scalar reference (used by golden tests),
  *   2. [[withBlock]] — Spark Catalyst higher-order-function expressions over
  *      an ordered `array<double>` column (sequential left-folds, so results
  *      are bitwise deterministic regardless of partitioning),
  *   3. [[duckBlock]] — the equivalent DuckDB SQL (for the driver's oracle),
  *      generated here so the two dialects cannot drift.
  *
  * Semantics follow the reference exactly
  * (`Source/Crawler/FeatureExtraction/Source/Statistics.cpp:12-90` and the
  * per-stat functions below it):
  *
  *   - variance is **population** variance (divide by N, not N-1) —
  *     `Statistics.cpp:275-300`;
  *   - median is the **lower middle** element of the sorted array
  *     (quickselect to index `(n-1)/2` — `Statistics.cpp:316-413`);
  *   - geometric mean is `exp(mean(log(|x| + 1e-20)))` —
  *     `Statistics.cpp:417-455` (the product-rebalancing there is a pure
  *     numeric-range guard, mathematically identical);
  *   - centroid / spread are **index-weighted** moments
  *     `Σ j·x_j / Σ x_j` — `Statistics.cpp:459-506`, NOT Spark's value
  *     moments;
  *   - skewness / kurtosis are centroid/spread-based:
  *     `Σ((x−centroid)/spread)^3 / N` and `Σ(...)^4/N − 3`, zero when
  *     `|spread| ≤ 1e-12` (`MEpsilon`, `InlineMath.h:32`) —
  *     `Statistics.cpp:510-554`;
  *   - flatness = gmean/mean, 0 when mean == 0 — `Statistics.cpp:560-573`;
  *   - dmean/dvariance = mean/population-variance of `|x[i+1]−x[i]|`,
  *     computed only when n > 2 — `Statistics.cpp:51-70`;
  *   - n == 1 sets only min/max/mean (variance 0); all other stats keep
  *     their 0.0 init; n == 0 → all zero — `Statistics.cpp:71-90`,
  *     `SampleDescriptors.h:268-283`.
  *
  * Scale note: each block is evaluated inside one row over a per-entity
  * series bounded by the analysis cap (≤ `MaxTokens/Hop` frames — the 20 s
  * cap analog, `SampleAnalyser.cpp:37`), so it is a narrow, shuffle-free
  * projection; whole-stage codegen keeps it in one pass per expression.
  */
object Stats {

  val Eps = 1e-12 // MEpsilon, InlineMath.h:32

  val StatNames: Seq[String] = Seq(
    "min", "max", "median", "mean", "gmean", "variance", "centroid",
    "spread", "skewness", "kurtosis", "flatness", "dmean", "dvariance")

  // ------------------------------------------------------------------
  // 1. scalar oracle (test reference)
  // ------------------------------------------------------------------

  final case class Block(
      min: Double, max: Double, median: Double, mean: Double,
      gmean: Double, variance: Double, centroid: Double, spread: Double,
      skewness: Double, kurtosis: Double, flatness: Double,
      dmean: Double, dvariance: Double) {
    def toSeq: Seq[Double] = Seq(min, max, median, mean, gmean, variance,
      centroid, spread, skewness, kurtosis, flatness, dmean, dvariance)
  }

  def oracle(xs: Seq[Double]): Block = {
    val n = xs.length
    if (n == 0) Block(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    else if (n == 1) Block(xs.head, xs.head, 0, xs.head, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    else {
      val sum  = xs.foldLeft(0.0)(_ + _)
      val mean = sum / n
      val variance = xs.foldLeft(0.0)((a, x) => a + (x - mean) * (x - mean)) / n
      val sorted = xs.sorted
      val median = sorted((n - 1) / 2)
      val gmean = math.exp(
        xs.foldLeft(0.0)((a, x) => a + math.log(math.abs(x) + 1e-20)) / n)
      val centroid =
        if (sum == 0.0) 0.0
        else xs.zipWithIndex.foldLeft(0.0) { case (a, (x, j)) => a + j * x } / sum
      val spread =
        if (sum == 0.0) 0.0
        else xs.zipWithIndex.foldLeft(0.0) { case (a, (x, j)) =>
          a + (j - centroid) * (j - centroid) * x
        } / sum
      val skewness =
        if (math.abs(spread) <= Eps) 0.0
        else xs.foldLeft(0.0) { (a, x) =>
          val t = (x - centroid) / spread; a + t * t * t
        } / n
      val kurtosis =
        if (math.abs(spread) <= Eps) 0.0
        else xs.foldLeft(0.0) { (a, x) =>
          val t = (x - centroid) / spread; a + t * t * t * t
        } / n - 3.0
      val flatness = if (mean == 0.0) 0.0 else gmean / mean
      val (dmean, dvariance) =
        if (n > 2) {
          val d = xs.sliding(2).map(p => math.abs(p(1) - p(0))).toSeq
          val dm = d.foldLeft(0.0)(_ + _) / d.length
          val dv = d.foldLeft(0.0)((a, x) => a + (x - dm) * (x - dm)) / d.length
          (dm, dv)
        } else (0.0, 0.0)
      Block(sorted.head, sorted.last, median, mean, gmean, variance,
        centroid, spread, skewness, kurtosis, flatness, dmean, dvariance)
    }
  }

  // ------------------------------------------------------------------
  // 2./3. the dual-dialect expression templates
  // ------------------------------------------------------------------

  /** Renders the 13 stats for a series expression in either dialect.
    * `spark = true` → Spark SQL; false → DuckDB. The only dialect deltas:
    * integer division (`div` vs `//`), HOF names (`transform/aggregate` vs
    * `list_transform/list_reduce`), lambda index base (0 vs 1), and
    * element access (`element_at` vs `[]`). Every fold is a sequential
    * left-fold over the same element order, so double-precision results are
    * bitwise identical across the two engines.
    */
  private def exprs(xs: String, p: String, spark: Boolean): Seq[(String, String)] = {
    // fold helpers
    def fsum(arr: String): String =
      if (spark) s"aggregate($arr, CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
      else s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $arr), (a, x) -> a + x)"
    def tmap(arr: String, body: String): String = // body uses `x`
      if (spark) s"transform($arr, x -> $body)"
      else s"list_transform($arr, x -> $body)"
    def tmapIdx(arr: String, body: String): String = // body uses `x` and 0-based `j`
      if (spark) s"transform($arr, (x, j) -> $body)"
      else s"list_transform($arr, (x, j0) -> ${body.replaceAll("\\bj\\b", "(j0 - 1)")})"
    def elem(arr: String, i1: String): String = // 1-based index expression
      if (spark) s"element_at($arr, $i1)" else s"(($arr)[$i1])"
    val n      = s"${p}_n"
    val sum    = s"${p}_sum"
    val sorted = if (spark) s"array_sort($xs)" else s"list_sort($xs)"
    val amin   = if (spark) s"array_min($xs)" else s"list_min($xs)"
    val amax   = if (spark) s"array_max($xs)" else s"list_max($xs)"
    val size   = if (spark) s"size($xs)" else s"len($xs)"
    val idiv   = if (spark) "div" else "//"
    val ln     = if (spark) "ln" else "ln"
    // |x[j+1] - x[j]| for j = 1..n-1 (1-based)
    val diffs =
      if (spark)
        s"transform(sequence(1, $n - 1), j -> abs(element_at($xs, j + 1) - element_at($xs, j)))"
      else
        s"list_transform(range(1, $n), j -> abs((($xs)[j + 1]) - (($xs)[j])))"

    // Stage-ordered: later entries may reference earlier aliases.
    Seq(
      n      -> size,
      sum    -> fsum(xs),
      s"${p}_min"    -> s"CASE WHEN $n = 0 THEN 0.0 ELSE CAST($amin AS DOUBLE) END",
      s"${p}_max"    -> s"CASE WHEN $n = 0 THEN 0.0 ELSE CAST($amax AS DOUBLE) END",
      s"${p}_mean"   -> s"CASE WHEN $n = 0 THEN 0.0 ELSE $sum / $n END",
      s"${p}_median" -> s"CASE WHEN $n >= 2 THEN ${elem(sorted,
        if (spark) s"CAST((($n - 1) div 2) + 1 AS INT)" else s"(($n - 1) // 2) + 1")} ELSE 0.0 END",
      s"${p}_gmean"  -> s"CASE WHEN $n >= 2 THEN exp(${fsum(tmap(xs, s"$ln(abs(x) + 1e-20)"))} / $n) ELSE 0.0 END",
      s"${p}_variance" ->
        s"CASE WHEN $n >= 2 THEN ${fsum(tmap(xs, s"(x - ${p}_mean) * (x - ${p}_mean)"))} / $n ELSE 0.0 END",
      s"${p}_centroid" ->
        s"CASE WHEN $n >= 2 AND $sum <> 0.0 THEN ${fsum(tmapIdx(xs, "j * x"))} / $sum ELSE 0.0 END",
      s"${p}_spread" ->
        s"CASE WHEN $n >= 2 AND $sum <> 0.0 THEN ${fsum(tmapIdx(xs, s"(j - ${p}_centroid) * (j - ${p}_centroid) * x"))} / $sum ELSE 0.0 END",
      s"${p}_skewness" ->
        s"""CASE WHEN $n >= 2 AND abs(${p}_spread) > $Eps
           | THEN ${fsum(tmap(xs, s"((x - ${p}_centroid) / ${p}_spread) * ((x - ${p}_centroid) / ${p}_spread) * ((x - ${p}_centroid) / ${p}_spread)"))} / $n
           | ELSE 0.0 END""".stripMargin.replace("\n", " "),
      s"${p}_kurtosis" ->
        s"""CASE WHEN $n >= 2 AND abs(${p}_spread) > $Eps
           | THEN ${fsum(tmap(xs, s"((x - ${p}_centroid) / ${p}_spread) * ((x - ${p}_centroid) / ${p}_spread) * ((x - ${p}_centroid) / ${p}_spread) * ((x - ${p}_centroid) / ${p}_spread)"))} / $n - 3.0
           | ELSE 0.0 END""".stripMargin.replace("\n", " "),
      s"${p}_flatness" ->
        s"CASE WHEN $n >= 2 AND ${p}_mean <> 0.0 THEN ${p}_gmean / ${p}_mean ELSE 0.0 END",
      s"${p}_diffs" -> s"CASE WHEN $n > 2 THEN $diffs ELSE ${
        if (spark) "CAST(array() AS ARRAY<DOUBLE>)" else "CAST([] AS DOUBLE[])"} END",
      s"${p}_dmean" ->
        s"CASE WHEN $n > 2 THEN ${fsum(s"${p}_diffs")} / ($n - 1) ELSE 0.0 END",
      s"${p}_dvariance" ->
        s"CASE WHEN $n > 2 THEN ${fsum(tmap(s"${p}_diffs", s"(x - ${p}_dmean) * (x - ${p}_dmean)"))} / ($n - 1) ELSE 0.0 END"
    )
  }

  /** Columns that are scaffolding, not part of the published block. */
  private def helperCols(p: String) = Seq(s"${p}_n", s"${p}_sum", s"${p}_diffs")

  /** Append the 13 stat columns `p_min .. p_dvariance` computed over the
    * `array<double>` column `xs` (ordered series). Pure projection. */
  def withBlock(df: DataFrame, xs: String, p: String): DataFrame = {
    val staged = exprs(xs, p, spark = true).foldLeft(df) {
      case (d, (name, e)) => d.withColumn(name, expr(e))
    }
    staged.drop(helperCols(p): _*)
  }

  /** DuckDB mirror: wraps `inner` (a query producing `keys` plus the
    * list-of-double column `xs`) in staged CTE selects computing the same
    * block; returns a full SELECT yielding keys + 13 stats. `prelude` is an
    * optional comma-joined CTE list (no leading WITH) that `inner` may
    * reference (e.g. the seqs/frames CTEs). */
  /** Like [[duckBlock]] but returns composable CTE text (no leading WITH)
    * plus the name of the final CTE — for oracles that need many stat
    * blocks in one statement (the feature-vector assembly). */
  def duckBlockCtes(inner: String, keys: Seq[String], xs: String,
                    p: String): (String, String) = {
    val stages = exprs(xs, p, spark = false)
    val cte = stages.zipWithIndex.map { case ((name, e), i) =>
      s"__${p}g${i + 1} AS (SELECT *, $e AS $name FROM __${p}g$i)"
    }
    val first = s"__${p}g0 AS ($inner)"
    val keep = (keys ++ StatNames.map(s => s"${p}_$s")).mkString(", ")
    val fin = s"__${p}st AS (SELECT $keep FROM __${p}g${stages.length})"
    ((Seq(first) ++ cte :+ fin).mkString(",\n"), s"__${p}st")
  }

  def duckBlock(inner: String, keys: Seq[String], xs: String, p: String,
                prelude: String = ""): String = {
    val stages = exprs(xs, p, spark = false)
    // one CTE stage per expression (each may reference previous aliases)
    val cte = stages.zipWithIndex.map { case ((name, e), i) =>
      s"__${p}g${i + 1} AS (SELECT *, $e AS $name FROM __${p}g$i)"
    }
    val first = s"__${p}g0 AS ($inner)"
    val pre = if (prelude.isEmpty) Seq.empty else Seq(prelude)
    val keep = (keys ++ StatNames.map(s => s"${p}_$s")).mkString(", ")
    (pre ++ Seq(first) ++ cte).mkString("WITH ", ", ", "") +
      s" SELECT $keep FROM __${p}g${stages.length}"
  }
}
