package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equal-frequency (quantile) discretization of an integer feature — the
  * classic feature-eng binning step (Spark ML's QuantileDiscretizer
  * analog, kept in pure SQL so the oracle can replay it): k bins with
  * boundaries at the k−1 interior quantile VALUES, every row assigned by
  * VALUE against those boundaries. Value-based assignment (not raw ntile
  * output) is what makes the result a reusable feature map: equal inputs
  * land in equal bins, and the boundary table can re-bin NEW data (e.g.
  * the serving path) without re-ranking the corpus.
  *
  * Boundary rule: boundary i = `max(x)` of ntile bucket i under the total
  * order `(x, key)` — the value at a fixed global rank, deterministic
  * under ties regardless of tie ordering. Assignment: `bin = 1 + |{i :
  * b_i < x}|`, so x equal to a boundary joins that boundary's bucket.
  * All comparisons are exact integers → bitwise across engines.
  *
  * Plan/scale: the ntile is ONE global-order window — the exactness cost
  * (same note as [[Evaluation.prCurve]] / [[LanguageModel.perplexityBuckets]]).
  * The boundary table is k−1 rows, collapsed to a single broadcast array
  * row; assignment is a narrow projection (the k-element filter runs per
  * ROW, not per token — interpreted HOF cost is O(k) on a tiny array).
  * At extreme scale substitute [[quantileBinApprox]]'s mergeable
  * sketch boundaries; this form is that report's oracle backstop. */
object Binning {

  /** Exact k-bin assignment: `(key, x, bin)`, bin ∈ 1..k. */
  def quantileBin(df0: DataFrame, v: String, key: String, k: Int): DataFrame = {
    val df = df0.select(col(key).as("key"), col(v).cast("long").as("x"))
    val w = Window.orderBy(col("x"), col("key"))
    val bounds = df.withColumn("q", ntile(k).over(w))
      .filter(col("q") < k)
      .groupBy("q").agg(max(col("x")).as("hi"))
    val barr = bounds.agg(sort_array(collect_list(col("hi"))).as("bs"))
    df.crossJoin(broadcast(barr))
      .select(col("key"), col("x"),
        (lit(1) + expr("size(filter(bs, b -> b < x))")).as("bin"))
  }

  /** Scale path: boundaries from the Greenwald–Khanna sketch
    * (`approx_percentile` — mergeable map-side partials, NO global sort),
    * same value-based assignment. Bin populations deviate from n/k only
    * by the sketch's rank error (`relErr`); equal inputs still land in
    * equal bins exactly. */
  def quantileBinApprox(df0: DataFrame, v: String, key: String, k: Int,
                        relErr: Double = 0.001): DataFrame = {
    val df = df0.select(col(key).as("key"), col(v).cast("long").as("x"))
    val pcts = (1 until k).map(i => i.toDouble / k)
    val acc = math.max(1L, math.round(1.0 / relErr))
    val barr = df.agg(expr(
      s"approx_percentile(x, array(${pcts.mkString(",")}), $acc)").as("bs"))
    df.crossJoin(broadcast(barr))
      .select(col("key"), col("x"),
        (lit(1) + expr("size(filter(bs, b -> b < x))")).as("bin"))
  }

  /** DuckDB mirror of [[quantileBin]] over `baseSql` — a SELECT yielding
    * `(key, x)` with x already integral. */
  def duckSql(baseSql: String, k: Int): String =
    s"""WITH base AS (SELECT key, CAST(x AS BIGINT) AS x FROM ($baseSql) q0),
       |t AS (
       |  SELECT x, ntile($k) OVER (ORDER BY x, key) AS q FROM base),
       |b AS (
       |  SELECT q, max(x) AS hi FROM t WHERE q < $k GROUP BY 1)
       |SELECT base.key, base.x, CAST(1 + count(b.hi) AS INT) AS bin
       |FROM base LEFT JOIN b ON b.hi < base.x
       |GROUP BY 1, 2""".stripMargin

  /** Hashed feature cross (the hashing trick for categorical crosses —
    * the Vowpal-Wabbit / wide-model `cross_column` analog): the cartesian
    * interaction of `cols` is mapped into `dim` buckets by the shared
    * [[Sampling.md5Slot]] hash, and the report measures what the model
    * will actually see — per-bucket row mass, how many DISTINCT raw
    * crosses collided into the bucket, and the lexicographically smallest
    * one as a stable exemplar. Crossing is how linear/wide models get
    * interaction features without materializing a vocabulary; the
    * collision count is the price paid for the fixed dimension.
    *
    * == Scale shape ==
    * Two-stage: the corpus reduces to the exact distinct-cross table
    * first (ONE shuffle with map-side combine, ≤ |cross vocabulary| rows
    * — same rule as [[Sketches.countMinReport]]), then the vocab-sized
    * table is hashed and re-aggregated to ≤ `dim` rows. Hash cost lands
    * on the vocabulary, not on every row; the report is model-sized.
    *
    * Raw-cross rendering `'cross:' || c1 || '|' || … ` is canonical in
    * both engines; counts are exact int64 — bitwise everywhere. */
  def hashedCross(df: DataFrame, cols: Seq[String], dim: Int): DataFrame = {
    val raw = df
      .select(concat_ws("|", cols.map(c => col(c).cast("string")): _*)
        .as("raw"))
      .groupBy(col("raw")).agg(count(lit(1)).as("n_rows"))
    raw
      .select(Sampling.md5Slot(concat(lit("cross:"), col("raw")), dim)
        .as("bucket"), col("raw"), col("n_rows"))
      .groupBy(col("bucket"))
      .agg(sum(col("n_rows")).as("n_rows"),
        count(lit(1)).as("n_crosses"),
        min(col("raw")).as("min_cross"))
  }

  /** DuckDB mirror of [[hashedCross]] over a `(raw)` SELECT (one row per
    * input row, the pre-concatenated cross string). */
  def duckHashedCrossSql(rawSql: String, dim: Int): String =
    s"""WITH raw AS (
       |  SELECT raw, CAST(count(*) AS BIGINT) AS n_rows
       |  FROM ($rawSql) q0 GROUP BY 1),
       |h AS (
       |  SELECT ${Sampling.duckMd5Slot("'cross:' || raw", dim)} AS bucket,
       |    raw, n_rows
       |  FROM raw)
       |SELECT bucket, CAST(sum(n_rows) AS BIGINT) AS n_rows,
       |  CAST(count(*) AS BIGINT) AS n_crosses,
       |  min(raw) AS min_cross
       |FROM h GROUP BY 1""".stripMargin

  /** Cross-source quantile normalization (the batch-effect alignment of
    * bioinformatics, applied to corpus features): every document's value
    * is replaced by the REFERENCE source's value at the same quantile
    * position, so all sources share the reference's distribution exactly
    * — the rank-based alternative to z-scoring when source distributions
    * differ in SHAPE, not just location (a mean/variance affine map
    * can't fix a skew mismatch; a rank map does).
    *
    * Exact: within-source rank under the total order (value, doc_id);
    * the mapped reference rank is `⌈r·n_ref / n_s⌉` in pure integers;
    * `x_norm` is an ORDER STATISTIC — an exact copy of an existing
    * reference value, never arithmetic. Reference docs map to
    * themselves. Scale: per-source rank windows (the CCNet-percentile
    * exchange) + a rank-keyed join against the reference table
    * (reference-sized — broadcast when one source fits, else a plain
    * equi-join); the GK-sketch variant replaces the exact ranks at
    * extreme scale with this form as its oracle
    * ([[quantileBinApprox]] pattern). */
  def quantileNormalize(docs: DataFrame, v: String, key: String,
      ref: String): DataFrame = {
    val wR = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("x"), col("doc_id"))
    val wN = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
    val ranked = docs
      .selectExpr("doc_id", s"$key AS src", s"CAST($v AS BIGINT) AS x")
      .withColumn("r", row_number().over(wR))
      .withColumn("ns", count(lit(1)).over(wN))
    val refTab = ranked.filter(col("src") === ref)
      .select(col("r").as("rr"), col("x").as("x_norm"))
    val refN = refTab.agg(count(lit(1)).cast("long").as("n_ref"))
    ranked.crossJoin(broadcast(refN))
      .withColumn("rr", expr(
        "CAST((CAST(r AS BIGINT) * n_ref + ns - 1) DIV ns AS INT)"))
      .join(broadcast(refTab), Seq("rr"))
      .selectExpr("doc_id", "src AS source", "x", "r AS src_rank",
        "x_norm")
  }

  /** DuckDB mirror of [[quantileNormalize]] over the documents table. */
  def duckQuantileNormalizeSql(v: String, key: String, ref: String,
      src: String = "documents"): String =
    s"""WITH ranked AS (
       |  SELECT doc_id, $key AS src, CAST($v AS BIGINT) AS x,
       |    CAST(row_number() OVER (PARTITION BY $key
       |      ORDER BY CAST($v AS BIGINT), doc_id) AS INTEGER) AS r,
       |    CAST(count(*) OVER (PARTITION BY $key) AS BIGINT) AS ns
       |  FROM $src),
       |reft AS (SELECT r AS rr, x AS x_norm FROM ranked
       |         WHERE src = '$ref'),
       |refn AS (SELECT CAST(count(*) AS BIGINT) AS n_ref FROM reft)
       |SELECT ranked.doc_id, ranked.src AS source, ranked.x,
       |  ranked.r AS src_rank, reft.x_norm
       |FROM ranked
       |CROSS JOIN refn
       |JOIN reft ON reft.rr =
       |  CAST((CAST(ranked.r AS BIGINT) * refn.n_ref + ranked.ns - 1)
       |    // ranked.ns AS INTEGER)""".stripMargin
}
