package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise Pearson correlation matrix over INTEGER feature columns —
  * the collinearity screen a feature-engineering pipeline runs before
  * model fitting (drop one of every near-duplicate pair).
  *
  * == Exactness ==
  * All moment sums (`Σx_i`, `Σx_i·x_j`, n) are exact int64 — order-free,
  * partition-invariant — and each correlation is assembled from them at
  * the very end: `(n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))`,
  * three IEEE ops (two casts feed one divide·sqrt·multiply chain) with
  * the identical expression shape in DuckDB → bitwise. Constant features
  * (zero variance) yield NULL. Magnitude bound: `n·Σxy ≤ n²·max|x·y|` —
  * int64-safe through ~10^6 rows of 16-bit-scale features at the gate;
  * at 10^12 rows pre-aggregate per shard and combine the moment sums (they
  * are mergeable by construction), or widen to DECIMAL(38).
  *
  * == Scale shape ==
  * ONE global aggregation with map-side partials (no shuffle beyond the
  * final 1-row combine) computes every moment in a single pass over the
  * scan — F(F+3)/2 running sums, F = |features|. The pair rows are then
  * exploded from the single moments row: report size is F², independent
  * of corpus size. */
object FeatureStats {

  /** Correlation rows `(f1, f2, n, corr)` for every pair f1 < f2 of
    * `feats` (column names of integer-valued columns in `df`). */
  def corrMatrix(df: DataFrame, feats: Seq[String]): DataFrame = {
    require(feats.size >= 2, s"need >= 2 features: $feats")
    val base = df.select(feats.map(f => col(f).cast("long").as(f)): _*)
    val moments =
      Seq(count(lit(1)).as("n")) ++
        feats.map(f => sum(col(f)).as(s"s_$f")) ++
        (for (i <- feats.indices; j <- i until feats.size)
          yield sum(col(feats(i)) * col(feats(j)))
            .as(s"q_${feats(i)}_${feats(j)}"))
    val m = base.agg(moments.head, moments.tail: _*)
    val pairExprs = for {
      i <- feats.indices; j <- (i + 1) until feats.size
      a = feats(i); b = feats(j)
    } yield struct(
      lit(a).as("f1"), lit(b).as("f2"),
      expr(s"""CASE WHEN (n * q_${a}_${a} - s_$a * s_$a) > 0
              |      AND (n * q_${b}_${b} - s_$b * s_$b) > 0 THEN
              |  CAST(n * q_${a}_${b} - s_$a * s_$b AS DOUBLE)
              |  / sqrt(CAST(n * q_${a}_${a} - s_$a * s_$a AS DOUBLE)
              |         * CAST(n * q_${b}_${b} - s_$b * s_$b AS DOUBLE))
              |END""".stripMargin).as("corr"))
    m.select(col("n"), explode(array(pairExprs: _*)).as("p"))
      .select(col("p.f1").as("f1"), col("p.f2").as("f2"), col("n"),
        col("p.corr").as("corr"))
  }

  /** DuckDB mirror of [[corrMatrix]] over `baseSql` — a SELECT yielding
    * the integer feature columns named in `feats`. */
  def duckCorrSql(baseSql: String, feats: Seq[String]): String = {
    val sums =
      Seq("CAST(count(*) AS BIGINT) AS n") ++
        feats.map(f => s"CAST(sum($f) AS BIGINT) AS s_$f") ++
        (for (i <- feats.indices; j <- i until feats.size)
          yield s"CAST(sum(${feats(i)} * ${feats(j)}) AS BIGINT)" +
            s" AS q_${feats(i)}_${feats(j)}")
    val pairs = for {
      i <- feats.indices; j <- (i + 1) until feats.size
      a = feats(i); b = feats(j)
    } yield
      s"""SELECT '$a' AS f1, '$b' AS f2, n,
         |  CASE WHEN (n * q_${a}_${a} - s_$a * s_$a) > 0
         |        AND (n * q_${b}_${b} - s_$b * s_$b) > 0 THEN
         |    CAST(n * q_${a}_${b} - s_$a * s_$b AS DOUBLE)
         |    / sqrt(CAST(n * q_${a}_${a} - s_$a * s_$a AS DOUBLE)
         |           * CAST(n * q_${b}_${b} - s_$b * s_$b AS DOUBLE))
         |  END AS corr
         |FROM m""".stripMargin
    s"""WITH base AS ($baseSql),
       |m AS (SELECT ${sums.mkString(",\n    ")} FROM base)
       |${pairs.mkString("\nUNION ALL\n")}""".stripMargin
  }

  // ------------------------------------------------------------------
  // two-sample Kolmogorov–Smirnov drift (per group vs rest-of-corpus)
  // ------------------------------------------------------------------

  /** Per-group two-sample Kolmogorov–Smirnov statistic of an integer
    * feature vs the REST of the corpus — the rank-based drift screen that
    * needs no binning choice (the sibling of the token-space JSD in
    * [[LanguageModel.sourceDrift]]: that one compares discrete
    * distributions, this one compares a numeric feature's full CDF).
    *
    * `D_g = max_v |F_g(v) − F_rest(v)|` where both ECDFs are step
    * functions jumping only at observed values, so the max over the
    * observed value domain is the EXACT statistic.
    *
    * == Exactness ==
    * Per value: cumulative counts `cum_g`, `cum_rest` are exact int64
    * window sums; the comparison is done on the integer cross-product
    * form `|cum_g·n_rest − cum_rest·n_g|` (no float enters the argmax),
    * and `D` is assembled at the boundary as one multiply + one divide of
    * exact casts → bitwise across engines. `ks_at` is the SMALLEST value
    * attaining the max (total tie order). Magnitude bound: the products
    * are ≤ N² — int64-safe through ~3·10⁹ rows; beyond that widen the
    * two products to DECIMAL(38) (they stay mergeable), as with
    * [[corrMatrix]]'s moment sums.
    *
    * == Scale shape ==
    * The ONLY corpus exchange is the `(grp, v)` count (map-side partials);
    * everything after runs on the |V|×|groups| grid. For continuous /
    * unbounded-domain features pre-discretize with
    * [[Binning.quantileBin]] (or the Greenwald–Khanna
    * `quantileBinApprox` sketch path at extreme scale) so |V| ≤ k —
    * the KS of the binned variable lower-bounds the raw one. Groups with
    * an empty complement (single-group corpus) yield NULL `ks`. */
  def ksDrift(df: DataFrame, valueCol: String, grpCol: String): DataFrame = {
    val c = df
      .groupBy(col(grpCol).cast("string").as("grp"),
        col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val vall = c.groupBy("v").agg(sum("c").as("cv"))
    val ns = c.groupBy("grp").agg(sum("c").as("n_grp"))
    val tot = vall.agg(sum("cv").as("n_all"))
    val grid = ns.crossJoin(broadcast(vall))
      .join(c, Seq("grp", "v"), "left")
      .select(col("grp"), col("v"), col("n_grp"), col("cv"),
        coalesce(col("c"), lit(0L)).as("cg"))
      .crossJoin(broadcast(tot))
      .withColumn("cr", col("cv") - col("cg"))
      .withColumn("n_rest", col("n_all") - col("n_grp"))
    val w = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid
      .withColumn("diff",
        abs(sum(col("cg")).over(w) * col("n_rest")
          - sum(col("cr")).over(w) * col("n_grp")))
    val rw = Window.partitionBy("grp")
      .orderBy(col("diff").desc, col("v").asc)
    cum.withColumn("__rn", row_number().over(rw))
      .where(col("__rn") === 1)
      .select(col("grp").as("source"), col("n_grp"), col("n_rest"),
        col("v").as("ks_at"),
        when(col("n_rest") > 0,
          col("diff").cast("double")
            / (col("n_grp").cast("double") * col("n_rest").cast("double")))
          .as("ks"))
  }

  /** DuckDB mirror of [[ksDrift]] over `baseSql` — a SELECT yielding
    * (grp VARCHAR, v BIGINT). Same grid, same integer cross-product
    * argmax, same boundary IEEE ops. */
  def duckKsSql(baseSql: String): String =
    s"""WITH base AS ($baseSql),
       |c AS (SELECT grp, v, count(*) AS c FROM base GROUP BY 1, 2),
       |vall AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM c GROUP BY 1),
       |ns AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_grp FROM c GROUP BY 1),
       |tot AS (SELECT CAST(sum(cv) AS BIGINT) AS n_all FROM vall),
       |grid AS (
       |  SELECT ns.grp, vall.v, ns.n_grp, vall.cv,
       |    coalesce(c.c, 0) AS cg, vall.cv - coalesce(c.c, 0) AS cr,
       |    tot.n_all - ns.n_grp AS n_rest
       |  FROM ns CROSS JOIN vall CROSS JOIN tot
       |  LEFT JOIN c ON c.grp = ns.grp AND c.v = vall.v),
       |cum AS (
       |  SELECT grp, v, n_grp, n_rest,
       |    abs(CAST(sum(cg) OVER w AS BIGINT) * n_rest
       |        - CAST(sum(cr) OVER w AS BIGINT) * n_grp) AS diff
       |  FROM grid
       |  WINDOW w AS (PARTITION BY grp ORDER BY v
       |               ROWS UNBOUNDED PRECEDING)),
       |r AS (SELECT *, row_number() OVER (
       |        PARTITION BY grp ORDER BY diff DESC, v ASC) AS rn FROM cum)
       |SELECT grp AS source, n_grp, n_rest, v AS ks_at,
       |  CASE WHEN n_rest > 0 THEN
       |    CAST(diff AS DOUBLE)
       |    / (CAST(n_grp AS DOUBLE) * CAST(n_rest AS DOUBLE))
       |  END AS ks
       |FROM r WHERE rn = 1""".stripMargin

  // ------------------------------------------------------------------
  // population stability index (per group vs rest, quantile bins)
  // ------------------------------------------------------------------

  /** Per-group Population Stability Index of an integer feature vs the
    * rest of the corpus — THE standard model-monitoring drift score
    * (PSI < 0.1 stable / 0.1–0.25 moderate / > 0.25 action), complementing
    * [[ksDrift]]: KS reports the worst single CDF gap, PSI integrates
    * mass re-allocation across the whole distribution.
    *
    * `PSI_g = Σ_bins (p_i − q_i) · ln(p_i / q_i)` over the corpus's k
    * equal-frequency bins ([[Binning.quantileBin]]'s exact boundary rule,
    * REUSED — not re-stated — so binning cannot desynchronize from the
    * discretizer), with add-1 smoothing so empty bins stay finite:
    * `p_i = (c_gi + 1) / (n_g + k)`, `q_i` likewise over the complement.
    *
    * == Exactness ==
    * Each bin contributes `m_i · λ_i` where
    * `m_i = (c_gi+1)(n_r+k) − (c_ri+1)(n_g+k)` is exact int64 and
    * `λ_i = round(1e6 · ln(p_i/q_i))` is the micro-nat-quantized log term
    * (the [[LanguageModel.sourceDrift]] idiom — order-free int64 weighted
    * sums; the single `ln` per GRID CELL is the only transcendental).
    * PSI = one divide chain at the boundary. Magnitude: `|m_i| ≤ N²` and
    * `|λ_i| ≤ ~4·10⁷`, so the int64 sum is safe through ~10⁴ rows per
    * 1e6-row corpus cell; at extreme scale divide `m_i` by a power of two
    * or widen the term to DECIMAL(38) (still mergeable).
    *
    * == Scale shape ==
    * The quantile window is the one global-order exchange (swap in
    * `quantileBinApprox`'s mergeable sketch boundaries at extreme scale);
    * after binning the ONLY exchange is the (grp, bin) count — the grid
    * is |groups|×k. */
  def psiDrift(df0: DataFrame, v: String, key: String, grp: String,
               k: Int): DataFrame = {
    val df = df0.select(col(key).as("key"),
      col(grp).cast("string").as("grp"), col(v).cast("long").as("x"))
    val binned = Binning.quantileBin(df, "x", "key", k)
      .join(df.select("key", "grp"), Seq("key"))
    val cgb = binned.groupBy("grp", "bin").agg(count(lit(1)).as("c"))
    val cb = cgb.groupBy("bin").agg(sum("c").as("cb"))
    val ng = cgb.groupBy("grp").agg(sum("c").as("n_grp"))
    val tot = cb.agg(sum("cb").as("n_all"))
    val grid = ng.crossJoin(broadcast(cb))
      .join(cgb, Seq("grp", "bin"), "left")
      .select(col("grp"), col("bin"), col("n_grp"), col("cb"),
        coalesce(col("c"), lit(0L)).as("cg"))
      .crossJoin(broadcast(tot))
      .withColumn("cr", col("cb") - col("cg"))
      .withColumn("n_rest", col("n_all") - col("n_grp"))
    val lam =
      s"""CAST(round(ln(
         |  CAST((cg + 1) * (n_rest + $k) AS DOUBLE)
         |  / CAST((cr + 1) * (n_grp + $k) AS DOUBLE)) * 1000000)
         |  AS BIGINT)""".stripMargin
    grid
      .withColumn("term",
        expr(s"((cg + 1) * (n_rest + $k) - (cr + 1) * (n_grp + $k))")
          * expr(lam))
      .groupBy("grp")
      .agg(min("n_grp").as("n_grp"), min("n_rest").as("n_rest"),
        sum("term").as("psi_sum"))
      .select(col("grp").as("source"), col("n_grp"), col("n_rest"),
        when(col("n_rest") > 0,
          col("psi_sum").cast("double")
            / ((col("n_grp") + lit(k)).cast("double")
              * (col("n_rest") + lit(k)).cast("double"))
            / lit(1000000.0)).as("psi"))
  }

  /** DuckDB mirror of [[psiDrift]] over `baseSql` — a SELECT yielding
    * (key, grp VARCHAR, x BIGINT). Binning delegates to
    * [[Binning.duckSql]] (the same boundary/assignment rule object). */
  def duckPsiSql(baseSql: String, k: Int): String =
    s"""WITH base AS ($baseSql),
       |bins AS (${Binning.duckSql("SELECT key, x FROM base", k)}),
       |b2 AS (SELECT bins.bin, base.grp FROM bins JOIN base USING (key)),
       |cgb AS (SELECT grp, bin, count(*) AS c FROM b2 GROUP BY 1, 2),
       |cb AS (SELECT bin, CAST(sum(c) AS BIGINT) AS cb FROM cgb GROUP BY 1),
       |ng AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_grp FROM cgb GROUP BY 1),
       |tot AS (SELECT CAST(sum(cb) AS BIGINT) AS n_all FROM cb),
       |grid AS (
       |  SELECT ng.grp, cb.bin, ng.n_grp, cb.cb,
       |    coalesce(cgb.c, 0) AS cg, cb.cb - coalesce(cgb.c, 0) AS cr,
       |    tot.n_all - ng.n_grp AS n_rest
       |  FROM ng CROSS JOIN cb CROSS JOIN tot
       |  LEFT JOIN cgb ON cgb.grp = ng.grp AND cgb.bin = cb.bin),
       |terms AS (
       |  SELECT grp, n_grp, n_rest,
       |    ((cg + 1) * (n_rest + $k) - (cr + 1) * (n_grp + $k))
       |    * CAST(round(ln(
       |        CAST((cg + 1) * (n_rest + $k) AS DOUBLE)
       |        / CAST((cr + 1) * (n_grp + $k) AS DOUBLE)) * 1000000)
       |      AS BIGINT) AS term
       |  FROM grid)
       |SELECT grp AS source, min(n_grp) AS n_grp, min(n_rest) AS n_rest,
       |  CASE WHEN min(n_rest) > 0 THEN
       |    CAST(CAST(sum(term) AS BIGINT) AS DOUBLE)
       |    / (CAST(min(n_grp) + $k AS DOUBLE)
       |       * CAST(min(n_rest) + $k AS DOUBLE))
       |    / 1000000.0
       |  END AS psi
       |FROM terms GROUP BY grp""".stripMargin
}
