package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed PCA: top principal component of the embedding covariance
  * via QUANTIZED power iteration — the spectral summary behind embedding
  * whitening, anisotropy ("all vectors share a dominant direction")
  * diagnosis, and low-rank compression decisions.
  *
  * == Decomposition ==
  * The corpus-sized work is ONE pass building model-sized sufficient
  * statistics: components quantized to `q = floor(x·2^20)` int64, then
  * `S_i = Σ q_i`, `P_ij = Σ q_i·q_j`, `N` — exact order-free integer
  * sums (the [[graft.ops.NaiveBayes]] sufficient-statistics shape). The
  * scatter matrix `M_ij = N·P_ij − S_i·S_j` (= N²·covariance in 2^40
  * units) lives on the dim² grid; everything after runs on the MODEL,
  * not the corpus (collected like the NB stats — planning metadata, not
  * data).
  *
  * == Deterministic iteration ==
  * Floating power iteration would drift across engines (summation
  * order), so every round is pure integer arithmetic, bitwise under any
  * execution order (the quantized-PageRank discipline,
  * [[Dedup.pagerankHubs]]):
  *   - `m_ij = (N·P_ij − S_i·S_j) intdiv (N²·1024)` — scale-free bound
  *     |m| ≤ 2^30·max|x|² at ANY corpus size (intdiv = both engines'
  *     truncate-toward-zero integer division)
  *   - `v₀ = 2^20·e_argmax(diag m)` (tie → smallest index)
  *   - repeat: `w = m·v` (|w| ≤ dim·2^50), rescale
  *     `v ← w intdiv max(1, ceil(max|w|/2^20))` so |v| ≤ 2^20
  * After `iters` rounds: `vᵀv`, `trace(m)` and the Rayleigh numerator
  * `ray = Σ v_i·(w_i intdiv 2^26)` are exact int64; the reported
  * `v_unit = v_q/√(vᵀv)` and `var_frac = ray·2^26/(vᵀv·trace)` (the
  * explained-variance share of the top component) are fixed IEEE trees
  * Java and DuckDB evaluate identically. Degenerate inputs (zero
  * scatter) yield NULL doubles, the shared convention.
  *
  * == Scale shape ==
  * The (i, j) product aggregation is one vec_id-co-partitioned self-join
  * + groupBy with map-side partials (dim²-bounded output); a native
  * upper-triangle kernel emitting dim(dim+1)/2 products per row would
  * halve the shuffle if dim² payloads ever dominated. Magnitude bound:
  * N·P fits int64 through N ≈ 10⁵ at dim-64/unit-scale embeddings —
  * production sums in DECIMAL(38) (the [[Regression]] convention) or
  * per-partition pre-scaled partials. */
object Pca {

  val Scale = 1048576L // 2^20 component / vector quantization
  val MDiv  = 1024L    // m = M intdiv (N^2 * MDiv)
  val RayDiv = 67108864L // 2^26 Rayleigh-numerator downscale

  /** One row per dimension: (pos, v_q, v_unit, ray_q, trace_m, var_frac,
    * n). */
  def powerIteration(embeddings: DataFrame, iters: Int): DataFrame = {
    val spark = embeddings.sparkSession
    val q = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)")
          .as("qv"))
    val n = embeddings.agg(count(lit(1))).collect()(0).getLong(0)
    val sArr = q.groupBy(col("i")).agg(sum(col("qv")).as("si"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dim = if (sArr.isEmpty) 0 else sArr.keys.max + 1
    val pRows = q.as("a").join(q.as("b"), "vec_id")
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(expr("a.qv * b.qv")).as("pij"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val m = Array.tabulate(dim, dim)((i, j) =>
      (n * pRows.getOrElse((i, j), 0L) - sArr(i) * sArr(j)) / (n * n * MDiv))
    // v0 = 2^20 * e_k, k = argmax diag (tie -> smallest index)
    val k0 = (0 until dim).maxBy(i => (m(i)(i), -i))
    var v = Array.tabulate(dim)(i => if (i == k0) Scale else 0L)
    def matvec(vv: Array[Long]): Array[Long] =
      Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(0L)((acc, j) => acc + m(i)(j) * vv(j)))
    for (_ <- 0 until iters) {
      val w = matvec(v)
      val maxw = w.map(x => math.abs(x)).max
      val sc = math.max(1L, (maxw + Scale - 1) / Scale)
      v = w.map(_ / sc)
    }
    val w = matvec(v)
    val ray = (0 until dim).foldLeft(0L)((acc, i) =>
      acc + v(i) * (w(i) / RayDiv))
    val vTv = v.foldLeft(0L)((acc, x) => acc + x * x)
    val trace = (0 until dim).foldLeft(0L)((acc, i) => acc + m(i)(i))
    val vUnit: Int => Any = i =>
      if (vTv == 0) null
      else java.lang.Double.valueOf(v(i).toDouble / math.sqrt(vTv.toDouble))
    val varFrac: Any =
      if (vTv == 0 || trace == 0) null
      else java.lang.Double.valueOf(
        ray.toDouble * RayDiv.toDouble / (vTv.toDouble * trace.toDouble))
    val schema = StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("v_q", LongType, nullable = false),
      StructField("v_unit", DoubleType, nullable = true),
      StructField("ray_q", LongType, nullable = false),
      StructField("trace_m", LongType, nullable = false),
      StructField("var_frac", DoubleType, nullable = true),
      StructField("n", LongType, nullable = false)))
    val rows = (0 until dim).map(i =>
      Row(i, v(i), vUnit(i), ray, trace, varFrac, n))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** DuckDB mirror of [[powerIteration]] — identical quantization,
    * identical integer rounds (the matvec + rescale as a recursive CTE
    * with one window max per round), identical boundary doubles. */
  def duckSql(src: String, iters: Int): String =
    s"""WITH RECURSIVE
       |q AS MATERIALIZED (
       |  SELECT vec_id, i, CAST(floor(CAST(x AS DOUBLE) * 1048576.0)
       |    AS BIGINT) AS qv
       |  FROM (SELECT vec_id, unnest(embedding) AS x,
       |          generate_subscripts(embedding, 1) - 1 AS i
       |        FROM $src)),
       |nn AS (SELECT count(*) AS n FROM $src),
       |s AS (SELECT i, CAST(sum(qv) AS BIGINT) AS si FROM q GROUP BY 1),
       |m AS MATERIALIZED (
       |  SELECT p.i, p.j,
       |    (nn.n * p.pij - sa.si * sb.si) // (nn.n * nn.n * $MDiv) AS mij
       |  FROM (SELECT a.i AS i, b.i AS j,
       |          CAST(sum(a.qv * b.qv) AS BIGINT) AS pij
       |        FROM q a JOIN q b ON a.vec_id = b.vec_id
       |        GROUP BY 1, 2) p
       |  JOIN s sa ON sa.i = p.i
       |  JOIN s sb ON sb.i = p.j
       |  CROSS JOIN nn),
       |k0 AS (SELECT i FROM m WHERE i = j
       |       ORDER BY mij DESC, i ASC LIMIT 1),
       |it AS (
       |  SELECT 0 AS r, s.i,
       |    CASE WHEN s.i = k0.i THEN CAST($Scale AS BIGINT)
       |         ELSE CAST(0 AS BIGINT) END AS v
       |  FROM s CROSS JOIN k0
       |  UNION ALL
       |  SELECT r + 1, i,
       |    w // greatest(1, (max(abs(w)) OVER () + ${Scale - 1}) // $Scale)
       |  FROM (
       |    SELECT it.r AS r, m.i AS i,
       |      CAST(sum(m.mij * it.v) AS BIGINT) AS w
       |    FROM it JOIN m ON m.j = it.i
       |    WHERE it.r < $iters
       |    GROUP BY 1, 2) t),
       |vfin AS (SELECT i, v FROM it WHERE r = $iters),
       |wfin AS (
       |  SELECT m.i, CAST(sum(m.mij * vfin.v) AS BIGINT) AS w
       |  FROM m JOIN vfin ON vfin.i = m.j GROUP BY 1),
       |scal AS (
       |  SELECT
       |    CAST(sum(vfin.v * (wfin.w // $RayDiv)) AS BIGINT) AS ray,
       |    CAST(sum(vfin.v * vfin.v) AS BIGINT) AS vtv
       |  FROM vfin JOIN wfin ON wfin.i = vfin.i),
       |tr AS (SELECT CAST(sum(mij) AS BIGINT) AS trace_m
       |       FROM m WHERE i = j)
       |SELECT CAST(vfin.i AS INTEGER) AS pos, vfin.v AS v_q,
       |  CASE WHEN scal.vtv = 0 THEN CAST(NULL AS DOUBLE)
       |       ELSE CAST(vfin.v AS DOUBLE) / sqrt(CAST(scal.vtv AS DOUBLE))
       |  END AS v_unit,
       |  scal.ray AS ray_q, tr.trace_m,
       |  CASE WHEN scal.vtv = 0 OR tr.trace_m = 0 THEN CAST(NULL AS DOUBLE)
       |       ELSE CAST(scal.ray AS DOUBLE) * CAST($RayDiv AS DOUBLE)
       |            / (CAST(scal.vtv AS DOUBLE) * CAST(tr.trace_m AS DOUBLE))
       |  END AS var_frac,
       |  nn.n
       |FROM vfin CROSS JOIN scal CROSS JOIN tr CROSS JOIN nn""".stripMargin
}
