package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`embedding: array<float>`).
  *
  * == Scale design ==
  *  - [[bruteTopK]] is the exact baseline: broadcast the (small) query set
  *    against the full corpus — one narrow pass, no shuffle of the corpus,
  *    top-k via per-query window. Right for |queries| ≪ |corpus|.
  *  - [[lshBuckets]] is the scale path: random-hyperplane signs (seeded,
  *    deterministic) bucket the corpus; candidates only meet inside a
  *    bucket — an equi-join instead of a cross product. Recall is tuned by
  *    bands/bits exactly like MinHash LSH. (An IVF variant — k-means
  *    centroid assignment — slots into the same bucket-join shape.)
  *  - cosine runs in the native [[expressions.CosineSim]] kernel
  *    (primitive-array fold, bitwise-mirrored in the DuckDB oracle).
  */
object Similarity {

  /** Exact brute-force top-k cosine neighbors for `vec_id < nQueries`. */
  def bruteTopK(embeddings0: DataFrame, nQueries: Int, k: Int): DataFrame = {
    expressions.register(embeddings0.sparkSession)
    val embeddings = graft.core.Partitioning.balance(embeddings0, "vec_id")
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = embeddings.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr("graft_cosine(qv, embedding)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"))
  }

  /** DuckDB mirror of [[bruteTopK]] — identical fold order for dot/norms. */
  def duckBruteTopKSql(nQueries: Int, k: Int): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qv
       |  FROM embeddings WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    (SELECT CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
       |            ELSE dot / sqrt(na * nb) END
       |     FROM (SELECT
       |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |         list_transform(q.qv, (x, i) ->
       |           CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))),
       |         (a, b) -> a + b) AS dot,
       |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |         list_transform(q.qv, x ->
       |           CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       |         (a, b) -> a + b) AS na,
       |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |         list_transform(e.embedding, x ->
       |           CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       |         (a, b) -> a + b) AS nb)) AS cos
       |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
       |FROM ranked WHERE rank <= $k""".stripMargin

  /** Sign-LSH bucket id: sign pattern of dot products against `nPlanes`
    * deterministic pseudo-random hyperplanes (seeded integer grid —
    * reproducible across engines). */
  def lshBuckets(embeddings0: DataFrame, nPlanes: Int): DataFrame = {
    expressions.register(embeddings0.sparkSession)
    val embeddings = graft.core.Partitioning.balance(embeddings0, "vec_id")
    // plane p component j = ((p*8191 + j*127 + 13) % 17) - 8  (small ints)
    val dot = (0 until nPlanes).map { p =>
      val planeExpr =
        s"""aggregate(zip_with(embedding,
           |  transform(sequence(0, size(embedding) - 1),
           |    j -> CAST((($p * 8191 + j * 127 + 13) % 17) - 8 AS DOUBLE)),
           |  (x, c) -> CAST(x AS DOUBLE) * c),
           |  CAST(0.0 AS DOUBLE), (a, b) -> a + b)""".stripMargin
      expr(s"IF($planeExpr > 0.0, CAST(${1L << p} AS BIGINT), CAST(0 AS BIGINT))")
    }.reduce(_ + _)
    embeddings.select(col("vec_id"), col("label"), dot.as("bucket"))
  }

  /** Recall@k of the LSH bucket path vs the exact baseline: approximate
    * neighbors = exact-cosine top-k *within the query's bucket*; recall =
    * |approx ∩ exact| / k per query (0 when the bucket has no candidates).
    * The measurement the scale path needs before anyone trusts it. */
  def annRecall(embeddings0: DataFrame, nQueries: Int, k: Int,
                nPlanes: Int): DataFrame = {
    expressions.register(embeddings0.sparkSession)
    val exact = bruteTopK(embeddings0, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val b = lshBuckets(embeddings0, nPlanes).select(col("vec_id"), col("bucket"))
    val qb = b.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("bucket"))
    val cand = b.join(qb, Seq("bucket")).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val queries = embeddings0.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = cand
      .join(embeddings0.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cos", expr("graft_cosine(qv, embedding)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val approx = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    qb.select(col("query_id"))
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / k).as("recall_at_k"))
  }

  /** DuckDB mirror of [[annRecall]]. */
  def duckAnnRecallSql(nQueries: Int, k: Int, nPlanes: Int): String =
    s"""WITH exact AS (
       |  SELECT query_id, neighbor_id
       |  FROM (${duckBruteTopKSql(nQueries, k)})),
       |b AS (SELECT vec_id, bucket FROM (${duckLshBucketsSql(nPlanes)})),
       |qb AS (SELECT vec_id AS query_id, bucket FROM b WHERE vec_id < $nQueries),
       |cand AS (
       |  SELECT qb.query_id, b.vec_id
       |  FROM b JOIN qb USING (bucket) WHERE b.vec_id <> qb.query_id),
       |scored AS (
       |  SELECT c.query_id, c.vec_id AS neighbor_id,
       |    (SELECT CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
       |            ELSE dot / sqrt(na * nb) END
       |     FROM (SELECT
       |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |         list_transform(q.embedding, (x, i) ->
       |           CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))),
       |         (a, b) -> a + b) AS dot,
       |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |         list_transform(q.embedding, x ->
       |           CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       |         (a, b) -> a + b) AS na,
       |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |         list_transform(e.embedding, x ->
       |           CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       |         (a, b) -> a + b) AS nb)) AS cos
       |  FROM cand c
       |  JOIN embeddings e ON e.vec_id = c.vec_id
       |  JOIN embeddings q ON q.vec_id = c.query_id),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY cos DESC, neighbor_id ASC) AS rank
       |    FROM scored)
       |  WHERE rank <= $k),
       |hits AS (
       |  SELECT e.query_id, count(*) AS n_hits
       |  FROM exact e JOIN approx a
       |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
       |  GROUP BY e.query_id)
       |SELECT q.query_id,
       |  coalesce(h.n_hits, 0) AS n_hits,
       |  CAST(coalesce(h.n_hits, 0) AS DOUBLE) / $k AS recall_at_k
       |FROM qb q LEFT JOIN hits h USING (query_id)""".stripMargin

  /** IVF coarse quantizer: cells = the first `nCells` corpus vectors on a
    * deterministic stride (the sampled-centroid bootstrap of IVF — a
    * trained k-means would slot into the same shape); every vector is
    * assigned to its max-cosine centroid (ties → lowest centroid id).
    * Assignment is one broadcast of `nCells` centroids against the corpus —
    * a narrow pass, no shuffle of the big side. */
  def ivfCells(embeddings0: DataFrame, nCells: Int): DataFrame = {
    expressions.register(embeddings0.sparkSession)
    val embeddings = graft.core.Partitioning.balance(embeddings0, "vec_id")
    val cents = embeddings0.filter(expr("vec_id % 37 = 3"))
      .orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cell").asc)
    embeddings.crossJoin(broadcast(cents))
      .withColumn("ccos", expr("graft_cosine(cv, embedding)"))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("label"), col("cell"))
  }

  /** Recall@k of the IVF path: approximate neighbors = exact top-k within
    * the query's `nProbe` nearest cells. Same trust measurement as
    * [[annRecall]], IVF shape: candidate set = equi-join on cell id. */
  def ivfRecall(embeddings0: DataFrame, nQueries: Int, k: Int,
                nCells: Int, nProbe: Int): DataFrame = {
    expressions.register(embeddings0.sparkSession)
    val exact = bruteTopK(embeddings0, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val cells = ivfCells(embeddings0, nCells).select(col("vec_id"), col("cell"))
    // queries probe their nProbe max-cosine cells
    val cents = embeddings0.filter(expr("vec_id % 37 = 3"))
      .orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    val queries = embeddings0.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cell").asc)
    val probed = queries.crossJoin(broadcast(cents))
      .withColumn("ccos", expr("graft_cosine(cv, qv)"))
      .withColumn("crank", row_number().over(wq))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("cell"))
    val cand = cells.join(probed, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val scored = cand
      .join(embeddings0.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cos", expr("graft_cosine(qv, embedding)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val approx = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    queries.select(col("query_id"))
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / k).as("recall_at_k"))
  }

  /** Embedding-cosine near-duplicate pairs: candidates meet inside a
    * sign-LSH bucket (equi-join, never all-pairs), then the exact cosine
    * verifies against `minCos`. The embedding-space member of the dedup
    * family (exact / MinHash / SimHash / n-gram are token/text-space). */
  def embeddingNearDups(embeddings0: DataFrame, nPlanes: Int,
                        minCos: Double): DataFrame = {
    expressions.register(embeddings0.sparkSession)
    val b = lshBuckets(embeddings0, nPlanes)
      .join(embeddings0.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("vec_id"), col("bucket"), col("embedding"))
    val l = b.as("l"); val r = b.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") &&
        col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos", expr("graft_cosine(l.embedding, r.embedding)"))
      .filter(col("cos") >= minCos)
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"),
        col("cos"))
  }

  /** DuckDB mirror of [[embeddingNearDups]]. */
  def duckEmbeddingNearDupsSql(nPlanes: Int, minCos: Double): String =
    s"""WITH b AS (SELECT vec_id, bucket FROM (${duckLshBucketsSql(nPlanes)})),
       |cand AS (
       |  SELECT l.vec_id AS vec_a, r.vec_id AS vec_b
       |  FROM b l JOIN b r
       |    ON l.bucket = r.bucket AND l.vec_id < r.vec_id),
       |scored AS (
       |  SELECT c.vec_a, c.vec_b,
       |    ${duckCosine("ea.embedding", "eb.embedding")} AS cos
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.vec_a
       |  JOIN embeddings eb ON eb.vec_id = c.vec_b)
       |SELECT vec_a, vec_b, cos FROM scored
       |WHERE cos >= ${graft.queries.Duck.lit(minCos)}""".stripMargin

  private def duckCosine(a: String, b: String): String =
    s"""(SELECT CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
       |        ELSE dot / sqrt(na * nb) END
       | FROM (SELECT
       |   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |     list_transform($a, (x, i) ->
       |       CAST(x AS DOUBLE) * CAST(($b)[i] AS DOUBLE))),
       |     (a0, b0) -> a0 + b0) AS dot,
       |   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |     list_transform($a, x ->
       |       CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       |     (a0, b0) -> a0 + b0) AS na,
       |   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |     list_transform($b, x ->
       |       CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       |     (a0, b0) -> a0 + b0) AS nb))""".stripMargin

  /** DuckDB mirror of [[ivfCells]]. */
  def duckIvfCellsSql(nCells: Int): String =
    s"""WITH cents AS (
       |  SELECT vec_id AS cell, embedding AS cv FROM embeddings
       |  WHERE vec_id % 37 = 3 ORDER BY vec_id LIMIT $nCells),
       |assigned AS (
       |  SELECT e.vec_id, e.label, c.cell,
       |    ${duckCosine("c.cv", "e.embedding")} AS ccos
       |  FROM embeddings e CROSS JOIN cents c),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY ccos DESC, cell ASC) AS crank
       |  FROM assigned)
       |SELECT vec_id, label, cell FROM ranked WHERE crank = 1""".stripMargin

  /** DuckDB mirror of [[ivfRecall]]. */
  def duckIvfRecallSql(nQueries: Int, k: Int, nCells: Int, nProbe: Int): String =
    s"""WITH exact AS (
       |  SELECT query_id, neighbor_id
       |  FROM (${duckBruteTopKSql(nQueries, k)})),
       |cells AS (SELECT vec_id, cell FROM (${duckIvfCellsSql(nCells)})),
       |cents AS (
       |  SELECT vec_id AS cell, embedding AS cv FROM embeddings
       |  WHERE vec_id % 37 = 3 ORDER BY vec_id LIMIT $nCells),
       |q AS (SELECT vec_id AS query_id, embedding AS qv
       |      FROM embeddings WHERE vec_id < $nQueries),
       |probed0 AS (
       |  SELECT q.query_id, c.cell,
       |    ${duckCosine("c.cv", "q.qv")} AS ccos
       |  FROM q CROSS JOIN cents c),
       |probed AS (
       |  SELECT query_id, cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY ccos DESC, cell ASC) AS crank
       |    FROM probed0)
       |  WHERE crank <= $nProbe),
       |cand AS (
       |  SELECT p.query_id, s.vec_id
       |  FROM cells s JOIN probed p USING (cell)
       |  WHERE s.vec_id <> p.query_id),
       |scored AS (
       |  SELECT c.query_id, c.vec_id AS neighbor_id,
       |    ${duckCosine("q.qv", "e.embedding")} AS cos
       |  FROM cand c
       |  JOIN embeddings e ON e.vec_id = c.vec_id
       |  JOIN q ON q.query_id = c.query_id),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY cos DESC, neighbor_id ASC) AS rank
       |    FROM scored)
       |  WHERE rank <= $k),
       |hits AS (
       |  SELECT e.query_id, count(*) AS n_hits
       |  FROM exact e JOIN approx a
       |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
       |  GROUP BY e.query_id)
       |SELECT q.query_id,
       |  coalesce(h.n_hits, 0) AS n_hits,
       |  CAST(coalesce(h.n_hits, 0) AS DOUBLE) / $k AS recall_at_k
       |FROM q LEFT JOIN hits h USING (query_id)""".stripMargin

  def duckLshBucketsSql(nPlanes: Int): String = {
    val bits = (0 until nPlanes).map { p =>
      s"""CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  list_transform(embedding, (x, j) ->
         |    CAST(x AS DOUBLE) *
         |    CAST((($p * 8191 + (j - 1) * 127 + 13) % 17) - 8 AS DOUBLE))),
         |  (a, b) -> a + b) > 0.0 THEN ${1L << p} ELSE 0 END""".stripMargin
    }.mkString(" + ")
    s"SELECT vec_id, label, CAST($bits AS BIGINT) AS bucket FROM embeddings"
  }
}
