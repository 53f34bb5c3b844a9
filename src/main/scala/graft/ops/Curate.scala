package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed training-data pipeline —
  * quality gate → exact dedup → near-dup cluster canonicalization →
  * deterministic split. Every stage is one of the engine's first-class
  * operators; this module only wires them, proving they COMPOSE (the
  * property a user of a curation stack actually relies on):
  *
  *   1. [[TextAnalysis.analyze]] quality/language gate (narrow projection)
  *   2. exact dedup — keep the min doc per md5(text) (one hash shuffle)
  *   3. [[Dedup.lshCandidates]] + [[Dedup.resolveClustersStar]] near-dup
  *      clusters (banded MinHash LSH, O(log n) star rounds); keep the min
  *      SURVIVING member per cluster, so a cluster whose canonical was
  *      quality-rejected still keeps its best remaining doc
  *   4. [[Sampling.assignSplit]] train/val/test (narrow, pure key hash)
  *
  * Scale shape: stages 1 and 4 add no exchange; stage 2 is one shuffle on
  * the text hash; stage 3 is the LSH equi-join + logarithmic component
  * rounds — nothing here is quadratic in corpus size. The oracle runs the
  * identical composition in DuckDB over the dedup subsample (the minhash
  * oracle-cost boundary documented at `CurationQueries.duckLshPairsSql`).
  *
  * Reference analog: the crawler's end-to-end ingest loop — filter,
  * de-duplicate against the pool, classify, commit
  * (`Source/Crawler/Crawler.cpp:934-998`).
  */
object Curate {

  /** Quality threshold on [[TextAnalysis.analyze]]'s `quality_score`; both
    * engines compute the score bitwise-identically (`text_analyze` oracle),
    * so the comparison is cross-engine consistent. */
  val MinQuality = 0.5

  /** Curate the subsampled documents table: returns one row per surviving
    * canonical doc — (doc_id, cluster, n_bpe_tokens, quality_score,
    * bucket, split). */
  def curateSub(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Seqs
    val docs = graft.core.Partitioning
      .readBalanced(spark, dir, "documents", "doc_id")
      .filter(expr(Seqs.DedupSubPred))
    // 1. quality + language gate
    val surv1 = TextAnalysis.analyze(docs)
      .filter(col("quality_score") >= MinQuality && col("lang_guess") === "en")
    // 2. exact dedup: min doc_id per text hash
    val surv2 = surv1
      .withColumn("__mn",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("__mn"))
    // 3. near-dup canonicalization on the token shingles
    val sq = Seqs.fromDocumentsSub(spark, dir)
    val clusters = Dedup.resolveClustersStar(
      sq.select("doc_id"), Dedup.lshCandidates(sq))
    val joined = surv2
      .withColumn("sid",
        concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0")))
      .join(clusters.withColumnRenamed("doc_id", "sid"), Seq("sid"))
    val canon = joined
      .withColumn("__cmn", min(col("sid")).over(Window.partitionBy("cluster")))
      .filter(col("sid") === col("__cmn"))
    // 4. deterministic split
    Sampling.assignSplit(
      canon.select("doc_id", "cluster", "n_bpe_tokens", "quality_score"),
      col("doc_id"))
  }

  /** DuckDB mirror of [[curateSub]]: the same four stages composed from
    * the stage oracles (`pairsSql` = the LSH candidate-pair SQL, already
    * subsample-scoped; `subPred` = the doc subsample predicate). */
  def duckCurateSql(pairsSql: String, subPred: String): String = {
    val resolve = Dedup.duckResolveSql(pairsSql,
      graft.sources.Seqs.duckSqlSub)
    val spec = Sampling.SplitSpec()
    s"""WITH docs_sub AS MATERIALIZED (
       |  SELECT * FROM documents
       |  WHERE ${subPred.replace("doc_id", "documents.doc_id")}),
       |qual AS MATERIALIZED (
       |  SELECT * FROM (${TextAnalysis.duckAnalyzeSqlFrom("docs_sub")}) q0),
       |surv1 AS (
       |  SELECT q.*, d.text FROM qual q JOIN docs_sub d USING (doc_id)
       |  WHERE q.quality_score >= $MinQuality AND q.lang_guess = 'en'),
       |surv2 AS (
       |  SELECT * FROM surv1
       |  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(text))),
       |clusters AS MATERIALIZED (
       |  SELECT * FROM ($resolve) t),
       |canon AS (
       |  -- sid uses lpad, NOT printf('d%06d'): the seqs/cluster ids are
       |  -- lpad-built on both engines (Seqs.duckSqlSub / fromDocumentsSub),
       |  -- and lpad vs printf diverge once doc_id reaches 1e6 (lpad keeps
       |  -- the leftmost 6 chars; printf widens) — the join must match the
       |  -- cluster table's own convention exactly
       |  SELECT s.*, c.cluster,
       |    'd' || lpad(CAST(s.doc_id AS VARCHAR), 6, '0') AS sid
       |  FROM surv2 s
       |  JOIN clusters c
       |    ON c.doc_id = 'd' || lpad(CAST(s.doc_id AS VARCHAR), 6, '0')
       |  QUALIFY 'd' || lpad(CAST(s.doc_id AS VARCHAR), 6, '0')
       |    = min('d' || lpad(CAST(s.doc_id AS VARCHAR), 6, '0'))
       |        OVER (PARTITION BY c.cluster))
       |SELECT doc_id, cluster, n_bpe_tokens, quality_score,
       |  ${Sampling.duckMilleSlot("doc_id")} AS bucket,
       |  CASE WHEN ${Sampling.duckMilleSlot("doc_id")} < ${spec.train}
       |         THEN 'train'
       |       WHEN ${Sampling.duckMilleSlot("doc_id")} < ${
                 spec.train + spec.valid} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM canon""".stripMargin
  }

  /** Quality-argmax canonicalization: per near-dup cluster, keep the BEST
    * member — rank = `quality_score` DESC, sid ASC (a total order, so the
    * verdict is rerun/partitioning-stable) — instead of [[curateSub]]'s
    * min-id rule. This is what production pipelines actually do: when a
    * template page and its well-edited original collide, min-id keeps
    * whichever crawled first; quality-argmax keeps the better document.
    * Output is one row per cluster: the kept doc, its quality, and the
    * member count (n_members − 1 docs are dropped).
    *
    * Scale shape: the cluster table and quality table join on the doc key
    * (one exchange each side, both corpus-row-bounded, narrow payloads);
    * the rank window partitions by cluster — bounded by near-dup cluster
    * size, never corpus size. quality_score is bitwise cross-engine
    * (the `text_analyze` oracle), so ranking on it is exact. */
  def canonicalByQuality(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Seqs
    val docs = graft.core.Partitioning
      .readBalanced(spark, dir, "documents", "doc_id")
      .filter(expr(Seqs.DedupSubPred))
    val qual = TextAnalysis.analyze(docs)
      .select(concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0"))
        .as("sid"), col("quality_score"))
    val sq = Seqs.fromDocumentsSub(spark, dir)
    val clusters = Dedup.resolveClustersStar(
      sq.select("doc_id"), Dedup.lshCandidates(sq))
      .withColumnRenamed("doc_id", "sid")
    val ranked = clusters.join(qual, Seq("sid"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cluster"))
          .orderBy(col("quality_score").desc, col("sid"))))
    ranked.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        max(when(col("rk") === 1, col("sid"))).as("kept_doc"),
        max(when(col("rk") === 1, col("quality_score"))).as("kept_quality"))
  }

  /** DuckDB mirror of [[canonicalByQuality]] (`pairsSql` = the LSH
    * candidate SQL, `subPred` = the raw-id subsample predicate). */
  def duckCanonicalSql(pairsSql: String, subPred: String): String = {
    val resolve = Dedup.duckResolveSql(pairsSql,
      graft.sources.Seqs.duckSqlSub)
    s"""WITH docs_sub AS MATERIALIZED (
       |  SELECT * FROM documents
       |  WHERE ${subPred.replace("doc_id", "documents.doc_id")}),
       |qual AS MATERIALIZED (
       |  SELECT 'd' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS sid,
       |         quality_score
       |  FROM (${TextAnalysis.duckAnalyzeSqlFrom("docs_sub")}) q0),
       |clusters AS MATERIALIZED (
       |  SELECT doc_id AS sid, cluster FROM ($resolve) t),
       |ranked AS (
       |  SELECT c.cluster, c.sid, q.quality_score,
       |    row_number() OVER (PARTITION BY c.cluster
       |                       ORDER BY q.quality_score DESC, c.sid) AS rk
       |  FROM clusters c JOIN qual q USING (sid))
       |SELECT cluster, count(*) AS n_members,
       |  max(CASE WHEN rk = 1 THEN sid END) AS kept_doc,
       |  max(CASE WHEN rk = 1 THEN quality_score END) AS kept_quality
       |FROM ranked GROUP BY 1""".stripMargin
  }

  /** Per-source dedup survivorship report: after near-dup
    * canonicalization (min-label rule — a doc survives iff its sid IS its
    * cluster label), how many docs and how much token mass each source
    * loses. The budgeting read before a dedup pass ships: a source whose
    * token mass halves changes the downstream mixture weights
    * ([[Sampling.tokenBudgetFill]] / temperature sampling).
    *
    * Exact int64 counts and sums off ONE source-keyed aggregation of the
    * cluster-joined seqs; the fraction is a single IEEE divide. */
  def dedupImpact(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Seqs
    val sq = Seqs.fromDocumentsSub(spark, dir)
    val clusters = Dedup.resolveClustersStar(
      sq.select("doc_id"), Dedup.lshCandidates(sq))
    sq.select(col("doc_id"), col("source"), col("n_tok"))
      .join(clusters, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") =!= col("cluster"), 1L).otherwise(0L))
          .as("n_dropped"),
        sum(col("n_tok").cast("long")).as("tok_total"),
        sum(when(col("doc_id") =!= col("cluster"), col("n_tok").cast("long"))
          .otherwise(0L)).as("tok_dropped"))
      .withColumn("frac_tok_dropped", expr(
        """CASE WHEN tok_total = 0 THEN CAST(0.0 AS DOUBLE)
          |     ELSE CAST(tok_dropped AS DOUBLE) / tok_total END"""
          .stripMargin))
  }

  /** DuckDB mirror of [[dedupImpact]]. */
  def duckImpactSql(pairsSql: String): String = {
    val resolve = Dedup.duckResolveSql(pairsSql,
      graft.sources.Seqs.duckSqlSub)
    // outer CTE named sq (NOT seqs): the nested resolve SQL is a
    // WITH RECURSIVE whose own `seqs` would collide with an outer `seqs`
    s"""WITH sq AS MATERIALIZED (${graft.sources.Seqs.duckSqlSub}),
       |clusters AS MATERIALIZED (SELECT * FROM ($resolve) t)
       |SELECT s.source,
       |  count(*) AS n_docs,
       |  CAST(sum(CASE WHEN s.doc_id <> c.cluster THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_dropped,
       |  CAST(sum(CAST(s.n_tok AS BIGINT)) AS BIGINT) AS tok_total,
       |  CAST(sum(CASE WHEN s.doc_id <> c.cluster
       |                THEN CAST(s.n_tok AS BIGINT) ELSE 0 END)
       |       AS BIGINT) AS tok_dropped,
       |  CASE WHEN sum(CAST(s.n_tok AS BIGINT)) = 0 THEN CAST(0.0 AS DOUBLE)
       |       ELSE CAST(sum(CASE WHEN s.doc_id <> c.cluster
       |                     THEN CAST(s.n_tok AS BIGINT) ELSE 0 END)
       |                 AS DOUBLE)
       |            / sum(CAST(s.n_tok AS BIGINT)) END AS frac_tok_dropped
       |FROM sq s JOIN clusters c USING (doc_id)
       |GROUP BY 1""".stripMargin
  }
}
