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
}
