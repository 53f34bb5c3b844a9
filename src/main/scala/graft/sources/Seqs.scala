package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The canonical source table of pre-tokenized training sequences:
  *
  * {{{ (doc_id: string, tokens: array<int32>, n_tok: int32, source: string) }}}
  *
  * This is the Spark analog of AFEC's per-file normalized sample buffer
  * (reference: `Source/Crawler/FeatureExtraction/Export/SampleAnalyser.h:83-106`,
  * one entity = one file keyed by `filename` —
  * `SqliteSampleDescriptorPool.cpp:1316`). In production this is an Iceberg
  * table partitioned by `source`; in this sandbox we derive it
  * **deterministically** from the driver-generated `documents` parquet so the
  * DuckDB oracle can reproduce it bit-for-bit from the same inputs
  * (pure int64 arithmetic — no float, no hashing, no RNG).
  *
  * Token model (mirrors the reference corpus design — audible core with
  * leading/trailing silence runs and periodic bursts, cf. the silence-trim
  * path `SampleAnalyser.cpp:646-676` and the onset path
  * `RhythmTracker.cpp:99-134`):
  *
  *   - `n_tok  = least(n_chars * 16, 8192)`
  *   - `lead   = doc_id % 97`             (leading silence run)
  *   - `trail  = (doc_id * 7) % 61`        (trailing silence run)
  *   - `seed   = doc_id - 1` when `doc_id % 50 == 49` else `doc_id`
  *     (every 50th doc pair shares content → planted near-duplicates for
  *     the dedup/LSH operators, differing only in silence runs/length)
  *   - `base(i) = (seed*1103515245 + i*i*747796405 + i*12345 + 12345)
  *     % 2048 - 1024` — the quadratic term makes different docs produce
  *     different shingle SETS (a linear-only recurrence mod 2048 would make
  *     every long doc a phase shift of the same cycle, i.e. accidentally
  *     identical in shingle space)
  *   - `burst(i) = 2` when `(i div 128) % 8 == 0` else `1`
  *   - `tok(i) = 0` in the silence runs, else `base(i) * burst(i)`
  *
  * All operands stay positive before `%` so Spark and DuckDB agree; all
  * magnitudes stay far below 2^53 so later sums over squares are exact.
  *
  * Scale note: the derivation is a pure per-row projection (one `transform`
  * over a generated `sequence`) — no shuffle, no skew sensitivity; at 100 TB
  * it parallelizes as a narrow map over the source scan.
  */
object Seqs {

  /** Spectral frame clock analog — frame 2048 / hop 1024
    * (`Source/Crawler/XCrawler/Source/Crawler.cpp:42-43`). */
  val FrameSize = 2048
  val Hop       = 1024

  /** Rhythm frame clock analog — frame 512 / hop 128
    * (`SampleAnalyser.cpp:985-986`). */
  val RFrameSize = 512
  val RHop       = 128

  /** Silence threshold on |token| — analog of the -48 dB silence floor
    * (`SampleAnalyser.cpp:646-676`, aubio silence gate `:864-868`). */
  val SilenceThreshold = 32

  /** Analysis cap — analog of the 20 s / 882k-sample cap
    * (`SampleAnalyser.cpp:37, 760-764`); here the token cap. */
  val MaxTokens = 8192

  /** Derive the seqs table from `dir`/documents.parquet. The token loop runs
    * as the native [[graft.functions.expressions.TokenGen]] expression (the
    * HOF `transform(sequence(...))` form it replaces spent µs/token in
    * interpreted lambda dispatch). */
  def fromDocuments(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.expressions.register(spark)
    // Balance the single-row-group sandbox scan before the CPU-heavy token
    // expansion (see graft.core.Partitioning.balance — skipped when the
    // scan already has enough splits, as any real-scale table does).
    graft.core.Partitioning.readBalanced(spark, dir, "documents", "doc_id")
      .select(
        concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0")).as("doc_id"),
        expr(s"graft_gen_tokens(doc_id, CAST(least(n_chars * 16, $MaxTokens) AS INT))")
          .as("tokens"),
        least(col("n_chars") * 16, lit(MaxTokens)).cast("int").as("n_tok"),
        col("source"))
  }

  /** [[fromDocuments]] with the token arrays truncated to their first
    * `cap` positions — VALUES IDENTICAL to the full arrays' prefix (the
    * [[graft.functions.expressions.TokenGen]] cap argument still reads
    * the full `n_tok` for the trail-silence boundary). For consumers
    * that only analyze a fixed window (`slice(tokens, 1, w)` — the
    * unigram-LM tokenizer family), this skips generating the analysis-cap
    * tail: ~128× less token synthesis at w = 64. `n_tok` stays the FULL
    * count. */
  def fromDocumentsPrefix(spark: SparkSession, dir: String,
                          cap: Int): DataFrame = {
    graft.functions.expressions.register(spark)
    graft.core.Partitioning.readBalanced(spark, dir, "documents", "doc_id")
      .select(
        concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0")).as("doc_id"),
        expr(s"graft_gen_tokens(doc_id, CAST(least(n_chars * 16, $MaxTokens) AS INT), $cap)")
          .as("tokens"),
        least(col("n_chars") * 16, lit(MaxTokens)).cast("int").as("n_tok"),
        col("source"))
  }

  /** Verification-boundary subsample predicate (over the RAW numeric
    * `doc_id` of `documents`): keeps every planted near-dup pair
    * (`doc_id % 50 ∈ {48, 49}` — see the token model above) plus a 1-in-7
    * stride (~18% of docs). Used ONLY by the minhash/LSH oracle family:
    * their DuckDB mirrors re-run the interpreted minhash pipeline per doc
    * (~3 min each at the driver's gate scale — measured round 3), which
    * blew the driver's verification window in round 2. The engine runs the
    * full corpus everywhere else (Bench, features); both dialects apply
    * this identical predicate, so the compare stays exact. */
  val DedupSubPred = "(doc_id % 50) IN (48, 49) OR (doc_id % 7) = 0"

  /** [[fromDocuments]] restricted to [[DedupSubPred]] (filter applied on
    * the raw ids BEFORE token generation — the predicate prunes ~82% of
    * the token-expansion work too). */
  def fromDocumentsSub(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.expressions.register(spark)
    graft.core.Partitioning.readBalanced(spark, dir, "documents", "doc_id")
      .filter(expr(DedupSubPred))
      .select(
        concat(lit("d"), lpad(col("doc_id").cast("string"), 6, "0")).as("doc_id"),
        expr(s"graft_gen_tokens(doc_id, CAST(least(n_chars * 16, $MaxTokens) AS INT))")
          .as("tokens"),
        least(col("n_chars") * 16, lit(MaxTokens)).cast("int").as("n_tok"),
        col("source"))
  }

  /** DuckDB mirror of [[fromDocumentsSub]] (base column qualified —
    * DuckDB would otherwise let the WHERE see the SELECT's `doc_id`
    * alias, which is the formatted string). */
  lazy val duckSqlSub: String = // lazy: duckSql is declared below
    s"$duckSql\nWHERE ${DedupSubPred.replace("doc_id", "documents.doc_id")}"

  /** Bench-scale variant: replicate every document `factor` times with a
    * distinct derived doc id (so token content differs per replica) — used
    * by the scaling benchmark so per-core compute dominates fixed job
    * overhead (5000 docs finish in ~1 s on 8 cores; scaling efficiency is
    * unmeasurable when setup cost is half the wall time). Content shape is
    * identical to [[fromDocuments]]. */
  def scaledFromDocuments(spark: SparkSession, dir: String, factor: Int): DataFrame = {
    graft.functions.expressions.register(spark)
    val parts = spark.sparkContext.defaultParallelism
    // Two parallel exchanges, zero serial stages:
    //  1. hash-repartition the tiny source rows (one split in the sandbox)
    //     so the x`factor` explode runs on every core, not one;
    //  2. round-robin the exploded (doc, rep) index rows over 4x the core
    //     count — the expensive token generation runs after this exchange
    //     on perfectly count-balanced granular tasks (partitions == cores
    //     left the job waiting on its slowest partition, and a
    //     single-task explode+sort fan-out added a serial Amdahl term
    //     that capped 8->32-core efficiency at ~0.55).
    spark.read.parquet(s"$dir/documents.parquet")
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"), col("n_chars"), col("source"),
        explode(expr(s"sequence(0, $factor - 1)")).as("rep"))
      .withColumn("did", col("doc_id") + col("rep").cast("long") * 1000000L)
      .repartition(parts * 4)
      .select(
        concat(lit("d"), lpad(col("did").cast("string"), 9, "0")).as("doc_id"),
        expr(s"graft_gen_tokens(did, CAST(least(n_chars * 16, $MaxTokens) AS INT))")
          .as("tokens"),
        least(col("n_chars") * 16, lit(MaxTokens)).cast("int").as("n_tok"),
        col("source"))
  }

  /** DuckDB CTE body producing the identical table from `documents`
    * (the driver registers each parquet as a view named after the table). */
  val duckSql: String =
    s"""SELECT 'd' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS doc_id,
       |  list_transform(
       |    range(CAST(least(n_chars * 16, $MaxTokens) AS BIGINT)),
       |    i -> CAST(CASE
       |      WHEN i < (doc_id % 97)
       |        OR i >= least(n_chars * 16, $MaxTokens) - ((doc_id * 7) % 61)
       |      THEN 0
       |      ELSE (((doc_id - (CASE WHEN doc_id % 50 = 49 THEN 1 ELSE 0 END))
       |              * 1103515245
       |             + i * i * 747796405 + i * 12345 + 12345) % 2048 - 1024)
       |           * (CASE WHEN ((i // 128) % 8) = 0 THEN 2 ELSE 1 END)
       |    END AS INTEGER)) AS tokens,
       |  CAST(least(n_chars * 16, $MaxTokens) AS INTEGER) AS n_tok,
       |  source
       |FROM documents""".stripMargin
}
