package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tokenizer
import graft.sources.Seqs

/** Oracle-checked queries for the BPE tokenizer-training family. */
object TokenizerQueries {

  /** Pairs reported by `bpe_pairs` (top-k by count). */
  val PairTopK = 50

  /** Merge rounds learned by `bpe_train`. Small on purpose: the oracle
    * unrolls the relational merge per round ([[Tokenizer.duckTrainSql]]),
    * and the no-collect composed plan is O(k²) deep; [[Tokenizer.bpeTrain]]
    * is the production loop for real vocabulary sizes. */
  val TrainRounds = 3

  private val duckSeqs = s"seqs AS (${Seqs.duckSql})"
  private val duckSeqsSub = s"seqs AS (${Seqs.duckSqlSub})"

  /** The shared tokenizer-comparison corpus: dedup subsample, UniW-token
    * window (both arms see identical inputs). */
  private def winSub(s: SparkSession, dir: String): DataFrame =
    Seqs.fromDocumentsSub(s, dir).select(col("doc_id"),
      expr(s"slice(tokens, 1, $UniW)").as("tokens"),
      expr(s"CAST(least(n_tok, $UniW) AS INT)").as("n_tok"),
      col("source"))

  /** DuckDB twin of [[winSub]] (a full SELECT). */
  private lazy val duckWinSubSql =
    s"""SELECT doc_id, tokens[1:$UniW] AS tokens,
       |  CAST(least(n_tok, $UniW) AS INTEGER) AS n_tok, source
       |FROM (${Seqs.duckSqlSub}) q""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // adjacent-pair frequency report over the full corpus — round 0 of
    // BPE training (the distributed primitive: one map-side-combined
    // groupBy; the ranking window runs over distinct pairs, never tokens)
    "bpe_pairs" -> ((s, dir) =>
      Tokenizer.pairReport(Seqs.fromDocuments(s, dir), PairTopK)),

    // k learned merge rules (rank, a, b, new_id, cnt) as one composed
    // zero-collect plan; subsampled docs (the LSH-family oracle pattern)
    // because the oracle unrolls k relational merge rounds
    "bpe_train" -> ((s, dir) =>
      Tokenizer.mergeTable(Seqs.fromDocumentsSub(s, dir), TrainRounds)),

    // the full encode output: corpus re-tokenized by the k merges learned
    // from it, token arrays bitwise-checked against the oracle's
    // independent relational derivation (exact token-array equality is
    // the per-row invariant of the whole engine). Driver boundary is
    // array-free (the harness can't hash array cells): the bitwise
    // invariant rides an md5 over the canonical CSV rendering + the
    // length — the `seqs_tokens` convention. Raw-array form stays
    // available as Tokenizer.encodeTable for specs.
    "bpe_encode" -> ((s, dir) =>
      Tokenizer.encodeTable(Seqs.fromDocumentsSub(s, dir), TrainRounds)
        .select(col("doc_id"),
          expr("md5(array_join(transform(tokens_enc, x -> CAST(x AS STRING)), ','))")
            .as("enc_md5"),
          col("n_enc"))),

    // vocabulary pruning: corpus-rare tokens (count < MinTokenCount)
    // collapsed to the UNK id — rare set is planning metadata (one
    // counting job), rewrite is one zero-shuffle kernel projection with
    // full token-array parity (md5-digest driver boundary, raw form =
    // Tokenizer.unkRemap)
    "unk_remap" -> ((s, dir) =>
      Tokenizer.unkRemap(Seqs.fromDocuments(s, dir), MinTokenCount, UnkId)
        .select(col("doc_id"),
          expr("md5(array_join(transform(tokens_remap, x -> CAST(x AS STRING)), ','))")
            .as("remap_md5"),
          col("n_tok"))),

    // unigram-LM tokenizer (SentencePiece analog, hard-EM round):
    // per-doc Viterbi segmentation report under the count-initialized
    // piece model — integer micro-nat DP, checksum pins every piece
    // prefix source: the family only analyzes slice(tokens, 1, UniW), so
    // token synthesis stops at the window (identical prefix values)
    "unigram_segment" -> ((s, dir) =>
      Tokenizer.unigramSegment(Seqs.fromDocumentsPrefix(s, dir, UniW),
        UniW, UniB)),

    // the M-step census: top pieces by segmentation usage with
    // re-estimated scores (round-1 vocabulary of the unigram trainer)
    "unigram_train" -> ((s, dir) =>
      Tokenizer.unigramTrain(Seqs.fromDocumentsPrefix(s, dir, UniW),
        UniW, UniB, UniTopK)),

    // the classic tokenizer bake-off: BPE merges vs unigram-LM Viterbi
    // pieces on the SAME windowed corpus — per arm, docs / input tokens /
    // output pieces / compression (pieces per 1000 input tokens). Dials
    // are each family's own (TrainRounds merges vs UniB bigram pieces);
    // the report is the comparison harness, not an equal-budget claim.
    "tokenizer_compare" -> ((s, dir) => {
      val sw = winSub(s, dir)
      def arm(name: String, out: DataFrame, outCol: String) =
        sw.agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).cast("long").as("tok_in"))
          .crossJoin(out.agg(sum(col(outCol)).cast("long").as("pieces_out")))
          .select(lit(name).as("arm"), col("n_docs"), col("tok_in"),
            col("pieces_out"),
            expr("CAST((1000 * pieces_out) div tok_in AS BIGINT)")
              .as("compression_milli"))
      arm("bpe", Tokenizer.encodeTable(sw, TrainRounds), "n_enc")
        .unionByName(
          arm("unigram", Tokenizer.unigramSegment(sw, UniW, UniB),
            "n_pieces"))
    }),

    // BERT-style MLM corruption plan (15% masked; 80/10/10
    // sentinel/random/keep), deterministic per (doc, position); the
    // checksum row pins every rewritten token's value and place
    "mlm_mask" -> ((s, dir) =>
      Tokenizer.mlmReport(Seqs.fromDocuments(s, dir))),

    // T5-style grid-aligned span corruption: per-doc span/corruption
    // counts + checksums pinning BOTH the input and target rewrites
    "t5_spans" -> ((s, dir) =>
      Tokenizer.t5Report(Seqs.fromDocuments(s, dir)))
  )

  /** Unigram-LM trainer dials: W = shared per-doc analysis window (the
    * oracle's DP recursion is one round per position — the EditPrefixW
    * oracle-tractability pattern; the engine kernel itself is O(n) and
    * uncapped in production), B = bigram candidate pieces, TopK = census
    * depth. */
  val UniW = 64
  val UniB = 50
  val UniTopK = 50

  /** Vocabulary-pruning threshold and UNK id. 2047 is outside the token
    * model's range (`Seqs` bases lie in [-1024, 1023], bursts double to
    * even values only), so the remap target can never collide with a
    * surviving natural token. */
  val MinTokenCount = 300L
  val UnkId = 2047

  def oracles: Map[String, String] = Map(
    "bpe_pairs" -> Tokenizer.duckPairsSql(duckSeqs, PairTopK),
    "bpe_train" -> Tokenizer.duckTrainSql(duckSeqsSub, TrainRounds),
    "bpe_encode" ->
      s"""SELECT doc_id, md5(array_to_string(tokens_enc, ',')) AS enc_md5, n_enc
         |FROM (${Tokenizer.duckEncodeSql(duckSeqsSub, TrainRounds)}) q""".stripMargin,
    "unk_remap" ->
      s"""SELECT doc_id, md5(array_to_string(tokens_remap, ',')) AS remap_md5, n_tok
         |FROM (${Tokenizer.duckUnkRemapSql(duckSeqs, MinTokenCount, UnkId)}) q""".stripMargin,
    "tokenizer_compare" ->
      s"""SELECT arm, n_docs, tok_in, pieces_out,
         |  CAST((1000 * pieces_out) // tok_in AS BIGINT)
         |    AS compression_milli
         |FROM (
         |  SELECT 'bpe' AS arm,
         |    (SELECT CAST(count(*) AS BIGINT)
         |     FROM ($duckWinSubSql) s) AS n_docs,
         |    (SELECT CAST(sum(n_tok) AS BIGINT)
         |     FROM ($duckWinSubSql) s) AS tok_in,
         |    (SELECT CAST(sum(n_enc) AS BIGINT)
         |     FROM (${Tokenizer.duckEncodeSql(
               s"seqs AS ($duckWinSubSql)", TrainRounds)}) e) AS pieces_out
         |  UNION ALL
         |  SELECT 'unigram' AS arm,
         |    (SELECT CAST(count(*) AS BIGINT)
         |     FROM ($duckWinSubSql) s) AS n_docs,
         |    (SELECT CAST(sum(n_tok) AS BIGINT)
         |     FROM ($duckWinSubSql) s) AS tok_in,
         |    (SELECT CAST(sum(n_pieces) AS BIGINT)
         |     FROM (${Tokenizer.duckUnigramSegmentSql(
               s"seqs AS ($duckWinSubSql)", UniW, UniB)}) u) AS pieces_out
         |) t""".stripMargin,
    "unigram_segment" -> Tokenizer.duckUnigramSegmentSql(duckSeqs, UniW, UniB),
    "unigram_train" -> Tokenizer.duckUnigramTrainSql(duckSeqs, UniW, UniB,
      UniTopK),
    "mlm_mask" -> Tokenizer.duckMlmReportSql(duckSeqs),
    "t5_spans" -> Tokenizer.duckT5ReportSql(duckSeqs)
  )
}
