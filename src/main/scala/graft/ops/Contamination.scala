package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: flag every training document that shares at
  * least `minHits` distinct word n-grams with ANY held-out evaluation
  * document — the standard contamination check a training-data pipeline
  * runs before a corpus ships (the n-gram-overlap recipe used for
  * benchmark decontamination in the GPT-3/PaLM data-prep literature).
  *
  * == Spark-first shape (100 TB story) ==
  * Both sides reduce to distinct `(doc_id, gram_hash)` pairs via a narrow
  * explode (per-doc `array_distinct` caps the explode at the doc's n-gram
  * count). The eval side is then collapsed to a distinct hash SET — eval
  * suites are orders of magnitude smaller than the training corpus, so the
  * set is broadcast and the train side never shuffles: scan → explode →
  * broadcast-hash semi-join → partial-agg count per doc. The only exchange
  * is the final per-doc aggregation, keyed by `doc_id` (already
  * near-unique — no skew). Joining on a 60-bit gram HASH instead of the
  * gram string keeps the broadcast and the probe rows fixed-width; the
  * hash (first 15 hex chars of md5, via `conv`) renders identically in
  * DuckDB for the oracle.
  *
  * When the eval side outgrows broadcast (contamination against another
  * full corpus), the same plan degrades gracefully to a shuffled hash
  * semi-join on `gram_h` — still linear, never quadratic.
  */
object Contamination {

  /** Distinct word n-gram hashes per document: `(doc_id, gram_h)`.
    * 60-bit hash = first 15 hex chars of md5 over the space-joined gram
    * (bit-identical in DuckDB: `CAST(concat('0x', substr(md5(g),1,15)) AS
    * BIGINT)`). */
  def ngramHashes(docs: DataFrame, n: Int): DataFrame = {
    // r6: fused native kernel — one pass over the raw text bytes per doc
    // (split + per-gram md5 + distinct), replacing an interpreted
    // transform(sequence(...)) HOF that built slice/array_join/conv
    // expression trees per gram (the per-token-path HOF anti-pattern);
    // identical 60-bit hash values, so both sides of every gram join and
    // the DuckDB mirrors are unchanged
    graft.functions.expressions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      explode(expr(s"graft_ngram_hashes(text, $n)")).as("gram_h"))
  }

  /** Contaminated training docs: `(doc_id, n_hits)` where `n_hits` is the
    * number of DISTINCT n-grams the doc shares with the eval corpus, kept
    * when `n_hits >= minHits`. */
  def flagContaminated(train: DataFrame, eval0: DataFrame, n: Int,
                       minHits: Long = 1L): DataFrame = {
    val evalGrams = ngramHashes(eval0, n).select("gram_h").distinct()
    ngramHashes(train, n)
      .join(broadcast(evalGrams), Seq("gram_h"))
      // per-doc grams are already distinct (array_distinct upstream), so a
      // plain count IS the distinct-hit count — no count_distinct shuffle
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** DuckDB mirror: contamination of `documents` where `evalPred` selects
    * the held-out side (train = NOT evalPred). */
  def duckSql(n: Int, evalPred: String, minHits: Long = 1L): String =
    s"""WITH w AS (
       |  SELECT doc_id, ${TextAnalysis.duckWordsExpr} AS words
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(CASE WHEN len(words) >= $n THEN
       |      list_distinct(list_transform(range(CAST(len(words) - ${n - 1} AS BIGINT)),
       |        i -> CAST(concat('0x', substr(md5(
       |               array_to_string(words[i + 1:i + $n], ' ')
       |             ), 1, 15)) AS BIGINT)))
       |    ELSE [] END) AS gram_h
       |  FROM w),
       |ev AS (SELECT DISTINCT gram_h FROM g WHERE $evalPred),
       |tr AS (SELECT * FROM g WHERE NOT ($evalPred))
       |SELECT tr.doc_id, count(*) AS n_hits
       |FROM tr JOIN ev USING (gram_h)
       |GROUP BY 1
       |HAVING count(*) >= $minHits""".stripMargin

  /** Cross-source overlap matrix: for every source pair (a < b), the
    * number of DISTINCT word n-grams they share, each side's distinct
    * n-gram count, and the Jaccard similarity — the "which sources
    * duplicate which" diagnostic a curation pipeline runs before choosing
    * mixture weights (a high-overlap pair means double-counted mass).
    * Zero-overlap pairs emit no row.
    *
    * == Scale shape ==
    * Everything is keyed by `gram_h`, never by document: the distinct
    * `(source, gram_h)` table is bounded by Σ per-source vocabulary (NOT
    * corpus size), the self-join bucket per gram holds ≤ |sources| rows
    * (pair output ≤ |S|²/2 per gram — linear in vocabulary, constant in
    * corpus growth), and the per-source size table is |S| rows, broadcast.
    * Jaccard = one IEEE divide of exact int64 counts → bitwise across
    * engines. */
  def sourceOverlap(docs: DataFrame, n: Int): DataFrame = {
    val gs = ngramHashes(
        docs.select(col("source").as("doc_id"), col("text")), n)
      .select(col("doc_id").as("source"), col("gram_h"))
      .distinct()
      // vocabulary-bounded (Σ per-source distinct grams, not corpus rows);
      // materialized once for its three consumers (sizes + both self-join
      // sides) instead of re-running the corpus gram pass per consumer
      .localCheckpoint(true)
    val sizes = gs.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val common = gs.as("a")
      .join(gs.as("b"), col("a.gram_h") === col("b.gram_h") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("n_grams").as("n_a"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n_grams").as("n_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_common"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
  }

  /** DuckDB mirror of [[sourceOverlap]] over `documents`. */
  def duckSourceOverlapSql(n: Int): String =
    s"""WITH w AS (
       |  SELECT source, ${TextAnalysis.duckWordsExpr} AS words
       |  FROM documents),
       |g AS (
       |  SELECT DISTINCT source, gram_h FROM (
       |    SELECT source, unnest(CASE WHEN len(words) >= $n THEN
       |        list_distinct(list_transform(range(CAST(len(words) - ${n - 1} AS BIGINT)),
       |          i -> CAST(concat('0x', substr(md5(
       |                 array_to_string(words[i + 1:i + $n], ' ')
       |               ), 1, 15)) AS BIGINT)))
       |      ELSE [] END) AS gram_h
       |    FROM w)),
       |sz AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_grams
       |  FROM g GROUP BY 1),
       |cm AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    CAST(count(*) AS BIGINT) AS n_common
       |  FROM g a JOIN g b ON a.gram_h = b.gram_h AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT cm.source_a, cm.source_b, sa.n_grams AS n_a,
       |  sb.n_grams AS n_b, cm.n_common,
       |  CAST(cm.n_common AS DOUBLE) / (sa.n_grams + sb.n_grams - cm.n_common)
       |    AS jaccard
       |FROM cm
       |JOIN sz sa ON sa.source = cm.source_a
       |JOIN sz sb ON sb.source = cm.source_b""".stripMargin
}
