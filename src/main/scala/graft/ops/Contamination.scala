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
  def ngramHashes(docs: DataFrame, n: Int): DataFrame =
    docs
      .withColumn("words", expr(TextAnalysis.wordsExpr))
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN size(words) >= $n THEN
           |  array_distinct(transform(sequence(0, size(words) - $n),
           |    i -> CAST(conv(substring(md5(
           |           array_join(slice(words, i + 1, $n), ' ')
           |         ), 1, 15), 16, 10) AS BIGINT)))
           |ELSE array() END""".stripMargin)).as("gram_h"))

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
}
