package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes source classifier, trained IN the engine by
  * pure counting — the distributed-training counterpart of the engine's
  * inference surfaces ([[TreeEnsemble]] walks pre-trained trees,
  * [[LinearModel]] scores fixed weights; here the MODEL ITSELF is fit as
  * two aggregations over the corpus). Reference analog: the classification
  * model stage of the crawler
  * (`Source/Crawler/Classification/Source/Models/GBDT.cpp:50-117`,
  * `Bagging.h:191-217`) — the reference trains offline and ships a blob;
  * a Spark-first engine can train the counting family (NB) as first-class
  * relational plans, no blob, no driver-side math.
  *
  * Model (add-one smoothing, all counts exact int64):
  *   - `llk(t,s)  = ln((c_ts + 1) / (N_s + V))` — token t's log-likelihood
  *     under source s; `c_ts` = occurrences of t in s, `N_s` = total
  *     tokens in s, `V` = corpus unigram vocabulary size.
  *   - `prior(s)  = ln(D_s / D)` — document-frequency prior.
  *   - `score(d,s) = prior(s) + Σ_t c_dt · llk(t,s)`; predict the argmax,
  *     ties broken by source name (deterministic).
  *
  * == Determinism (bitwise across engines and partitionings) ==
  * The [[LanguageModel]] micro-nat discipline: each ln is ONE double
  * division of exact int64s, rounded to int64 MICRO-NATS before any
  * aggregation — sums, argmax and margins are then pure int64 (order-free,
  * no float accumulation anywhere). Unlike the avg-boundary ops, the
  * OUTPUT here is int64 too, so the whole query is bitwise, not just
  * corpus-verified.
  *
  * == Plan shape / scale ==
  * Train = one (source, gram) exchange with map-side partials; the dense
  * model (V × S rows, V ≪ corpus, S = handful of sources) and the prior
  * table are broadcast. Score = per-(doc, gram) pre-aggregation (bounds
  * the model-join fan-out by distinct grams per doc, not token count),
  * broadcast model join, one doc_id-keyed agg — the only corpus-sized
  * shuffle is keyed by doc_id. Self-scoring form: the vocabulary is the
  * training corpus's, so every scored gram hits the model (to score a
  * held-out table, fit on the reference corpus and left-join with the
  * unseen-token floor `ln(1 / (N_s + V))`).
  */
object NaiveBayes {

  /** Dense per-(gram, source) log-likelihood table in micro-nats:
    * `(gram, source, llk_micro)`, every vocabulary gram × every source. */
  def model(seqs: DataFrame): DataFrame = {
    val inst = seqs.select(col("source"),
      explode(expr("graft_pack_ngrams(tokens, 1)")).as("gram"))
    val cts = inst.groupBy(col("source"), col("gram"))
      .agg(count(lit(1)).as("c_ts"))
    val ns = cts.groupBy(col("source")).agg(sum(col("c_ts")).as("n_s"))
    val vocab = cts.select(col("gram")).distinct()
    val v = vocab.agg(count(lit(1)).as("__v"))
    vocab.crossJoin(broadcast(ns))
      .join(cts, Seq("source", "gram"), "left_outer")
      .withColumn("c_ts", coalesce(col("c_ts"), lit(0L)))
      .crossJoin(broadcast(v))
      .select(col("gram"), col("source"),
        expr("""CAST(round(ln(CAST(c_ts + 1 AS DOUBLE)
                / CAST(n_s + __v AS DOUBLE)) * 1000000) AS BIGINT)""")
          .as("llk_micro"))
  }

  /** `(source, prior_micro)` — document-frequency priors in micro-nats. */
  def priors(seqs: DataFrame): DataFrame = {
    val ds = seqs.groupBy(col("source")).agg(count(lit(1)).as("d_s"))
    ds.crossJoin(broadcast(ds.agg(sum(col("d_s")).as("__d"))))
      .select(col("source"),
        expr("CAST(round(ln(CAST(d_s AS DOUBLE) / CAST(__d AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("prior_micro"))
  }

  /** Train on `seqs` and classify every document of it: `(doc_id, label,
    * pred, score_micro, margin_micro, correct)` — `label` the true source,
    * `pred` the argmax source, `score_micro` its total int64 score,
    * `margin_micro` the gap to the runner-up (0 with a single source). */
  def trainAndClassify(seqs: DataFrame): DataFrame = {
    val dg = seqs
      .select(col("doc_id"), explode(expr("graft_pack_ngrams(tokens, 1)")).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("n_occ"))
    val scores = dg.join(broadcast(model(seqs)), Seq("gram"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("n_occ") * col("llk_micro")).as("__ll"))
      .join(broadcast(priors(seqs)), Seq("source"))
      .select(col("doc_id"), col("source").as("pred"),
        (col("__ll") + col("prior_micro")).as("score_micro"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("pred"))
    val top = scores
      .withColumn("__rn", row_number().over(w))
      .withColumn("__next", lead(col("score_micro"), 1).over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("pred"), col("score_micro"),
        coalesce(col("score_micro") - col("__next"), lit(0L))
          .as("margin_micro"))
    top.join(seqs.select(col("doc_id"), col("source").as("label")),
        Seq("doc_id"))
      .select(col("doc_id"), col("label"), col("pred"), col("score_micro"),
        col("margin_micro"), (col("label") === col("pred")).as("correct"))
  }

  /** DuckDB mirror of [[trainAndClassify]] (`seqsSql` = a CTE body
    * yielding (doc_id, tokens, source)). */
  def duckSql(seqsSql: String): String =
    s"""WITH seqs AS ($seqsSql),
       |inst AS MATERIALIZED (
       |  SELECT doc_id, source, (t + 2048)::BIGINT AS gram
       |  FROM (SELECT doc_id, source, unnest(tokens) AS t FROM seqs)),
       |cts AS (SELECT source, gram, count(*) AS c_ts FROM inst GROUP BY 1, 2),
       |ns AS (SELECT source, sum(c_ts) AS n_s FROM cts GROUP BY 1),
       |vocab AS (SELECT DISTINCT gram FROM cts),
       |v AS (SELECT count(*) AS v FROM vocab),
       |model AS (
       |  SELECT vocab.gram, ns.source,
       |    CAST(round(ln(CAST(coalesce(cts.c_ts, 0) + 1 AS DOUBLE)
       |         / CAST(ns.n_s + v.v AS DOUBLE)) * 1000000) AS BIGINT)
       |      AS llk_micro
       |  FROM vocab CROSS JOIN ns CROSS JOIN v
       |  LEFT JOIN cts ON cts.source = ns.source AND cts.gram = vocab.gram),
       |ds AS (SELECT source, count(*) AS d_s FROM seqs GROUP BY 1),
       |pri AS (
       |  SELECT source,
       |    CAST(round(ln(CAST(d_s AS DOUBLE)
       |         / CAST((SELECT sum(d_s) FROM ds) AS DOUBLE)) * 1000000)
       |      AS BIGINT) AS prior_micro
       |  FROM ds),
       |dg AS (SELECT doc_id, gram, count(*) AS n_occ FROM inst GROUP BY 1, 2),
       |sc AS (
       |  SELECT dg.doc_id, model.source AS pred,
       |    sum(dg.n_occ * model.llk_micro)
       |      + any_value(pri.prior_micro) AS score_micro
       |  FROM dg JOIN model USING (gram) JOIN pri ON pri.source = model.source
       |  GROUP BY 1, 2),
       |top AS (
       |  SELECT doc_id, pred, score_micro,
       |    coalesce(score_micro - lead(score_micro, 1) OVER (
       |      PARTITION BY doc_id ORDER BY score_micro DESC, pred), 0)
       |      AS margin_micro,
       |    row_number() OVER (
       |      PARTITION BY doc_id ORDER BY score_micro DESC, pred) AS rn
       |  FROM sc)
       |SELECT top.doc_id, seqs.source AS label, top.pred,
       |  CAST(top.score_micro AS BIGINT) AS score_micro,
       |  CAST(top.margin_micro AS BIGINT) AS margin_micro,
       |  (seqs.source = top.pred) AS correct
       |FROM top JOIN seqs USING (doc_id)
       |WHERE top.rn = 1""".stripMargin
}
