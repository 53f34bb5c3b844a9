package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based splitting and sampling — the train/val/test
  * primitive of a training-data pipeline.
  *
  * A split must be (a) a PURE FUNCTION of the record key — so it is
  * reproducible across runs, cluster sizes, partitionings, and engine
  * versions, and records added later land in the same split as if they had
  * always been there (no leakage drift when the corpus grows); (b) uniform;
  * (c) expressible identically in any engine that can hash (here: mirrored
  * bit-for-bit in DuckDB). `rand(seed)` satisfies none of these — Spark's
  * rand is seeded PER PARTITION, so the assignment changes whenever the
  * partitioning does; `df.randomSplit` inherits the same flaw.
  *
  * Bucket = the first 8 hex chars of md5(key) as an integer in [0, 2^32)
  * (md5 of the decimal string rendering, which Spark and DuckDB produce
  * identically for integral types), reduced mod 1000 to a per-mille slot.
  * Assignment compares the slot against cumulative thresholds. All narrow
  * projections — no shuffle, no state; at 100 TB the split adds one
  * codegen'd expression to the scan.
  *
  * Reference analog: the crawler partitions its corpus deterministically by
  * descriptor key for incremental re-runs (`Source/Crawler/Crawler.cpp`
  * change-list processing); ML-side bagging draws deterministic seeded
  * subsets (`Source/Crawler/Classification/Source/Models/Bagging.h`).
  */
object Sampling {

  /** THE corpus-wide hash-slot convention, in one place: first 8 md5 hex
    * chars of the stringified key as an integer, mod the slot count.
    * Every deterministic hash-assignment in the engine ([[milleSlot]],
    * [[graft.ops.LinearModel.hashBucket]], …) and every DuckDB mirror
    * ([[duckMd5Slot]]) derives from this pair so the convention cannot
    * drift between engines or between call sites. */
  def md5Slot(key: Column, mod: Int): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % mod)

  /** SQL twin of [[md5Slot]] for the DuckDB mirror (`key` is a SQL
    * expression of an integral or string column). */
  def duckMd5Slot(key: String, mod: Int): String =
    s"(('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8))::BIGINT % $mod)"

  /** Per-mille hash slot in [0, 1000) for a key column — the shared
    * primitive of [[assignSplit]] and [[sampleMille]]. */
  def milleSlot(key: Column): Column = md5Slot(key, 1000).cast("int")

  /** SQL twin of [[milleSlot]] for the DuckDB mirror. */
  def duckMilleSlot(key: String): String =
    s"CAST(${duckMd5Slot(key, 1000)} AS INTEGER)"

  /** Split thresholds in per-mille: train gets [0, train), val gets
    * [train, train + valid), test the rest. */
  final case class SplitSpec(train: Int = 900, valid: Int = 50) {
    require(train > 0 && valid >= 0 && train + valid <= 1000,
      s"bad split spec: train=$train valid=$valid")
  }

  /** Append `bucket` (per-mille slot) and `split` ('train'/'val'/'test')
    * columns, keyed on `key`. */
  def assignSplit(df: DataFrame, key: Column,
                  spec: SplitSpec = SplitSpec()): DataFrame = {
    val slot = milleSlot(key)
    df.withColumn("bucket", slot)
      .withColumn("split",
        when(col("bucket") < spec.train, "train")
          .when(col("bucket") < spec.train + spec.valid, "val")
          .otherwise("test"))
  }

  /** Deterministic `mille`/1000 sample: keep rows whose slot falls below
    * the threshold. Unlike `DataFrame.sample`, re-running, repartitioning,
    * or growing the corpus never changes which keys are kept. */
  def sampleMille(df: DataFrame, key: Column, mille: Int): DataFrame = {
    require(mille >= 0 && mille <= 1000, s"bad mille: $mille")
    df.filter(milleSlot(key) < mille)
  }

  /** Deterministic STRATIFIED sample: per-stratum keep rates (per-mille),
    * driven by the same key slot as [[sampleMille]] — the
    * rebalance-by-downsampling primitive (e.g. cap an over-represented
    * language at 10% while keeping all of a rare one). Strata absent from
    * `rates` fall back to `defaultMille`. The rate map is a broadcast-sized
    * CASE expression, not a join — still a narrow codegen'd filter. */
  def sampleStratified(df: DataFrame, key: Column, stratum: Column,
                       rates: Map[String, Int],
                       defaultMille: Int = 1000): DataFrame = {
    require((defaultMille +: rates.values.toSeq)
      .forall(m => m >= 0 && m <= 1000), s"bad rates: $rates / $defaultMille")
    val threshold = rates.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), 0)) { case (acc, (s, m)) =>
        acc.when(stratum === s, m)
      }.otherwise(defaultMille)
    df.filter(milleSlot(key) < threshold)
  }

  /** SQL twin of [[sampleStratified]]'s threshold CASE (same sorted-key
    * order, same fallback). */
  def duckStratumThreshold(stratum: String, rates: Map[String, Int],
                           defaultMille: Int = 1000): String =
    rates.toSeq.sortBy(_._1)
      .map { case (s, m) => s"WHEN $stratum = '$s' THEN $m" }
      .mkString("CASE ", " ", s" ELSE $defaultMille END")

  /** Purged + embargoed TIME split (the leakage-safe form of a temporal
    * train/test cut, cf. de Prado's purged k-fold): hash splits are wrong
    * for time-series supervision because a training row whose LABEL WINDOW
    * crosses the boundary has seen test-period outcomes. Given a boundary
    * `B`, a label horizon `purge` and an `embargo` width:
    *
    *   - `train`:   `ts <  B − purge`   (its forward label, drawn from
    *                `(ts, ts + purge]`, closes before the boundary)
    *   - `purged`:  `B − purge ≤ ts < B` (label window crosses the cut —
    *                dropped from BOTH sides)
    *   - `embargo`: `B ≤ ts < B + embargo` (test rows whose trailing
    *                features still overlap training-time state — dropped)
    *   - `test`:    `ts ≥ B + embargo`
    *
    * Pure narrow projection (one CASE over the scan) — zero shuffle; the
    * assignment is a pure function of `(ts, B, purge, embargo)`, so it is
    * stable under reruns, repartitioning and corpus growth, like
    * [[assignSplit]]. */
  def purgedTimeSplit(df: DataFrame, ts: Column, boundary: Column,
                      purge: Long, embargo: Long): DataFrame = {
    require(purge >= 0 && embargo >= 0,
      s"purge/embargo must be non-negative: $purge / $embargo")
    df.withColumn("split",
      when(ts < boundary - purge, "train")
        .when(ts < boundary, "purged")
        .when(ts < boundary + embargo, "embargo")
        .otherwise("test"))
  }

  /** Leakage-safe grouped k-fold assignment (the GroupKFold analog with
    * groups DISCOVERED by the dedup family): folds are hashed per
    * near-dup CLUSTER label, not per document, so near-duplicates can
    * never straddle a train/test boundary — the cross-sectional sibling
    * of [[purgedTimeSplit]]'s temporal leakage guard (a test doc whose
    * near-copy sits in train is a leaked label). Input = the resolved
    * (doc_id, cluster) table ([[Dedup.resolveClustersStar]] over LSH
    * candidates); fold = [[md5Slot]] of the cluster label — stable under
    * reruns, repartitioning and corpus growth, and ONE narrow projection
    * over the cluster table (the component resolution already paid the
    * graph shuffles). */
  def groupedFolds(clusters: DataFrame, k: Int): DataFrame =
    clusters.withColumn("fold", md5Slot(col("cluster"), k).cast("int"))

  /** SQL twin of [[groupedFolds]] (`clustersSql` = a full SELECT yielding
    * (doc_id, cluster)). */
  def duckGroupedFoldsSql(clustersSql: String, k: Int): String =
    s"""SELECT doc_id, cluster,
       |  CAST(${duckMd5Slot("cluster", k)} AS INTEGER) AS fold
       |FROM ($clustersSql)""".stripMargin

  /** Seeded epoch-shuffle key: md5 of `key:epoch` — an uncorrelated
    * 128-bit total order per epoch, reproducible anywhere md5 is (the
    * same engine-portability argument as [[milleSlot]]). */
  def epochKey(key: Column, epoch: Int): Column =
    md5(concat(key.cast("string"), lit(s":$epoch")))

  /** SQL twin of [[epochKey]] for the DuckDB mirror. */
  def duckEpochKey(key: String, epoch: Int): String =
    s"md5(CAST($key AS VARCHAR) || ':$epoch')"

  /** Deterministic epoch shuffle: the global training order for epoch
    * `e`, as a total sort by [[epochKey]]. Spark plans this as ONE
    * range exchange (sampled hash-space boundaries) + per-partition
    * sort — the scalable "shuffle once per epoch, stream shards in
    * order" pattern. Re-running an epoch reproduces its order bit-for-
    * bit regardless of input partitioning; distinct epochs are
    * uncorrelated because the hash mixes the epoch into every key. */
  def epochShuffle(df: DataFrame, key: Column, epoch: Int): DataFrame =
    df.orderBy(epochKey(key, epoch))

  /** Writer form of [[epochShuffle]]: `nShards` range partitions of the
    * epoch order, each internally sorted, tagged with its shard id —
    * reading shards 0..n-1 sequentially streams the exact global
    * shuffle. Shard boundaries come from Spark's range sampler; the
    * ORDER is the deterministic contract, boundary placement is not. */
  def epochShards(df: DataFrame, key: Column, epoch: Int,
                  nShards: Int): DataFrame = {
    require(nShards >= 1, s"bad shard count: $nShards")
    df.withColumn("shuffle_key", epochKey(key, epoch))
      .repartitionByRange(nShards, col("shuffle_key"))
      .sortWithinPartitions("shuffle_key")
      .withColumn("shard", spark_partition_id())
  }

  /** Temperature-based domain mixture rates (τ = 0.5): per-stratum keep
    * rates that rebalance the corpus toward `share^τ` — the multilingual-
    * pretraining reweighting that upsamples rare domains relative to
    * dominant ones (exponentiated smoothing of the source distribution).
    *
    * With τ = 0.5 the algebra collapses: the target-over-actual ratio is
    * `share^(τ−1) = share^(−1/2)`, and normalizing so the rarest stratum
    * keeps everything gives `rate_d = sqrt(min_tokens / tokens_d)` — the
    * normalizing constant and the corpus total both cancel. That form is
    * two correctly-rounded IEEE ops (one divide, one sqrt) over EXACT
    * integer token sums, so the rate is bitwise-reproducible across
    * engines — no float accumulation order anywhere (why τ is fixed at
    * 0.5 rather than a parameter: `pow` carries no cross-libm guarantee).
    *
    * One tiny aggregation (strata cardinality rows); the ranking windows
    * run over the per-stratum table, never the corpus. */
  def mixtureRates(seqs: DataFrame, stratum: String = "source",
                   weightCol: String = "n_tok"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    seqs.groupBy(col(stratum))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(weightCol).cast("long")).as("n_tok"))
      .withColumn("share",
        col("n_tok").cast("double") / sum("n_tok").over(w).cast("double"))
      .withColumn("rate_mille",
        floor(lit(1000.0) * sqrt(min("n_tok").over(w).cast("double") /
          col("n_tok").cast("double"))).cast("int"))
  }

  /** Apply [[mixtureRates]]: keep a row iff its key's [[milleSlot]] falls
    * under its stratum's rate — deterministic per key, broadcast-joined
    * (the rate table is strata-sized), narrow filter after the join. */
  def mixtureSample(seqs: DataFrame, rates: DataFrame, key: Column,
                    stratum: String = "source"): DataFrame =
    seqs.join(broadcast(rates.select(col(stratum), col("rate_mille"))),
        Seq(stratum))
      .filter(milleSlot(key) < col("rate_mille"))
      .drop("rate_mille")

  /** Before/after mixture report: per stratum, corpus share, keep rate,
    * and the achieved post-sampling share. Exact-integer counts; the only
    * doubles are single divisions of exact sums. */
  def mixtureReport(seqs: DataFrame, key: Column,
                    stratum: String = "source",
                    weightCol: String = "n_tok"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val rates = mixtureRates(seqs, stratum, weightCol)
    val kept = mixtureSample(seqs, rates, key, stratum)
      .groupBy(col(stratum))
      .agg(count(lit(1)).as("kept_docs"),
        sum(col(weightCol).cast("long")).as("kept_tok"))
    rates.join(kept, Seq(stratum), "left")
      .withColumn("kept_docs", coalesce(col("kept_docs"), lit(0L)))
      .withColumn("kept_tok", coalesce(col("kept_tok"), lit(0L)))
      .withColumn("share_after",
        col("kept_tok").cast("double") /
          sum("kept_tok").over(w).cast("double"))
      .select(col(stratum), col("n_docs"), col("n_tok"), col("share"),
        col("rate_mille"), col("kept_docs"), col("kept_tok"),
        col("share_after"))
  }

  /** DuckDB mirror of [[mixtureReport]] over a `seqs` CTE body bound by
    * `prelude` (no leading WITH). */
  def duckMixtureSql(prelude: String, stratum: String = "source",
                     weightCol: String = "n_tok"): String =
    s"""WITH $prelude,
       |per AS (
       |  SELECT $stratum, count(*) AS n_docs,
       |    CAST(sum($weightCol) AS BIGINT) AS n_tok
       |  FROM seqs GROUP BY $stratum),
       |r AS (
       |  SELECT $stratum, n_docs, n_tok,
       |    CAST(n_tok AS DOUBLE) / CAST(sum(n_tok) OVER () AS DOUBLE)
       |      AS share,
       |    CAST(floor(CAST(1000 AS DOUBLE) *
       |        sqrt(CAST(min(n_tok) OVER () AS DOUBLE) /
       |             CAST(n_tok AS DOUBLE))) AS INTEGER) AS rate_mille
       |  FROM per),
       |k AS (
       |  SELECT s.$stratum, count(*) AS kept_docs,
       |    CAST(sum(s.$weightCol) AS BIGINT) AS kept_tok
       |  FROM seqs s JOIN r ON r.$stratum = s.$stratum
       |  WHERE ${duckMilleSlot("s.doc_id")} < r.rate_mille
       |  GROUP BY s.$stratum)
       |SELECT r.$stratum AS $stratum, r.n_docs, r.n_tok, r.share,
       |  r.rate_mille,
       |  coalesce(k.kept_docs, 0) AS kept_docs,
       |  coalesce(k.kept_tok, 0) AS kept_tok,
       |  CAST(coalesce(k.kept_tok, 0) AS DOUBLE) /
       |    CAST(sum(coalesce(k.kept_tok, 0)) OVER () AS DOUBLE)
       |    AS share_after
       |FROM r LEFT JOIN k ON k.$stratum = r.$stratum""".stripMargin

  /** Deterministic weighted sample without replacement (Efraimidis–
    * Spirakis A-ES): per row draw a hash-uniform `u ∈ (0,1)` and keep the
    * `k` rows with the smallest `−ln(u)/w` — selection probability ∝ `w`
    * (here: token count, the length-weighted corpus subsample). The draw
    * is [[md5Slot]]-style (60-bit md5 of a salted key), so reruns,
    * repartitioning and corpus growth never change a kept key's draw.
    *
    * == Cross-engine determinism ==
    * `ln` carries no cross-libm bitwise guarantee, so the score is
    * quantized at the SINGLE ln call — `key_micro =
    * −round(ln(u)·10^6)` (the [[graft.ops.LanguageModel.pmiTop]]
    * micro-nat pattern) — and the only subsequent float op is one IEEE
    * division of exact integers, `score = key_micro / w`. Ranking ties
    * break by doc_id.
    *
    * == Scale shape ==
    * Score is a narrow projection; `orderBy(score).limit(k)` plans as
    * TakeOrderedAndProject — per-partition top-k heaps merged on one
    * reducer row set, never a global sort. Weighted-sample partials are
    * mergeable exactly like [[graft.ops.Sketches.kmvReport]]'s k-min. */
  def weightedSample(seqs: DataFrame, k: Int,
                     weightCol: String = "n_tok"): DataFrame = {
    val h60 = conv(substring(md5(concat(lit("ws:"), col("doc_id"))), 1, 15),
      16, 10).cast("long")
    val keyMicro = expr(
      s"""-CAST(round(ln((CAST(${"__h60"} AS DOUBLE) + 1.0)
         |  / 1152921504606846977.0) * 1000000) AS BIGINT)""".stripMargin)
    val scored = seqs
      .withColumn("__h60", h60)
      .withColumn("__key_micro", keyMicro)
      .select(col("doc_id"), col(weightCol),
        (col("__key_micro").cast("double") /
          col(weightCol).cast("double")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").asc, col("doc_id").asc)
    scored.orderBy(col("score").asc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(w).cast("int"))
      .select(col("rank"), col("doc_id"), col(weightCol), col("score"))
  }

  /** DuckDB mirror of [[weightedSample]] over a `seqs` CTE body bound by
    * `prelude` (no leading WITH). */
  def duckWeightedSampleSql(prelude: String, k: Int,
                            weightCol: String = "n_tok"): String =
    s"""WITH $prelude,
       |h AS (
       |  SELECT doc_id, $weightCol,
       |    ('0x' || substr(md5('ws:' || doc_id), 1, 15))::BIGINT AS h60
       |  FROM seqs),
       |s AS (
       |  SELECT doc_id, $weightCol,
       |    CAST(-CAST(round(ln((CAST(h60 AS DOUBLE) + 1.0)
       |        / 1152921504606846977.0) * 1000000) AS BIGINT) AS DOUBLE)
       |      / CAST($weightCol AS DOUBLE) AS score
       |  FROM h)
       |SELECT CAST(row_number() OVER (ORDER BY score ASC, doc_id ASC)
       |         AS INTEGER) AS rank,
       |  doc_id, $weightCol, score
       |FROM s ORDER BY score ASC, doc_id ASC LIMIT $k""".stripMargin

  /** Deterministic per-group exact-k sample ("take k docs per source" —
    * the eval-set construction primitive the Bernoulli samplers cannot
    * give, because keep-rate sampling only hits k in expectation):
    * rank by md5(key) WITHIN each group, keep rank ≤ k. Selection and
    * rank are pure functions of (group, key) — stable across runs and
    * partitionings; appending docs to a group can displace earlier picks
    * (rank-based, unlike the hash-threshold samplers — documented
    * trade-off for exactness).
    *
    * Scale: one hash exchange on `group` + per-group sort window —
    * parallelism = group cardinality; for very hot groups pre-filter
    * with [[sampleMille]] at a rate that keeps ≳k expected survivors,
    * then rank the survivors. Output keeps `sample_rank` so the ORDER
    * (not just membership) is part of the bitwise contract. */
  def groupSample(df: DataFrame, key: Column, group: Column,
                  k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group)
      .orderBy(md5(key.cast("string")).asc, key.cast("string").asc)
    df.withColumn("sample_rank", row_number().over(w).cast("int"))
      .filter(col("sample_rank") <= k)
  }

  /** DuckDB mirror of [[groupSample]] over the documents table
    * (key = doc_id, group = source). */
  def duckGroupSampleSql(k: Int): String =
    s"""SELECT doc_id, source, sample_rank FROM (
       |  SELECT doc_id, source,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)),
       |               CAST(doc_id AS VARCHAR)) AS INTEGER) AS sample_rank
       |  FROM documents)
       |WHERE sample_rank <= $k""".stripMargin

  /** Greedy per-source token-budget fill — the final assembly step of a
    * training-data mixture: each source contributes documents, in a
    * deterministic priority order, until its token budget is reached
    * (the "sample X billion tokens per domain" primitive;
    * [[mixtureRates]] decides the per-source budgets, this op realizes
    * them at the document level).
    *
    * Keep rule: a doc is kept iff the tokens taken BEFORE it
    * (`cum_tok − n_tok`) are under the budget — so the doc that crosses
    * the line is kept and the overshoot is < one document (the standard
    * greedy fill; trimming the final doc is a downstream `slice`).
    * Priority = the corpus-wide md5 hash order (rerun- and
    * partitioning-invariant; any total order — e.g. a quality score with
    * doc_id tie-break — slots in unchanged). `fill_rank`/`cum_tok` are
    * emitted so the ORDER and the running total are part of the bitwise
    * contract.
    *
    * Scale: one hash exchange on `source` + per-source sort window
    * (exact int64 cumulative sums, no float) — parallelism = source
    * cardinality; for very hot sources pre-thin with [[sampleMille]] at
    * a rate that keeps the expected survivor token mass ≳ budget, then
    * fill the survivors. */
  def tokenBudgetFill(seqs: DataFrame, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")).asc,
        col("doc_id").cast("string").asc)
    seqs
      .select(col("doc_id"), col("source"),
        col("n_tok").cast("long").as("n_tok"))
      .withColumn("fill_rank", row_number().over(w).cast("int"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .filter(col("cum_tok") - col("n_tok") < budget)
  }

  /** DuckDB mirror of [[tokenBudgetFill]] over a `(doc_id, source,
    * n_tok)` prelude CTE named `seqs`. */
  def duckTokenBudgetSql(prelude: String, budget: Long): String =
    s"""WITH $prelude
       |SELECT doc_id, source, n_tok, fill_rank, cum_tok FROM (
       |  SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
       |    CAST(row_number() OVER w AS INTEGER) AS fill_rank,
       |    CAST(sum(n_tok) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |      AS cum_tok
       |  FROM seqs
       |  WINDOW w AS (PARTITION BY source
       |    ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)))
       |WHERE cum_tok - n_tok < $budget""".stripMargin

  /** DuckDB mirror of [[assignSplit]] over the documents table. */
  def duckSplitSql(spec: SplitSpec = SplitSpec()): String =
    s"""SELECT doc_id, ${duckMilleSlot("doc_id")} AS bucket,
       |  CASE WHEN ${duckMilleSlot("doc_id")} < ${spec.train} THEN 'train'
       |       WHEN ${duckMilleSlot("doc_id")} < ${spec.train + spec.valid}
       |         THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin
}
