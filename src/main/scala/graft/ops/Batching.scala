package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-bucketed batch assembly — the padded-minibatch counterpart of
  * sequence packing: group sequences of similar length so per-batch
  * padding (to the batch max) wastes the fewest tokens, then report the
  * waste. Padding efficiency is why seq2seq / encoder training buckets by
  * length instead of batching the shuffle order directly.
  *
  * Determinism & scale: a sequence's batch is a pure function of
  * (its length bucket, its [[Sampling.milleSlot]] shard, its rank by
  * [[Sampling.epochKey]] within that (bucket, shard)). The only window
  * runs per (bucket, shard) — parallelism = buckets × shards, each
  * partition 1/shards of a bucket, so no global rank and no single-
  * partition window at any corpus size; growing the corpus only grows
  * partition row counts, fixable by raising `nShards` (which reshapes
  * batches deterministically, like re-sharding any epoch order).
  *
  * Reference analog: the classifier assembles fixed-width training
  * matrices from variable-length descriptors by resampling to a fixed
  * frame count (`FeatureVector` 40×48 layout); bucketed padding is the
  * token-corpus counterpart where truncation is not allowed. */
object Batching {

  /** Bucket index for a length column: the number of `edges` the length
    * exceeds (edges sorted ascending; lengths > last edge land in bucket
    * edges.size). */
  def bucketOf(nTok: Column, edges: Seq[Int]): Column =
    edges.foldLeft(lit(0))((acc, e) => acc + when(nTok > e, 1).otherwise(0))

  /** Assign every sequence to (bucket, shard, batch_id, slot): batches of
    * `batchSize` sequences, filled in epoch-hash order within each
    * (bucket, shard). */
  def assign(seqs: DataFrame, key: Column, edges: Seq[Int],
             batchSize: Int, nShards: Int, epoch: Int = 0): DataFrame = {
    require(batchSize >= 1 && nShards >= 1,
      s"bad batching params: size=$batchSize shards=$nShards")
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(Sampling.epochKey(key, epoch))
    seqs
      .withColumn("bucket", bucketOf(col("n_tok"), edges))
      .withColumn("shard", (Sampling.milleSlot(key) % nShards).cast("int"))
      .withColumn("rank", row_number().over(w))
      .withColumn("batch_id", ((col("rank") - 1) / batchSize).cast("int"))
      .withColumn("slot", ((col("rank") - 1) % batchSize).cast("int"))
      .drop("rank")
  }

  /** Per-batch padding report: sequences per batch, the batch's padded
    * width (its max length), total real tokens, and `pad_waste` — the
    * padding tokens burned if every member pads to the width. */
  def report(assigned: DataFrame): DataFrame =
    assigned.groupBy("bucket", "shard", "batch_id")
      .agg(count(lit(1)).as("n_seqs"),
        max(col("n_tok")).as("width"),
        sum(col("n_tok").cast("long")).as("real_tok"))
      .withColumn("pad_waste",
        col("width").cast("long") * col("n_seqs") - col("real_tok"))

  /** DuckDB mirror of [[assign]] |> [[report]] over a `seqs` CTE bound by
    * `prelude` (no leading WITH); column math mirrors the Spark side
    * op-for-op. */
  def duckSql(prelude: String, edges: Seq[Int], batchSize: Int,
              nShards: Int, epoch: Int = 0): String = {
    // empty edges = one bucket, id 0 — same as the Spark side's bucketOf
    // (a bare `()` would be a DuckDB parse error)
    val bucket =
      if (edges.isEmpty) "0"
      else edges.map(e => s"CASE WHEN n_tok > $e THEN 1 ELSE 0 END")
        .mkString("(", " + ", ")")
    s"""WITH $prelude,
       |a AS (
       |  SELECT doc_id, n_tok,
       |    $bucket AS bucket,
       |    CAST(${Sampling.duckMilleSlot("doc_id")} % $nShards AS INTEGER)
       |      AS shard,
       |    ${Sampling.duckEpochKey("doc_id", epoch)} AS ekey
       |  FROM seqs),
       |r AS (
       |  SELECT doc_id, n_tok, bucket, shard,
       |    row_number() OVER (PARTITION BY bucket, shard ORDER BY ekey)
       |      AS rank
       |  FROM a)
       |SELECT bucket, shard,
       |  CAST((rank - 1) // $batchSize AS INTEGER) AS batch_id,
       |  CAST(count(*) AS BIGINT) AS n_seqs,
       |  max(n_tok) AS width,
       |  CAST(sum(n_tok) AS BIGINT) AS real_tok,
       |  CAST(CAST(max(n_tok) AS BIGINT) * count(*) - sum(n_tok) AS BIGINT)
       |    AS pad_waste
       |FROM r
       |GROUP BY bucket, shard, (rank - 1) // $batchSize""".stripMargin
  }
}
