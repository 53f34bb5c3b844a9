package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: concat-and-chunk assembly of pre-tokenized documents
  * into fixed-capacity training windows (the GPT-style pretraining batch
  * layout — concatenate every document in a deterministic corpus order,
  * then cut the global token stream into `capacity`-sized chunks).
  *
  * The reference's analog is the fixed analysis frame clock cut from the
  * continuous sample stream (`SampleAnalyser.cpp:760-814`: a single running
  * sample cursor chunked into frame/hop windows); here the "stream" is the
  * corpus-ordered token concatenation and the "frame" is the training
  * context window.
  *
  * Output is the (doc × chunk) SEGMENT MAP — one row per overlap of a
  * document with a chunk:
  *
  * {{{ (doc_id, chunk_id, doc_off, chunk_off, seg_len) }}}
  *
  * so `tokens[doc_off, doc_off+seg_len)` of `doc_id` lands at
  * `chunk[chunk_off, chunk_off+seg_len)`. The map is exactly what a
  * downstream materializer needs to gather token slices; emitting the map
  * instead of materialized chunks keeps the operator a pure metadata
  * computation (no token bytes move through the shuffle).
  *
  * == Scale design (the 100 TB story) ==
  * The only global object in the computation is the PREFIX SUM of document
  * lengths in corpus order. A naive `Window.orderBy(doc)` with no
  * partitioning funnels the whole corpus through one task; instead the
  * engine runs the classic two-pass distributed scan:
  *
  *   1. split the key space into `buckets` contiguous ranges — boundaries
  *      come from a fixed-size, deterministically hash-ordered sample
  *      (`buckets × 32` keys, one column-pruned take job) collected ONCE,
  *      so the bucket id is a PURE PROJECTION of the row. (An earlier form
  *      used `repartitionByRange` + `spark_partition_id()`, which hands
  *      boundary sampling to the physical exchange; the bucket table and
  *      the data side then instantiate that exchange in two plan subtrees,
  *      and only Spark's exchange-reuse rule keeps their sampled
  *      boundaries identical. Literal boundaries remove the dependency.)
  *   2. per-bucket token totals (one tiny agg, `buckets` rows);
  *   3. running bucket base offsets — a window over the BUCKET table
  *      (bounded by the bucket count, never the corpus), broadcast back;
  *   4. intra-bucket running sum (`Window.partitionBy(bucket)`), each
  *      partition bounded by corpus_size / buckets.
  *
  * The result is invariant to the bucketing (any contiguous range split
  * yields the same prefix sums — PackingSpec pins buckets=1 == buckets=8),
  * so boundary placement cannot leak into output. Chunk arithmetic is
  * exact int64; no floats anywhere.
  */
object Packing {

  /** Segment map of packing `seqs` (ordered by `ord`) into chunks of
    * `capacity` tokens. `lenCol` is the per-row token count; rows with
    * zero length vanish (they occupy no positions). */
  def packChunks(seqs: DataFrame, ord: String, lenCol: String,
                 capacity: Long, buckets: Int = 64): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    // Deterministic range boundaries: a hash-ordered fixed-size key sample
    // (the same cost class as RangePartitioner's sketch — one take job over
    // the pruned key column), quantile-cut in a single tiny window. The
    // collect is bounded at `buckets − 1` boundary LITERALS (planning
    // metadata, not data — the same driver role RangePartitioner's sketch
    // plays); `__b` below is then a pure function of the row, so every plan
    // subtree agrees on it by construction.
    val sampleDf = seqs.select(col(ord).as("__k"))
      .orderBy(md5(col("__k").cast("string")), col("__k"))
      .limit(buckets * 32)
    val cuts: Array[Any] =
      if (buckets <= 1) Array.empty
      else sampleDf
        .withColumn("__nt", ntile(buckets).over(Window.orderBy(col("__k"))))
        .groupBy(col("__nt")).agg(min(col("__k")).as("__cut"))
        .filter(col("__nt") > 1).orderBy(col("__nt"))
        .collect().map(_.get(1))
    val bucketExpr = cuts.foldLeft(lit(0)) { (acc, cut) =>
      acc + when(col(ord) >= lit(cut), 1).otherwise(0) }
    val bucketed = seqs.withColumn("__b", bucketExpr)
    // per-bucket totals + running base offset over the (tiny) bucket table.
    // Buckets are range-ordered by construction (partition 0 = lowest keys),
    // so ordering by __b IS the corpus order.
    val wb = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = bucketed.groupBy(col("__b"))
      .agg(sum(col(lenCol).cast("long")).as("__bsum"))
      .withColumn("__base", coalesce(sum(col("__bsum")).over(wb), lit(0L)))
      .select(col("__b"), col("__base"))
    // intra-bucket exclusive running sum: partitions bounded by bucket size
    val wi = Window.partitionBy(col("__b")).orderBy(col(ord))
      .rowsBetween(Window.unboundedPreceding, -1)
    val started = bucketed.join(broadcast(bases), "__b")
      .withColumn("doc_start",
        col("__base") + coalesce(sum(col(lenCol).cast("long")).over(wi), lit(0L)))
      .filter(col(lenCol) > 0)
    started
      .withColumn("__len", col(lenCol).cast("long"))
      .withColumn("chunk_id", explode(expr(
        s"sequence(doc_start div $capacity, (doc_start + __len - 1) div $capacity)")))
      .withColumn("__g0", greatest(col("doc_start"), col("chunk_id") * capacity))
      .withColumn("__g1", least(col("doc_start") + col("__len"),
        (col("chunk_id") + 1) * capacity))
      .select(col(ord), col("chunk_id"),
        (col("__g0") - col("doc_start")).as("doc_off"),
        (col("__g0") - col("chunk_id") * capacity).as("chunk_off"),
        (col("__g1") - col("__g0")).as("seg_len"))
  }

  /** Per-chunk packing report over the segment map: how many documents
    * contribute, boundary fragmentation, and fill (only the final chunk may
    * be partial — the invariant a packer must prove). One keyed agg. */
  def packStats(segments: DataFrame, capacity: Long): DataFrame =
    segments.groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("seg_len")).as("fill"),
        max(when(col("doc_off") > 0, 1).otherwise(0)).as("has_head_frag"),
        sum(when(col("chunk_off") === 0, 1).otherwise(0)).as("n_starts"))
      .withColumn("is_full", when(col("fill") === capacity, 1).otherwise(0))

  /** DuckDB mirror of [[packChunks]] (single-window prefix sum — the
    * oracle does not need the distributed two-pass). `prelude` must bind a
    * `seqs` CTE (no leading WITH). */
  def duckPackSql(prelude: String, capacity: Long): String =
    s"""WITH $prelude,
       |c AS (
       |  SELECT doc_id, CAST(n_tok AS BIGINT) AS len,
       |    CAST(coalesce(sum(CAST(n_tok AS BIGINT)) OVER (
       |      ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS doc_start
       |  FROM seqs),
       |e AS (
       |  SELECT doc_id, len, doc_start,
       |    unnest(generate_series(doc_start // $capacity,
       |                           (doc_start + len - 1) // $capacity))
       |      AS chunk_id
       |  FROM c WHERE len > 0)
       |SELECT doc_id, chunk_id,
       |  greatest(doc_start, chunk_id * $capacity) - doc_start AS doc_off,
       |  greatest(doc_start, chunk_id * $capacity) - chunk_id * $capacity
       |    AS chunk_off,
       |  least(doc_start + len, (chunk_id + 1) * $capacity)
       |    - greatest(doc_start, chunk_id * $capacity) AS seg_len
       |FROM e""".stripMargin

  /** DuckDB mirror of [[packStats]] over [[duckPackSql]]'s output. */
  def duckPackStatsSql(prelude: String, capacity: Long): String =
    s"""WITH seg AS (
       |${duckPackSql(prelude, capacity).replace("\n", "\n  ")}
       |)
       |SELECT chunk_id,
       |  count(*) AS n_docs,
       |  CAST(sum(seg_len) AS BIGINT) AS fill,
       |  CAST(max(CASE WHEN doc_off > 0 THEN 1 ELSE 0 END) AS INTEGER)
       |    AS has_head_frag,
       |  CAST(sum(CASE WHEN chunk_off = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_starts,
       |  CAST(CASE WHEN sum(seg_len) = $capacity THEN 1 ELSE 0 END AS INTEGER)
       |    AS is_full
       |FROM seg GROUP BY chunk_id""".stripMargin

  /** The COMPLEMENT of [[packChunks]]: split each document into
    * fixed-length training windows of `win` tokens at `stride`-token
    * starts (overlapping when `stride < win` — the standard LM
    * pretraining chunker with context overlap), materializing the actual
    * token slices: `(doc_id, win_id, start, win_tokens, win_len)`. The
    * final partial window is kept when it still has ≥ `minLen` tokens.
    * Where packChunks assembles a dense global stream (no token repeated,
    * doc boundaries crossed), splitWindows stays within documents and
    * trades duplication (the overlap) for per-window attention locality.
    *
    * Plan: one narrow projection — `sequence` over window STARTS (≤
    * n_tok / stride values, never per token) exploded, `slice` per start
    * (both codegen'd builtins); zero shuffle, embarrassingly parallel at
    * any corpus size. Output is exact token arrays — the engine/oracle
    * compare pins every window bitwise. */
  def splitWindows(seqs: DataFrame, win: Int, stride: Int,
                   minLen: Int): DataFrame = {
    require(win >= 1 && stride >= 1 && minLen >= 1 && minLen <= win,
      s"bad split params: win=$win stride=$stride minLen=$minLen")
    seqs.filter(col("n_tok") > 0)
      .select(col("doc_id"), col("tokens"), col("n_tok"),
        explode(expr(s"sequence(0, n_tok - 1, $stride)")).as("start"))
      .select(col("doc_id"),
        expr(s"CAST(start div $stride AS INT)").as("win_id"),
        col("start").cast("int").as("start"),
        expr(s"slice(tokens, start + 1, $win)").as("win_tokens"),
        least(lit(win), col("n_tok") - col("start")).cast("int")
          .as("win_len"))
      .filter(col("win_len") >= minLen)
  }

  /** DuckDB mirror of [[splitWindows]]. */
  def duckSplitWindowsSql(prelude: String, win: Int, stride: Int,
                          minLen: Int): String =
    s"""WITH $prelude
       |SELECT doc_id,
       |  CAST(s // $stride AS INTEGER) AS win_id,
       |  CAST(s AS INTEGER) AS start,
       |  tokens[s + 1 : least(s + $win, n_tok)] AS win_tokens,
       |  CAST(least($win, n_tok - s) AS INTEGER) AS win_len
       |FROM (SELECT doc_id, tokens, n_tok,
       |        unnest(range(0, CAST(n_tok AS BIGINT), $stride)) AS s
       |      FROM seqs WHERE n_tok > 0)
       |WHERE least($win, n_tok - s) >= $minLen""".stripMargin
}
