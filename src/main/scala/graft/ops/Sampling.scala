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

  /** Per-mille hash slot in [0, 1000) for a key column — the shared
    * primitive of [[assignSplit]] and [[sampleMille]]. */
  def milleSlot(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000).cast("int")

  /** SQL twin of [[milleSlot]] for the DuckDB mirror (`key` is a SQL
    * expression of an integral or string column). */
  def duckMilleSlot(key: String): String =
    s"CAST(('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8))::BIGINT % 1000 AS INTEGER)"

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

  /** DuckDB mirror of [[assignSplit]] over the documents table. */
  def duckSplitSql(spec: SplitSpec = SplitSpec()): String =
    s"""SELECT doc_id, ${duckMilleSlot("doc_id")} AS bucket,
       |  CASE WHEN ${duckMilleSlot("doc_id")} < ${spec.train} THEN 'train'
       |       WHEN ${duckMilleSlot("doc_id")} < ${spec.train + spec.valid}
       |         THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin
}
