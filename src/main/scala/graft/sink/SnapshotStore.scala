package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Commit summary returned by every mutating [[SnapshotStore]] operation —
  * the Iceberg snapshot-summary analog (`total-records`,
  * `added-records`, `deleted-records`, `total-data-files`). */
final case class CommitStats(
    snapshot: Int, totalRows: Long, upsertedRows: Long, deletedRows: Long,
    partitions: Int)

/** The engine's snapshot-table contract — the NARROW seam behind which the
  * sandbox's parquet-and-atomic-pointer implementation ([[KeyedSink]]) and
  * a production Iceberg catalog are interchangeable. Every engine surface
  * (feature persistence, model artifacts, change-list resume, streaming
  * exactly-once) talks to THIS interface; swapping in Iceberg is
  * implementing one object, not an engine audit.
  *
  * == The Iceberg mapping, method by method ==
  *
  *  - [[upsert]] → `MERGE INTO t USING u ON t.key = u.key WHEN MATCHED
  *    THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` (+ `WHEN MATCHED
  *    AND u.__del THEN DELETE` for the deletes side), copy-on-write table
  *    property. [[CommitStats]] comes from the snapshot summary.
  *  - [[upsertDelta]] → the same MERGE with `write.merge.mode =
  *    merge-on-read` (equality deletes): O(|updates|) bytes per commit.
  *  - [[compact]] → `CALL system.rewrite_data_files(...)` /
  *    `rewrite_position_delete_files`.
  *  - [[read]] → `SELECT * FROM t` (the catalog resolves the current
  *    snapshot; delta folding is Iceberg's own MoR read path).
  *  - [[readAt]] → `SELECT * FROM t VERSION AS OF n`.
  *  - [[latestSnapshot]] → `SELECT snapshot_id FROM t.refs WHERE name =
  *    'main'` (monotone int here; a snapshot id there).
  *  - [[changedSince]] → `table_changes('t', m, n)` / the incremental
  *    append scan (`incremental-from-snapshot`); the parquet protocol
  *    reconstructs it from the delta chain or a snapshot diff.
  *  - [[pending]] → anti-join of the source listing against the live
  *    table on (key, version) — identical SQL on both backends.
  *  - [[upsertStreamBatch]] / [[lastStreamBatch]] → the
  *    `foreachBatch` + MERGE exactly-once recipe; the batch id rides the
  *    snapshot summary (`spark.streaming.batchId` custom property) so
  *    replayed micro-batches skip. [[foreachBatchUpsert]] is the
  *    `writeStream.foreachBatch` adapter over it.
  *  - [[writeClassifierMeta]] / [[readClassifierMeta]] → the same keyed
  *    MERGE on a typed side table (the reference's
  *    `SqliteSampleDescriptorPool.cpp:1737-1767` class-list table).
  *
  * Contract invariants every implementation must keep (pinned by
  * KeyedSinkSpec's conformance tests, which run against this TYPE, not the
  * object — the Iceberg drop-in inherits the spec):
  *
  *  1. '''Atomic visibility''': readers see a complete committed snapshot
  *     or the previous one, never a partial write.
  *  2. '''Idempotent upsert''': re-upserting the same batch yields the
  *     same logical table (new snapshot, equal rows).
  *  3. '''Last-writer-wins by key''': an update replaces the whole row for
  *     its key; untouched keys pass through.
  *  4. '''Immutable history''': any committed snapshot id stays readable
  *     ([[readAt]]) until explicitly expired.
  *  5. '''Exactly-once streaming''': [[upsertStreamBatch]] with a replayed
  *     `batchId` is a no-op returning None.
  */
trait SnapshotStore {

  def latestSnapshot(path: String): Option[Int]

  def read(spark: SparkSession, path: String, key: String): Option[DataFrame]

  def readAt(spark: SparkSession, path: String, n: Int,
             key: String): Option[DataFrame]

  def upsert(spark: SparkSession, path: String, updates: DataFrame,
             key: String, deletes: Option[DataFrame],
             streamBatch: Option[Long]): CommitStats

  def upsertDelta(spark: SparkSession, path: String, updates: DataFrame,
                  key: String, streamBatch: Option[Long]): CommitStats

  def compact(spark: SparkSession, path: String,
              key: String): Option[CommitStats]

  def changedSince(spark: SparkSession, path: String, m: Int, n: Int,
                   key: String): Option[DataFrame]

  def pending(spark: SparkSession, path: String, src: DataFrame,
              key: String, version: String): DataFrame

  def lastStreamBatch(path: String): Option[Long]

  def upsertStreamBatch(spark: SparkSession, path: String, batchId: Long,
                        updates: DataFrame, key: String): Option[CommitStats]

  def foreachBatchUpsert(path: String, key: String): (DataFrame, Long) => Unit

  def writeClassifierMeta(spark: SparkSession, path: String,
      entries: Seq[(String, Seq[String], String)]): CommitStats

  def readClassifierMeta(spark: SparkSession, path: String): Option[DataFrame]
}
