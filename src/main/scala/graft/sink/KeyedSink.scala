package graft.sink

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent keyed sink with snapshot metadata — the engine's analog of
  * AFEC's `INSERT OR REPLACE INTO assets` keyed by filename
  * (`SqliteSampleDescriptorPool.cpp:1582-1651`) and of the incremental
  * change-list driver (`Crawler.cpp:934-998`).
  *
  * == Production mapping ==
  * On a real cluster this is Iceberg:
  * {{{
  *   MERGE INTO features t USING updates s ON t.doc_id = s.doc_id
  *   WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  * }}}
  * with snapshot commit-summary metrics and incremental scans between
  * snapshots for resume. This sandbox has no Iceberg jars, so the same
  * contract is implemented over parquet with an atomic snapshot-pointer
  * protocol (write `snap-N/`, fsync metadata JSON, flip `_latest`):
  * readers always see a complete snapshot; a killed writer leaves the
  * previous snapshot intact (resume = re-run, the upsert is idempotent).
  *
  * == Scale notes ==
  * The merge is `updates ∪ (existing ⟕anti updates)` — one shuffle-free
  * union plus one hash anti-join on the key; Iceberg's merge-on-read does
  * the same with positional deletes. AFEC's single-writer mutex
  * (`Crawler.cpp:685`) disappears: the atomic pointer flip is the only
  * serialization point and is O(1).
  */
object KeyedSink {

  final case class CommitStats(
      snapshot: Int, totalRows: Long, upsertedRows: Long, deletedRows: Long,
      partitions: Int)

  private def latestFile(path: String) = Paths.get(path, "_latest")

  /** Current snapshot id, if any commit exists. */
  def latestSnapshot(path: String): Option[Int] = {
    val f = latestFile(path)
    if (Files.exists(f)) Some(Files.readString(f).trim.stripPrefix("snap-").toInt)
    else None
  }

  /** Read the latest committed state (empty option when never committed). */
  def read(spark: SparkSession, path: String): Option[DataFrame] =
    latestSnapshot(path).map(n => spark.read.parquet(s"$path/snap-$n"))

  /** Logical MERGE: rows from `updates` win by `key`; `existing` rows with
    * no update pass through; keys in `deletes` are dropped. */
  def merge(existing: DataFrame, updates: DataFrame, key: String,
            deletes: Option[DataFrame] = None): DataFrame = {
    val kept = existing.join(updates.select(col(key)), Seq(key), "left_anti")
    val merged = updates.unionByName(kept)
    deletes match {
      case Some(d) => merged.join(d.select(col(key)), Seq(key), "left_anti")
      case None => merged
    }
  }

  /** Upsert `updates` (and optional `deletes`) into the sink at `path`.
    * Commits a new snapshot with lineage/row-count metrics in its metadata
    * JSON (the Iceberg commit-summary analog). Returns the stats. */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
             key: String, deletes: Option[DataFrame] = None): CommitStats = {
    Files.createDirectories(Paths.get(path))
    val next = latestSnapshot(path).getOrElse(0) + 1
    val merged = read(spark, path) match {
      case Some(existing) => merge(existing, updates, key, deletes)
      case None => deletes match {
        case Some(d) => updates.join(d.select(col(key)), Seq(key), "left_anti")
        case None => updates
      }
    }
    val snapDir = s"$path/snap-$next"
    merged.write.mode("overwrite").parquet(snapDir)
    val total = spark.read.parquet(snapDir).count()
    val nUp = updates.count()
    val nDel = deletes.map(_.count()).getOrElse(0L)
    val nPart = spark.read.parquet(snapDir).rdd.getNumPartitions
    val stats = CommitStats(next, total, nUp, nDel, nPart)
    // commit metadata (lineage + metrics), then atomically flip the pointer
    val meta =
      s"""{"snapshot": $next, "total_rows": $total, "upserted_rows": $nUp,
         | "deleted_rows": $nDel, "partitions": $nPart,
         | "parent": ${latestSnapshot(path).getOrElse(0)},
         | "key": "$key"}""".stripMargin.replace("\n", "")
    Files.writeString(Paths.get(path, s"snap-$next.json"), meta)
    val tmp = Paths.get(path, "_latest.tmp")
    Files.writeString(tmp, s"snap-$next")
    Files.move(tmp, latestFile(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    stats
  }

  /** Resume support: the subset of `src` not yet up-to-date in the sink —
    * new keys plus keys whose `version` differs (modtime-diff semantics,
    * `Crawler.cpp:934-998`). Running the pipeline on `pending` and
    * upserting is an exact incremental re-run. */
  def pending(spark: SparkSession, path: String, src: DataFrame,
              key: String, version: String): DataFrame =
    read(spark, path) match {
      case None => src
      case Some(dst) =>
        val d = dst.select(col(key), col(version).as("__v"))
        src.join(d, Seq(key), "left_outer")
          .filter(col("__v").isNull || col("__v") =!= col(version))
          .drop("__v")
    }
}
