package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main. Prints ONE JSON line:
  * `{"metric":"…","value":<total sec>,"unit":"sec","queries":{name:sec,…},
  *   "sf":…, "fv_rows":N, "fv_rows_per_sec":R, "cpus":C}`.
  *
  * Every query is forced through the `noop` writer so the full plan
  * materializes (a bare `count()` would let Catalyst prune the feature
  * columns and benchmark a scan). The headline metric is feature-vector
  * rows/sec (entity × 48 point-in-time offsets — BASELINE.json), measured
  * on the full low-level pipeline. Scaling evidence across two parallelism
  * levels comes from running this main at two SPARK_GRAFT_CPUS values
  * (scripts/bench_scaling.sh → BENCH.md).
  */
object Bench {

  /** Representative subset (one per operator family) — bounded so the
    * per-round bench stays minutes, not hours. */
  val BenchQueries: Seq[String] = Seq(
    "features_ll",        // headline: full per-doc feature pipeline
    "frame_rms",          // framing kernel
    "doc_stats_rms",      // stats kernel
    "pit_asof",           // as-of join
    "onsets",             // window battery (median/edge/refractory/session)
    "events_sessionize",  // event-time sessionization
    "events_asof",        // event-time as-of
    "dedup_minhash",      // minhash signatures
    "dedup_lsh_pairs",    // LSH bucket join
    "embed_topk",         // similarity search
    "q3_join")            // relational join/agg

  def allQueries: Map[String, (SparkSession, String) => DataFrame] =
    SparkEntry.queries +
      ("features_ll" -> ((s: SparkSession, dir: String) =>
        graft.features.Pipeline.featuresLlFromDir(s, dir)))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = allQueries
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        qs(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage.take(200)}")
          -1.0
      }
    }

    // JIT/IO warm-up on the headline pipeline (excluded from timings)
    runOne("features_ll")

    val results = BenchQueries.map(n => n -> runOne(n))
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val fvRows = nDocs * graft.features.PointInTime.TimeOffsets.length
    val llSec = results.toMap.getOrElse("features_ll", -1.0)
    val fvRate = if (llSec > 0) fvRows / llSec else -1.0
    val total = results.map(_._2).filter(_ > 0).sum
    val qJson = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"feature-vector rows/sec (entity x 48 offsets); per-query wall sec","value":$total,"unit":"sec","queries":$qJson,"sf":"$sfDir","n_docs":$nDocs,"fv_rows":$fvRows,"fv_rows_per_sec":$fvRate,"cpus":$cpus}""")
    spark.stop()
  }
}
