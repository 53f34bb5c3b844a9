package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Framing
import graft.features.Pipeline
import graft.functions.Stats
import graft.sources.Seqs

/** Stage-by-stage cost attribution for the headline pipeline (dev tool).
  * `sbt "runMain graft.tools.Profile <sfDir> <scale> <cpus>"` */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scale = if (args.length > 1) args(1).toInt else 20
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def seqs = Seqs.scaledFromDocuments(spark, sfDir, scale)

    def cpuStat(): (Long, Long) = { // (steal, total) jiffies
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
      val f = l.trim.split("\\s+").drop(1).map(_.toLong)
      (f(7), f.sum)
    }

    def time(name: String)(df: => DataFrame): Unit = {
      val d = df
      d.write.mode("overwrite").format("noop").save() // warm
      val (s0, t0j) = cpuStat()
      val t0 = System.nanoTime()
      d.write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val (s1, t1j) = cpuStat()
      val stealPct = if (t1j > t0j) 100.0 * (s1 - s0) / (t1j - t0j) else 0.0
      println(f"$name%-28s $wall%8.2f s   steal=$stealPct%5.1f%%")
    }

    time("tokens only")(seqs)
    time("tokens+frames")(Framing.withFrames(seqs))
    time("+series")(Framing.withFrames(seqs)
      .withColumn("rms_series", expr("transform(frames, fr -> fr.rms)"))
      .withColumn("peak_series", expr("transform(frames, fr -> CAST(fr.peak AS DOUBLE))"))
      .withColumn("env_series", expr("graft_envelope_scan(rms_series, CAST(0.6 AS DOUBLE))"))
      .withColumn("audible_flags", expr("transform(frames, fr -> fr.is_audible)")))
    time("+stats (2 blocks)") {
      val f = Framing.withFrames(seqs)
        .withColumn("rms_series", expr("transform(frames, fr -> fr.rms)"))
        .withColumn("env_series", expr("graft_envelope_scan(rms_series, CAST(0.6 AS DOUBLE))"))
      Seq("rms" -> "rms_series", "env" -> "env_series").foldLeft(f) {
        case (df, (p, s)) =>
          val st = df.withColumn(s"__st_$p", expr(s"graft_stats_block($s)"))
          Stats.StatNames.foldLeft(st)((d, n) =>
            d.withColumn(s"${p}_$n", col(s"__st_$p.$n"))).drop(s"__st_$p")
      }
    }
    time("+bounds only")(Framing.withFrames(seqs)
      .withColumn("__bounds", expr("graft_effective_bounds(tokens, array(32, 128, 512))")))
    time("full featuresLl")(Pipeline.featuresLl(seqs))
    time("full minus tokens col")(Pipeline.featuresLl(seqs).drop("tokens"))
    spark.stop()
  }
}
