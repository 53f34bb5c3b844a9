package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage throughput profile of the feature pipeline (dev tool —
  * finds which projection dominates per-doc cost). */
object StageProf {
  def main(args: Array[String]): Unit = {
    val scale = sys.env.getOrElse("PROF_SCALE", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.register(spark)
    def sq = graft.sources.Seqs.scaledFromDocuments(spark,
      "/root/testdata/sf0.1", scale)
    def t(name: String)(df: => DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("tokengen")(sq)
    t("tokengen+frames")(sq.withColumn("frames",
      graft.core.Framing.framesExpr(2048, 1024, 32)))
    t("+series transforms")(sq
      .withColumn("frames", graft.core.Framing.framesExpr(2048, 1024, 32))
      .withColumn("rms_series", expr("transform(frames, fr -> fr.rms)"))
      .withColumn("peak_series", expr("transform(frames, fr -> CAST(fr.peak AS DOUBLE))"))
      .withColumn("env_series", expr("graft_envelope_scan(rms_series, CAST(0.6 AS DOUBLE))"))
      .withColumn("audible_flags", expr("transform(frames, fr -> fr.is_audible)")))
    t("+stats blocks")(sq
      .withColumn("frames", graft.core.Framing.framesExpr(2048, 1024, 32))
      .withColumn("rms_series", expr("transform(frames, fr -> fr.rms)"))
      .withColumn("st", expr("graft_stats_block(rms_series)")))
    t("+effective bounds")(sq
      .withColumn("b", expr("graft_effective_bounds(tokens, array(32, 128, 512))")))
    t("featuresLl")(graft.features.Pipeline.featuresLl(sq))
    t("fv_full")(graft.features.FeatureVector.fvFull(sq))
    spark.stop()
  }
}
