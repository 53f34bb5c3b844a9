package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: why is fv_full fast on the unscaled corpus but slow on the
  * replicated bench corpus? */
object FvScaledProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def run(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    run("fv_full unscaled (5k docs)")(
      graft.features.FeatureVector.fvFull(
        graft.sources.Seqs.fromDocuments(spark, dir)))
    run("fv_full scaled x4 (20k docs)")(
      graft.features.FeatureVector.fvFull(
        graft.sources.Seqs.scaledFromDocuments(spark, dir, 4)))
    run("ll scaled x4 (20k docs)")(
      graft.features.Pipeline.featuresLl(
        graft.sources.Seqs.scaledFromDocuments(spark, dir, 4)))
    def steal(): Long = scala.io.Source.fromFile("/proc/stat").getLines()
      .next().trim.split("\\s+").drop(1)(7).toLong
    def fv20() = graft.features.FeatureVector.fvFull(
      graft.sources.Seqs.scaledFromDocuments(spark, dir, 20))
    fv20().write.mode("overwrite").format("noop").save() // warm
    for (i <- 1 to 3) {
      val s0 = steal(); val t0 = System.nanoTime()
      fv20().write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"fv_full scaled x20 rep$i: $sec%.2f s (steal ${
        100.0 * (steal() - s0) / 100.0 / (sec * 32)}%.1f%%)")
    }
    spark.stop()
  }
}
