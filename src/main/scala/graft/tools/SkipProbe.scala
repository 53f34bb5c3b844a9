package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sub-plan cost attribution for skipgram_top (dev tool). */
object SkipProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.register(spark)
    def seqs = graft.sources.Seqs.fromDocuments(spark, dir)
    def t(name: String)(df: => DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[skipprobe] $name: min ${times.min}%.2f  " +
        times.map(x => f"$x%.2f").mkString(" "))
    }
    def inst = seqs.select(
      explode(expr("graft_skipgrams(tokens, 3)")).as("code"))
    t("long-key agg")(inst.groupBy(col("code"))
      .agg(count(lit(1)).as("c")))
    t("int-key agg")(seqs.select(
        explode(expr("transform(graft_skipgrams(tokens, 3), c -> CAST(c AS INT))")).as("code"))
      .groupBy(col("code")).agg(count(lit(1)).as("c")))
    t("int-key proj agg")(inst.select(col("code").cast("int").as("code"))
      .groupBy(col("code")).agg(count(lit(1)).as("c")))
    t("full skipgram_top")(graft.ops.Sketches.skipgramTop(seqs, 3, 100))
    spark.stop()
  }
}
