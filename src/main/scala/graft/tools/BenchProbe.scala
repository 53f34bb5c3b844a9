package graft.tools

import org.apache.spark.sql.SparkSession

/** Min-of-N timing probe matching graft.Bench's methodology exactly:
  * DataFrame CONSTRUCTION + noop write both inside the timed region (the
  * [[QueryProbe]] collect-only form under-measures queries that run
  * eager work — checkpoints, driver-side model fits — at construction).
  * Usage: BenchProbe <sfDir> <reps> <query> [query ...] */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false)
      .appName("benchprobe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime
        qs(name)(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime - t0) / 1e9
      }
      once() // warm
      val times = (1 to reps).map(_ => once())
      println(f"$name%-22s min ${times.min}%6.2f s  reps " +
        times.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
