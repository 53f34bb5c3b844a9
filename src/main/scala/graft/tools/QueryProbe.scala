package graft.tools

import org.apache.spark.sql.SparkSession

/** Min-of-N timing probe for individual SparkEntry queries at full
  * parallelism (the BENCH.md A/B pattern — single battery entries swing
  * with VM noise, so A/B perf claims use a dedicated min-of-N in one JVM).
  * Usage: QueryProbe <sfDir> <reps> <query> [query ...] */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("queryprobe").getOrCreate()
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val t0 = System.nanoTime
        df.collect()
        (System.nanoTime - t0) / 1e9
      }
      println(f"$name%-20s min ${times.min}%6.2f s  reps " +
        times.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
