package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape audit over every SparkEntry query: counts the corpus-pass
  * operators (FileScan, Generate) and exchange/reuse nodes in the planned
  * (pre-execution) physical plan. A query whose plan scans the same
  * relation many times without ReusedExchange is a sketch_hll-style
  * diamond — the corpus re-executes once per reference (see BENCH.md,
  * "the HLL diamond fix"). Prints one line per query sorted by scan
  * count, worst first. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("planaudit").getOrCreate()
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"

    // string-count over the printed tree: under AQE the pre-execution
    // AdaptiveSparkPlanExec hides its input plan from foreach, but
    // toString prints it
    def count(s: String, name: String): Int = name.r.findAllIn(s).size

    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, f) =>
        try {
          val df = f(spark, dir)
          val t0 = System.nanoTime
          df.collect() // AQE finalizes the plan (runtime stage reuse shows)
          val sec = (System.nanoTime - t0) / 1e9
          val s = df.queryExecution.executedPlan.toString
          val scans = count(s, "FileScan parquet") + count(s, "Scan parquet")
          val gens = count(s, "Generate ")
          val reuse = count(s, "ReusedExchange")
          val bcast = count(s, "BroadcastExchange")
          val ex = count(s, "Exchange") - reuse - bcast
          Some((name, scans, gens, ex, reuse, bcast, sec))
        } catch {
          case e: Throwable =>
            println(f"$name%-24s PLAN-ERROR ${e.getClass.getSimpleName}")
            None
        }
    }
    println(f"${"query"}%-24s scans gens shuf reuse bcast    sec")
    rows.sortBy(r => -(r._2 + r._3)).foreach {
      case (n, s, g, e, r, b, sec) =>
        println(f"$n%-24s $s%5d $g%4d $e%4d $r%5d $b%5d $sec%6.2f")
    }
    spark.stop()
  }
}
