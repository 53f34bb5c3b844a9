package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the sketch_hll plan shape (see BENCH.md): times the query
  * and its upstream stages, and counts corpus passes (Generate nodes) in
  * the executed plan. */
object HllProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("hllprobe").getOrCreate()
    val dir = "/root/testdata/sf0.1"
    graft.functions.expressions.register(spark)
    val seqs = graft.sources.Seqs.fromDocuments(spark, dir)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime
      val r = f
      println(f"$label: ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }

    val ex = seqs.select(col("source"),
      explode(expr("graft_pack_ngrams(tokens, 2)")).as("gram"))
    t("explode+count (corpus-pass floor)") { println("  rows=" + ex.count()) }

    // min-of-3, fresh DataFrame each rep so every rep re-executes the
    // full job (no shuffle reuse across reps)
    val reps = (1 to 3).map { i =>
      val df = graft.SparkEntry.queries("sketch_hll")(spark, dir)
      val t0 = System.nanoTime
      df.collect()
      val s = (System.nanoTime - t0) / 1e9
      println(f"sketch_hll rep$i: $s%.2f s")
      s
    }
    println(f"sketch_hll min: ${reps.min}%.2f s")
    val plan = graft.SparkEntry.queries("sketch_hll")(spark, dir)
      .queryExecution.executedPlan.toString
    println("Generate count: " + "Generate".r.findAllIn(plan).size)
    println("Exchange count: " + "Exchange".r.findAllIn(plan).size)
    spark.stop()
  }
}
