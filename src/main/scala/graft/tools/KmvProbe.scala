package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-attribution probe for the KMV distinct-sketch query
  * (`sketch_kmv`): times the bigram explode, the distinct, and the
  * hash+kmin tail separately (min of 3 in one JVM — the repo's A/B
  * convention), plus an arithmetic-hash control that isolates the
  * md5/conv string-op cost from the shuffle cost. */
object KmvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.register(spark)
    val seqs = graft.sources.Seqs.fromDocuments(spark, sfDir)
    def time(name: String)(f: => Long): Unit = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[kmvprobe] $name%-18s min=${reps.map(_._1).min}%.2fs " +
        f"n=${reps.head._2}")
    }
    val bi0 = seqs.select(col("source"),
      explode(expr("graft_pack_ngrams(tokens, 2)")).as("gram"))
    time("explode")(bi0.groupBy().count().collect()(0).getLong(0))
    val bi = bi0.distinct()
    time("explode+distinct")(bi.groupBy().count().collect()(0).getLong(0))
    val h = bi.select(col("source"),
      conv(substring(md5(concat(lit("kmv:"), col("source"), lit(":"),
        col("gram").cast("string"))), 1, 15), 16, 10).cast("long").as("h"))
    // force the hash + sketch columns (a bare count() lets Catalyst prune
    // the aggregate and the hash projection entirely — measured 0.6 s of
    // pure shuffle when this probe first used count())
    def forceKmin(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(col("source")).agg(expr("graft_kmin(h, 64)").as("hs"))
        .agg(sum(expr("try_element_at(hs, 1)"))).collect()(0).getLong(0)
    time("dist+md5+kmin")(forceKmin(h))
    val h2 = bi.select(col("source"),
      (col("gram") * 2654435761L % 1099511627776L).as("h"))
    time("dist+arith+kmin")(forceKmin(h2))
    spark.stop()
  }
}
