package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sub-plan cost attribution for the r6 Kneser-Ney rewrite (dev tool). */
object KnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.register(spark)
    val e = graft.functions.expressions
    def seqs = graft.sources.Seqs.fromDocuments(spark, dir)
    def dg = seqs.select(col("doc_id"),
        explode(expr("graft_bigram_counts(tokens)")).as("gc"))
      .select(col("doc_id"), e.gramOf(col("gc")).as("gram"),
        e.cntOf(col("gc")).as("n_occ"))
    def t(name: String)(df: => DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[knprobe] $name: min ${times.min}%.2f  " +
        times.map(x => f"$x%.2f").mkString(" "))
    }
    t("tokengen only")(seqs)
    t("kernel+explode dg")(dg)
    t("dg count only")(seqs.select(col("doc_id"),
      expr("size(graft_bigram_counts(tokens))").as("n")))
    t("model g")(dg.groupBy(col("gram")).agg(sum(col("n_occ")).as("c12")))
    // model-side nll table alone (2M rows, no broadcast build)
    def g0 = dg.groupBy(col("gram")).agg(sum(col("n_occ")).as("c12"))
      .withColumn("t1", expr("gram div 4096"))
      .withColumn("t2", expr("gram % 4096"))
    def t1a = g0.groupBy(col("t1")).agg(sum(col("c12")).as("c1"),
      count(lit(1)).as("n1w"))
    def t2a = g0.groupBy(col("t2")).agg(count(lit(1)).as("ncont"))
    def n11 = g0.agg(count(lit(1)).as("__n11"))
    def nll = g0.join(broadcast(t1a), Seq("t1"))
      .join(broadcast(t2a), Seq("t2"))
      .crossJoin(broadcast(n11))
      .select(col("gram"),
        expr("""CAST(round(ln(CAST(4 * c1 * __n11 AS DOUBLE)
               |  / CAST(greatest(4 * c12 - 3, 0) * __n11
               |         + 3 * n1w * ncont AS DOUBLE))
               |  * 1000000) AS BIGINT)""".stripMargin).as("nll_micro"))
    t("nll model")(nll)
    def fin(j: DataFrame) = j
      .groupBy(col("doc_id"))
      .agg(sum(col("n_occ")).as("n_bigrams"),
        sum(col("n_occ") * col("nll_micro")).as("__sum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("__sum").cast("double") /
          (col("n_bigrams") * lit(1000000L)).cast("double")).as("avg_nll_kn"))
    t("full kn broadcast")(fin(dg.join(broadcast(nll), Seq("gram"))))
    t("full kn shufhash")(fin(dg.hint("SHUFFLE_HASH")
      .join(nll, Seq("gram"))))
    t("full kn smj")(fin(dg.hint("MERGE").join(nll, Seq("gram"))))
    spark.stop()
  }
}
