package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sub-plan cost attribution for the PQ / IVF-PQ family (dev tool). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.register(spark)
    import graft.queries.CurationQueries._
    def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def t(name: String)(df: => DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pqprobe] $name: min ${times.min}%.2f  " +
        times.map(x => f"$x%.2f").mkString(" "))
    }
    t("pq_train (codebook, 2 lloyd)")(graft.ops.Similarity.pqTrainTable(
      emb, PqM, PqDsub, PqKsub, PqIters))
    t("pq_codes (train + assign)")(graft.ops.Similarity.pqCodes(
      emb, PqM, PqDsub, PqKsub, PqIters))
    t("bruteTopK")(graft.ops.Similarity.bruteTopK(emb, TopKQueries, TopK))
    t("pq_recall full")(graft.ops.Similarity.pqAdcRecall(
      emb, TopKQueries, TopK, PqM, PqDsub, PqKsub, PqIters))
    t("ivfpq_recall full")(graft.ops.Similarity.ivfPqRecall(
      emb, TopKQueries, TopK, IvfCells, IvfProbe, PqM, PqDsub, PqKsub,
      PqIters))
    spark.stop()
  }
}
