package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object UniProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.register(spark)
    def seqs = graft.sources.Seqs.fromDocumentsPrefix(spark, dir, 64)
    def tw = seqs.select(expr("slice(tokens, 1, 64)").as("wtoks"))
    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9 }
      println(f"$name: " + ts.map(x => f"$x%.2f").mkString(" "))
    }
    time("u1 collect") {
      tw.select(explode(expr("graft_pack_ngrams(wtoks, 1)")).as("code"))
        .groupBy(col("code")).agg(count(lit(1)).as("c")).collect() }
    time("b2 top collect") {
      tw.select(explode(expr("graft_pack_ngrams(wtoks, 2)")).as("code"))
        .groupBy(col("code")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("code").asc).limit(50).collect() }
    time("segment noop") {
      graft.ops.Tokenizer.unigramSegment(seqs, 64, 50)
        .write.mode("overwrite").format("noop").save() }
    time("train noop") {
      graft.ops.Tokenizer.unigramTrain(seqs, 64, 50, 50)
        .write.mode("overwrite").format("noop").save() }
    spark.stop()
  }
}
