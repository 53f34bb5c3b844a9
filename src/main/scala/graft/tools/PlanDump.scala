package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `explain("formatted")` for named SparkEntry queries into
  * per-query files — the before/after plan evidence of an optimization
  * round (plans/rNN/<query>_<suffix>.txt).
  * Usage: PlanDump <sfDir> <outDir> <suffix> <query> [query ...] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3)
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
