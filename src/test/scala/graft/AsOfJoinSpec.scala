package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join semantics: at-or-before match, tie goes to the series row,
  * missing history falls back to the default (silence-reference semantics,
  * SampleClassificationDescriptors.cpp:73-102). */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val series = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 5L, 9.0)
  ).toDF("k", "ts", "v")

  private lazy val probes = Seq(
    ("a", 9L), ("a", 10L), ("a", 25L), ("a", 99L),
    ("b", 4L), ("b", 5L)
  ).toDF("k", "t")

  test("at-or-before with default") {
    val out = AsOfJoin.asOf(probes, series, "k", "t", "ts", Seq("v"),
      defaults = Map("v" -> lit(-1.0)))
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("a", 9L, -1.0),   // before first -> default
      ("a", 10L, 1.0),   // tie -> inclusive
      ("a", 25L, 2.0),   // between
      ("a", 99L, 3.0),   // after last -> last (as-of, not default)
      ("b", 4L, -1.0),
      ("b", 5L, 9.0)))
  }

  test("no default -> null before first") {
    val out = AsOfJoin.asOf(probes, series, "k", "t", "ts", Seq("v"))
      .filter(col("t") === 9L).collect()
    assert(out.length == 1 && out(0).isNullAt(2))
  }

  test("probe columns preserved; zero row multiplication") {
    val p2 = probes.withColumn("tag", concat(col("k"), lit("#"), col("t")))
    val out = AsOfJoin.asOf(p2, series, "k", "t", "ts", Seq("v"))
    assert(out.count() == probes.count())
    assert(out.columns.toSet == Set("k", "t", "tag", "v"))
  }
}
