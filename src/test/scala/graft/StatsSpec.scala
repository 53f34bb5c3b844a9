package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Stats

/** Golden tests for the 13-stat kernel — mirrors the reference's
  * TestStatistics.cpp:10-114 (hand-computed expectations, permutation
  * invariance, singleton/empty edge cases). */
class StatsSpec extends AnyFunSuite {

  private val eps = 1e-12

  private def close(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("hand-computed block for a known sequence") {
    // xs = [1, 2, 3, 4]
    val b = Stats.oracle(Seq(1.0, 2.0, 3.0, 4.0))
    assert(b.min == 1.0 && b.max == 4.0)
    assert(b.mean == 2.5)
    // population variance: ((1.5^2)*2 + (0.5^2)*2)/4 = 1.25
    assert(b.variance == 1.25)
    // lower-middle median of [1,2,3,4] -> index (4-1)/2 = 1 -> 2.0
    assert(b.median == 2.0)
    // centroid = (0*1 + 1*2 + 2*3 + 3*4)/10 = 2.0
    assert(b.centroid == 2.0)
    // spread = (4*1 + 1*2 + 0*3 + 1*4)/10 = 1.0
    assert(b.spread == 1.0)
    // gmean = exp(mean(log(|x|+1e-20))) = (1*2*3*4)^(1/4) = 24^0.25
    assert(close(b.gmean, math.pow(24.0, 0.25)))
    assert(close(b.flatness, b.gmean / b.mean))
    // diffs |x[i+1]-x[i]| = [1,1,1] -> dmean 1, dvariance 0
    assert(b.dmean == 1.0 && b.dvariance == 0.0)
    // skewness = sum(((x-2)/1)^3)/4 = (-8 - 1 + 0 + ... wait x vs centroid
    // ((1-2)^3 + (2-2)^3 + (3-2)^3 + (4-2)^3)/4 = (-1+0+1+8)/4 = 2
    assert(b.skewness == 2.0)
    // kurtosis = (1+0+1+16)/4 - 3 = 1.5
    assert(b.kurtosis == 1.5)
  }

  test("permutation invariance of order-independent stats; order-dependence of d-stats") {
    val base = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val perms = Seq(base.reverse, base.sorted, base.sortBy(-_),
      new scala.util.Random(7).shuffle(base))
    val b0 = Stats.oracle(base)
    for (p <- perms) {
      val bp = Stats.oracle(p)
      assert(close(bp.min, b0.min) && close(bp.max, b0.max))
      assert(close(bp.mean, b0.mean) && close(bp.variance, b0.variance))
      assert(close(bp.median, b0.median) && close(bp.gmean, b0.gmean))
      assert(close(bp.flatness, b0.flatness))
      // centroid/spread/skew/kurt are index-weighted -> NOT invariant
    }
    // d-stats are order-dependent: sorted diffs vs original diffs
    assert(Stats.oracle(base.sorted).dmean != b0.dmean)
  }

  test("singleton: only min/max/mean set, rest zero (Statistics.cpp:71-80)") {
    val b = Stats.oracle(Seq(7.5))
    assert(b.min == 7.5 && b.max == 7.5 && b.mean == 7.5)
    assert(b.variance == 0.0 && b.median == 0.0 && b.gmean == 0.0)
    assert(b.centroid == 0.0 && b.spread == 0.0 && b.flatness == 0.0)
    assert(b.dmean == 0.0 && b.dvariance == 0.0)
  }

  test("empty: all zero (Statistics.cpp:81-90)") {
    assert(Stats.oracle(Nil).toSeq.forall(_ == 0.0))
  }

  test("n == 2: dmean/dvariance stay zero (Statistics.cpp:51-70 gate is n > 2)") {
    val b = Stats.oracle(Seq(1.0, 5.0))
    assert(b.dmean == 0.0 && b.dvariance == 0.0)
    assert(b.variance == 4.0) // ((2)^2 + (2)^2)/2
  }

  test("zero-sum series: centroid/spread guarded (Statistics.cpp:465-470)") {
    val b = Stats.oracle(Seq(-1.0, 1.0, -1.0, 1.0))
    assert(b.centroid == 0.0 && b.spread == 0.0)
    assert(b.skewness == 0.0 && b.kurtosis == 0.0) // spread <= eps
  }

  test("engine StatsBlock expression == scalar oracle, bitwise") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val xs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val df = Seq(Tuple1(xs)).toDF("xs")
      .selectExpr("graft_stats_block(xs) AS st")
      .selectExpr(Stats.StatNames.map(n => s"st.$n"): _*)
    val row = df.collect()(0)
    val expected = Stats.oracle(xs).toSeq
    for (i <- expected.indices)
      assert(row.getDouble(i) == expected(i),
        s"stat ${Stats.StatNames(i)}: ${row.getDouble(i)} != ${expected(i)}")
  }
}
