package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.functions.Stats

/** Randomized property tests (FIXTURES.md §3.4): temporal-leakage and
  * stats-kernel invariants over generated inputs (seeded — deterministic).
  * Pure-Scala oracle level; Spark-side bitwise agreement with the oracle is
  * covered by StatsSpec/PipelineSpec. */
class PropertySpec extends AnyFunSuite {

  private val Trials = 200

  private def tokenSeq(rnd: Random): List[Int] =
    List.fill(rnd.nextInt(400))(rnd.nextInt(4097) - 2048)

  private def frameRms(xs: Seq[Int], f: Int = 64, h: Int = 32): Seq[Double] = {
    val n = xs.length
    val nf = if (n >= f) (n - f) / h + 1 else 1
    (0 until nf).map { i =>
      val sl = xs.slice(i * h, math.min(i * h + f, n))
      if (sl.isEmpty) 0.0
      else math.sqrt(sl.map(x => x.toLong * x).sum.toDouble / sl.length)
    }
  }

  private def close(x: Double, y: Double) =
    (x.isNaN && y.isNaN) ||
      math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))

  test("kmin buffer: random inserts + merges == sorted.take(k)") {
    val rnd = new Random(99)
    for (_ <- 1 to Trials) {
      val k = 1 + rnd.nextInt(40)
      val parts = List.fill(1 + rnd.nextInt(5))(
        List.fill(rnd.nextInt(200))(rnd.nextLong()))
      val merged = parts.map { p =>
        val b = new graft.functions.expressions.KMinBuffer(k)
        p.foreach(b.insert); b
      }.reduce { (a, b) =>
        var i = 0
        while (i < b.size) { a.insert(b.heap(i)); i += 1 }
        a
      }
      assert(merged.sortedAsc.toList == parts.flatten.sorted.take(k),
        s"k=$k sizes=${parts.map(_.length)}")
    }
  }

  test("leakage: appending tokens never changes completed frames") {
    val rnd = new Random(4242)
    for (_ <- 1 to Trials) {
      val base = tokenSeq(rnd)
      val suffix = tokenSeq(rnd)
      if (base.length >= 64) {
        val before = frameRms(base)
        val after = frameRms(base ++ suffix)
        val stable = before.indices.filter(i => i * 32 + 64 <= base.length)
        assert(stable.forall(i => before(i) == after(i)),
          s"leak at n=${base.length}")
      }
    }
  }

  test("stats: permutation invariance of order-free stats (random data)") {
    val rnd = new Random(77)
    for (_ <- 1 to Trials) {
      val xs = List.fill(1 + rnd.nextInt(60))(rnd.nextDouble() * 2e6 - 1e6)
      val shuffled = rnd.shuffle(xs)
      val a = Stats.oracle(xs)
      val b = Stats.oracle(shuffled)
      assert(close(a.min, b.min) && close(a.max, b.max))
      assert(close(a.mean, b.mean) && close(a.variance, b.variance))
      assert(close(a.median, b.median))
      assert(close(a.gmean, b.gmean) && close(a.flatness, b.flatness))
    }
  }

  test("stats: variance non-negative; min <= median/mean <= max for n >= 2") {
    val rnd = new Random(99)
    for (_ <- 1 to Trials) {
      val xs = List.fill(rnd.nextInt(40))(rnd.nextDouble() * 2e6 - 1e6)
      val b = Stats.oracle(xs)
      assert(b.variance >= 0.0)
      if (xs.length >= 2) {
        assert(b.min <= b.median && b.median <= b.max)
        assert(b.min <= b.mean && b.mean <= b.max)
      }
    }
  }

  test("refractory invariant: kept events are >= gap apart and greedy-first") {
    val gap = 7
    val rnd = new Random(123)
    for (_ <- 1 to Trials) {
      val sorted = List.fill(rnd.nextInt(80))(rnd.nextInt(500)).distinct.sorted
      // scalar reimplementation of Windows.refractoryExpr semantics
      val kept = sorted.foldLeft(List.empty[Int]) { (acc, x) =>
        if (acc.isEmpty || x - acc.head >= gap) x :: acc else acc
      }.reverse
      kept.sliding(2).foreach {
        case List(a, b) => assert(b - a >= gap)
        case _ =>
      }
      if (sorted.nonEmpty) assert(kept.head == sorted.head)
    }
  }
}
