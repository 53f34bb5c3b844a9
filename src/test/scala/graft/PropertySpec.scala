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

  test("viterbi segmentation kernel == scalar DP reference (random models)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}
    val rnd = new Random(1234)
    for (trial <- 1 to 60) {
      val alpha = 2 + rnd.nextInt(5) // small alphabet forces bigram reuse
      val ts = Array.fill(rnd.nextInt(60))(rnd.nextInt(alpha))
      val uni = (0 until alpha)
        .map(t => t -> (-(1L + rnd.nextInt(3000000)))).toMap
      val biPairs = (for (a <- 0 until alpha; b <- 0 until alpha
                          if rnd.nextBoolean()) yield (a, b)).toSeq
      val bi = biPairs.map(p => p -> (-(1L + rnd.nextInt(3000000)))).toMap
      // scalar reference (bigram wins ties, forward and backward)
      val n = ts.length
      val dp = new Array[Long](n + 1)
      for (i <- 1 to n) {
        val u = dp(i - 1) + uni(ts(i - 1))
        val b = if (i >= 2) bi.get((ts(i - 2), ts(i - 1))).map(dp(i - 2) + _)
                else None
        dp(i) = b match { case Some(bv) if bv >= u => bv; case _ => u }
      }
      var i = n
      val pieces = scala.collection.mutable.ListBuffer[(Int, Long)]()
      while (i > 0) {
        val b = if (i >= 2) bi.get((ts(i - 2), ts(i - 1))) else None
        b match {
          case Some(sv) if dp(i) == dp(i - 2) + sv =>
            pieces.prepend((i - 2,
              (ts(i - 2) + 2048L) * 4096L + (ts(i - 1) + 2048L)))
            i -= 2
          case _ =>
            pieces.prepend((i - 1, ts(i - 1) + 2048L)); i -= 1
        }
      }
      val refCodes = pieces.map(_._2).toList
      val refChecksum = pieces.map { case (st, c) => (st + 1L) * c }.sum
      val refNBi = pieces.count(_._2 >= 4096).toLong
      // kernel
      val ut = uni.keys.toArray.sorted
      val bp = bi.keys.toArray.map { case (a, b) =>
        (a + 2048L) * 4096L + (b + 2048L) }.sorted
      val biByCode = bi.map { case ((a, b), v) =>
        ((a + 2048L) * 4096L + (b + 2048L)) -> v }
      val out = graft.functions.expressions.ViterbiSeg(
        Literal.create(ts.toSeq, ArrayType(IntegerType)),
        Literal.create(ut.map(_ + 2048L).toSeq, ArrayType(LongType)),
        Literal.create(ut.map(t => uni(t)).toSeq, ArrayType(LongType)),
        Literal.create(bp.toSeq, ArrayType(LongType)),
        Literal.create(bp.map(biByCode).toSeq, ArrayType(LongType)))
        .eval(null).asInstanceOf[ArrayData].toLongArray()
      assert(out(0) == pieces.length.toLong, s"trial $trial n_pieces")
      assert(out(1) == refNBi, s"trial $trial n_bi")
      assert(out(2) == dp(n), s"trial $trial ll")
      assert(out(3) == refChecksum, s"trial $trial checksum")
      assert(out.drop(4).toList == refCodes, s"trial $trial codes")
    }
  }

  test("dot / l2 kernels == scalar folds (random arrays)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val rnd = new Random(777)
    for (_ <- 1 to 100) {
      val n = 1 + rnd.nextInt(80)
      val a = Array.fill(n)(rnd.nextDouble() * 4 - 2)
      val b = Array.fill(n)(rnd.nextDouble() * 4 - 2)
      def lit(x: Array[Double]) =
        Literal.create(x.toSeq, ArrayType(DoubleType))
      val dot = graft.functions.expressions.DotProd(lit(a), lit(b))
        .eval(null).asInstanceOf[Double]
      val l2 = graft.functions.expressions.L2Sq(lit(a), lit(b))
        .eval(null).asInstanceOf[Double]
      var sd = 0.0; var sl = 0.0; var i = 0
      while (i < n) {
        sd += a(i) * b(i); val d = a(i) - b(i); sl += d * d; i += 1
      }
      assert(dot == sd) // identical fold order -> bitwise
      assert(l2 == sl)
    }
  }
}
