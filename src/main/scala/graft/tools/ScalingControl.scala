package graft.tools

import java.util.concurrent.{CountDownLatch, CyclicBarrier}
import java.util.concurrent.atomic.LongAdder

/** Dev probe: hardware-level 8→32-thread scaling controls (no Spark).
  *
  * The per-round scaling evidence (scripts/bench_scaling.sh) repeatedly
  * measures ~0.75 8→32-core efficiency for the headline pipeline on quiet
  * windows; BENCH.md attributes the gap to the single-socket memory wall.
  * This probe closes the argument with controls: if a PURE-COMPUTE loop
  * scales ~1.0 while an ALLOCATION/FILL loop (the pipeline's dominant
  * memory behavior — fresh ~32 KB arrays per row) scales like the
  * pipeline, the ceiling is the box, not the engine.
  *
  * Four workloads, each run at 8 and 32 threads for a fixed wall window:
  *   - `alu`     — xorshift arithmetic only, zero memory traffic
  *   - `alloc`   — fresh 8192-int array per op: TLAB alloc + JVM zeroing +
  *                 fill + sum (mimics token-array materialization)
  *   - `reuse`   — same fill + sum over a thread-local reused array
  *                 (no allocator / zeroing traffic; cache-resident)
  *   - `kernel`  — the real fused features kernel over a shared read-only
  *                 token array (compute-heavy, one array read per op)
  *
  * Run: java ... -cp ... graft.tools.ScalingControl [secondsPerCell]
  */
object ScalingControl {

  private val N = 8192

  private def sharedToks: Array[Int] = Array.tabulate(N)(i =>
    (((7L * 1103515245L + i.toLong * i * 747796405L + i * 12345L + 12345L)
      % 2048L - 1024L).toInt * (if ((i / 128) % 8 == 0) 2 else 1)))

  /** One op of each workload; returns a value to defeat DCE. */
  private def aluOp(seed0: Long): Long = {
    var x = seed0 | 1L
    var i = 0
    // ~N iterations of pure register arithmetic — comparable op count to
    // one array fill, zero loads/stores
    while (i < N) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    x
  }

  private def fill(a: Array[Int], seed0: Int): Long = {
    var i = 0
    var x = seed0
    while (i < N) { a(i) = x * 3 + i; x += 1; i += 1 }
    var s = 0L
    i = 0
    while (i < N) { s += a(i); i += 1 }
    s
  }

  private def runCell(threads: Int, secs: Double, op: Int => Long): Double = {
    val ops = new LongAdder
    val start = new CyclicBarrier(threads + 1)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val done = new CountDownLatch(threads)
    for (t <- 0 until threads) {
      new Thread(() => {
        start.await()
        var k = 0L
        var sink = 0L
        while (!stop.get()) { sink += op(t); k += 1 }
        if (sink == 42) println("") // defeat DCE
        ops.add(k)
        done.countDown()
      }).start()
    }
    start.await()
    val t0 = System.nanoTime()
    Thread.sleep((secs * 1000).toLong)
    stop.set(true)
    done.await()
    val wall = (System.nanoTime() - t0) / 1e9
    ops.sum() / wall
  }

  def main(args: Array[String]): Unit = {
    val secs = args.headOption.map(_.toDouble).getOrElse(3.0)
    val toks = sharedToks
    val reused = new ThreadLocal[Array[Int]] {
      override def initialValue(): Array[Int] = new Array[Int](N)
    }
    val workloads: Seq[(String, Int => Long)] = Seq(
      "alu" -> (t => aluOp(t + 7L)),
      "alloc" -> (t => fill(new Array[Int](N), t)),
      "reuse" -> (t => fill(reused.get(), t)),
      "kernel" -> (t => {
        val r = graft.functions.fvkernel.compute(toks, N)
        java.lang.Double.doubleToLongBits(r(0)) + t
      }))
    def steal(): Long =
      try scala.io.Source.fromFile("/proc/stat").getLines()
        .next().trim.split("\\s+").drop(1)(7).toLong
      catch { case _: Throwable => 0L }
    println(f"${"workload"}%-8s ${"8thr ops/s"}%12s ${"32thr ops/s"}%12s  eff   steal8%% steal32%%")
    for ((name, op) <- workloads) {
      // warm JIT at full parallelism so neither measured cell pays
      // compilation (a 1-thread warm leaves the 32-thread cell faster
      // per-op than the 8-thread one measured before it)
      runCell(32, 2.0, op)
      val s0 = steal()
      val r8 = runCell(8, secs, op)
      val s1 = steal()
      val r32 = runCell(32, secs, op)
      val s2 = steal()
      val eff = (r32 / r8) / 4.0
      // steal jiffies are system-wide: normalize by the BOX's CPU count
      // (share of total machine CPU stolen during the cell), not the
      // cell's thread count
      val boxCpus = Runtime.getRuntime.availableProcessors
      def pct(d: Long) = 100.0 * (d / 100.0) / (secs * boxCpus)
      println(f"$name%-8s $r8%12.0f $r32%12.0f  $eff%.3f  ${pct(s1 - s0)}%5.1f  ${pct(s2 - s1)}%5.1f")
    }
  }
}
