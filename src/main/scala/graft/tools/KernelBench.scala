package graft.tools

/** Dev micro-bench for the fused fv kernel (no Spark). */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = 8192
    val toks = Array.tabulate(n)(i =>
      (((7L * 1103515245L + i.toLong * i * 747796405L + i * 12345L + 12345L)
        % 2048L - 1024L).toInt * (if ((i / 128) % 8 == 0) 2 else 1)))
    // warm
    var k = 0
    while (k < 20) { graft.functions.fvkernel.compute(toks, n); k += 1 }
    val reps = 5000
    val t0 = System.nanoTime()
    k = 0
    while (k < reps) { graft.functions.fvkernel.compute(toks, n); k += 1 }
    val ms = (System.nanoTime() - t0) / 1e6 / reps
    println(f"fvkernel.compute: $ms%.2f ms/doc")

    // section candidates
    def t(name: String, repsN: Int)(f: => Unit): Unit = {
      var i = 0
      while (i < 5) { f; i += 1 } // warm
      val s = System.nanoTime()
      i = 0
      while (i < repsN) { f; i += 1 }
      println(f"$name: ${(System.nanoTime() - s) / 1e6 / repsN}%.3f ms/call x calls-per-doc")
    }
    val series7 = Array.tabulate(7)(_ * 0.37 + 0.1)
    t("stats.oracle(7) x92", 10000)(graft.functions.Stats.oracle(series7.toIndexedSeq))
    t("round6 x1200", 100000)(graft.functions.fvkernel.round6(0.12345678901234))
    val blocks = Array.tabulate(256)(i => (i * 37 % 100).toDouble)
    t("bandRows(1 doc)", 1000)(graft.functions.spectral.bandRows(blocks, 7, 64, 32))
  }
}
