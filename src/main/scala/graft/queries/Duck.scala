package graft.queries

/** DuckDB SQL rendering helpers. */
object Duck {

  /** Render a double so DuckDB parses it *as a DOUBLE*, bitwise round-trip.
    * A bare decimal literal ("-0.03392475494636198") is parsed as DECIMAL
    * first and only then cast to DOUBLE — off by 1 ulp from the correctly
    * rounded value. Exponent-form literals parse directly as DOUBLE, so we
    * force an exponent (`e0`) when Java's shortest round-trip repr lacks
    * one. */
  def lit(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  def litArray(a: Array[Double]): String =
    a.map(lit).mkString("[", ", ", "]")

  def litMatrix(m: Array[Array[Double]]): String =
    m.map(litArray).mkString("[", ", ", "]")
}
