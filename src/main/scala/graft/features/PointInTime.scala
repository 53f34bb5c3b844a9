package graft.features

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Point-in-time feature sampling: the probe-grid side of the as-of
  * machinery. AFEC samples every framed series at 48 fixed frame offsets
  * (`sTimeSeries = {0..43, 64, 128, 256, 512}` —
  * `SampleClassificationDescriptors.cpp:38-44`), falling back to the
  * silence-reference value when the series is shorter
  * (`SampleClassificationDescriptors.cpp:73-102`).
  *
  * Because the per-entity series is materialized as an ordered array in the
  * same row, the 48-point sampling is a **pure projection** (`transform` +
  * `get`) — zero shuffle, zero join. The general inter-table case is
  * [[graft.operators.AsOfJoin]]. Zero temporal leakage: offset `t` reads
  * only `series[t]`, never a later element.
  */
object PointInTime {

  /** The 48 probe offsets (`SampleClassificationDescriptors.cpp:38-44`). */
  val TimeOffsets: Seq[Int] = (0 to 43) ++ Seq(64, 128, 256, 512)

  /** Sample an `array<double>` series column at [[TimeOffsets]], with
    * `default` where the series is shorter (silence-reference semantics).
    * Returns `array<double>` of length 48. */
  def sampleOffsets(xs: String, default: Double = 0.0): Column = expr(
    s"""transform(array(${TimeOffsets.mkString(", ")}),
       |  t -> coalesce(get($xs, t), CAST($default AS DOUBLE)))""".stripMargin)

  /** DuckDB mirror of [[sampleOffsets]] (1-based list indexing; out-of-range
    * list extract yields NULL in DuckDB). */
  def duckSampleOffsets(xs: String, default: Double = 0.0): String =
    s"""list_transform([${TimeOffsets.mkString(", ")}],
       |  t -> coalesce(($xs)[t + 1], CAST($default AS DOUBLE)))""".stripMargin

  /** The stat subset that enters the feature vector
    * (`SampleClassificationDescriptors.cpp:111-141`): min, max, mean,
    * variance, flatness, dmean, dvariance. */
  val VectorStats: Seq[String] =
    Seq("min", "max", "mean", "variance", "flatness", "dmean", "dvariance")
}
