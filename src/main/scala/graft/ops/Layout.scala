package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering and the
  * min/max-pruning report that justifies it — the Iceberg/Delta
  * `OPTIMIZE ZORDER BY` analog, expressed as an explicit operator with a
  * measured benefit. A 100 TB table pruned by per-file min/max statistics
  * only skips files if rows co-locate in EVERY filtered dimension at
  * once; interleaving the key bits gives each dimension locality that a
  * plain sort gives only to its prefix column.
  *
  * == Determinism ==
  * The Morton code is pure integer bit algebra (32 shift/mask terms,
  * identical in both dialects), chunk assignment is rank arithmetic on a
  * total order, and the report is min/max/count over exact integers —
  * bitwise everywhere.
  */
object Layout {

  /** Morton interleave of two `bits`-bit nonnegative ints as a dialect-
    * built SQL expression: x occupies even bit positions, y odd. Inputs
    * are masked to `bits` bits first (defined clamp convention). */
  private def mortonSql(x: String, y: String, bits: Int,
                        spark: Boolean): String = {
    val mask = (1L << bits) - 1
    // every term fully parenthesized: `<<` binds LOOSER than `+` in
    // DuckDB (C precedence), so a bare `a << p + b << q` mis-groups
    def bit(col: String, b: Int, outPos: Int): String =
      if (spark) s"shiftleft(shiftright($col & $mask, $b) & 1, $outPos)"
      else s"(((($col & $mask) >> $b) & 1) << $outPos)"
    val terms =
      (0 until bits).map(b => bit(x, b, 2 * b)) ++
        (0 until bits).map(b => bit(y, b, 2 * b + 1))
    terms.mkString("(", " + ", ")")
  }

  /** Chunked layout report for a 2-d key: rows are ordered either by the
    * Morton code of `(x, y)` (`layout = 'zorder'`) or by the ingestion id
    * (`layout = 'natural'`), cut into fixed-size chunks (the file/row-
    * group stand-in), and each chunk reports its min/max envelope in both
    * dimensions plus whether a given query box can prune it
    * (`overlaps = false` ⇒ a min/max-pruning scan skips the chunk
    * entirely). Comparing the two layouts' `overlaps` counts IS the
    * measured case for rewriting the table.
    *
    * == Scale shape ==
    * The Morton code is a narrow projection. The global rank is ONE
    * total-order window — the exactness cost this repo pays knowingly in
    * [[Binning.quantileBin]] / [[Evaluation.prCurve]]; a production
    * rewrite replaces it with `repartitionByRange(zcol)` +
    * `sortWithinPartitions`, which keeps the identical global order
    * without a single-partition stage and writes chunks per partition.
    * Everything after the rank is a chunk-count-sized aggregation.
    *
    * @param rows      input
    * @param id        unique row id (total tie order)
    * @param x, y      nonnegative integer dimensions
    * @param bits      Morton bits per dimension (≤ 31)
    * @param chunkRows rows per chunk (file/row-group size stand-in)
    * @param qx0, qx1, qy0, qy1  inclusive query box for the prune report
    */
  def zorderReport(rows: DataFrame, id: String, x: String, y: String,
                   bits: Int, chunkRows: Int,
                   qx0: Long, qx1: Long, qy0: Long, qy1: Long): DataFrame = {
    require(bits <= 31 && bits > 0, s"bad morton bits: $bits")
    val base = rows.select(col(id).cast("long").as("k"),
      col(x).cast("long").as("x"), col(y).cast("long").as("y"))
      .withColumn("z", expr(mortonSql("x", "y", bits, spark = true)))
    def chunked(ordered: DataFrame, orderCol: String, name: String) = {
      val w = Window.orderBy(col(orderCol).asc, col("k").asc)
      ordered
        .withColumn("__rn", row_number().over(w))
        .withColumn("chunk",
          expr(s"CAST((__rn - 1) DIV $chunkRows AS BIGINT)"))
        .groupBy(col("chunk"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
        .withColumn("layout", lit(name))
    }
    chunked(base, "z", "zorder")
      .unionByName(chunked(base, "k", "natural"))
      .withColumn("overlaps",
        col("x_min") <= qx1 && col("x_max") >= qx0 &&
          col("y_min") <= qy1 && col("y_max") >= qy0)
      .select(col("layout"), col("chunk"), col("n"),
        col("x_min"), col("x_max"), col("y_min"), col("y_max"),
        col("overlaps"))
  }

  /** DuckDB mirror of [[zorderReport]] over a `(k, x, y)` SELECT. */
  def duckZorderSql(baseSql: String, bits: Int, chunkRows: Int,
                    qx0: Long, qx1: Long, qy0: Long, qy1: Long): String = {
    val z = mortonSql("x", "y", bits, spark = false)
    def chunkSql(orderCol: String, name: String) =
      s"""SELECT '$name' AS layout,
         |  (row_number() OVER (ORDER BY $orderCol, k) - 1) // $chunkRows
         |    AS chunk,
         |  x, y
         |FROM base""".stripMargin
    s"""WITH base AS (
       |  SELECT k, x, y, $z AS z FROM ($baseSql) q0),
       |c AS (${chunkSql("z", "zorder")} UNION ALL ${chunkSql("k", "natural")})
       |SELECT layout, chunk, CAST(count(*) AS BIGINT) AS n,
       |  min(x) AS x_min, max(x) AS x_max,
       |  min(y) AS y_min, max(y) AS y_max,
       |  (min(x) <= $qx1 AND max(x) >= $qx0 AND
       |   min(y) <= $qy1 AND max(y) >= $qy0) AS overlaps
       |FROM c GROUP BY 1, 2""".stripMargin
  }
}
