package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise Pearson correlation matrix over INTEGER feature columns —
  * the collinearity screen a feature-engineering pipeline runs before
  * model fitting (drop one of every near-duplicate pair).
  *
  * == Exactness ==
  * All moment sums (`Σx_i`, `Σx_i·x_j`, n) are exact int64 — order-free,
  * partition-invariant — and each correlation is assembled from them at
  * the very end: `(n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))`,
  * three IEEE ops (two casts feed one divide·sqrt·multiply chain) with
  * the identical expression shape in DuckDB → bitwise. Constant features
  * (zero variance) yield NULL. Magnitude bound: `n·Σxy ≤ n²·max|x·y|` —
  * int64-safe through ~10^6 rows of 16-bit-scale features at the gate;
  * at 10^12 rows pre-aggregate per shard and combine the moment sums (they
  * are mergeable by construction), or widen to DECIMAL(38).
  *
  * == Scale shape ==
  * ONE global aggregation with map-side partials (no shuffle beyond the
  * final 1-row combine) computes every moment in a single pass over the
  * scan — F(F+3)/2 running sums, F = |features|. The pair rows are then
  * exploded from the single moments row: report size is F², independent
  * of corpus size. */
object FeatureStats {

  /** Correlation rows `(f1, f2, n, corr)` for every pair f1 < f2 of
    * `feats` (column names of integer-valued columns in `df`). */
  def corrMatrix(df: DataFrame, feats: Seq[String]): DataFrame = {
    require(feats.size >= 2, s"need >= 2 features: $feats")
    val base = df.select(feats.map(f => col(f).cast("long").as(f)): _*)
    val moments =
      Seq(count(lit(1)).as("n")) ++
        feats.map(f => sum(col(f)).as(s"s_$f")) ++
        (for (i <- feats.indices; j <- i until feats.size)
          yield sum(col(feats(i)) * col(feats(j)))
            .as(s"q_${feats(i)}_${feats(j)}"))
    val m = base.agg(moments.head, moments.tail: _*)
    val pairExprs = for {
      i <- feats.indices; j <- (i + 1) until feats.size
      a = feats(i); b = feats(j)
    } yield struct(
      lit(a).as("f1"), lit(b).as("f2"),
      expr(s"""CASE WHEN (n * q_${a}_${a} - s_$a * s_$a) > 0
              |      AND (n * q_${b}_${b} - s_$b * s_$b) > 0 THEN
              |  CAST(n * q_${a}_${b} - s_$a * s_$b AS DOUBLE)
              |  / sqrt(CAST(n * q_${a}_${a} - s_$a * s_$a AS DOUBLE)
              |         * CAST(n * q_${b}_${b} - s_$b * s_$b AS DOUBLE))
              |END""".stripMargin).as("corr"))
    m.select(col("n"), explode(array(pairExprs: _*)).as("p"))
      .select(col("p.f1").as("f1"), col("p.f2").as("f2"), col("n"),
        col("p.corr").as("corr"))
  }

  /** DuckDB mirror of [[corrMatrix]] over `baseSql` — a SELECT yielding
    * the integer feature columns named in `feats`. */
  def duckCorrSql(baseSql: String, feats: Seq[String]): String = {
    val sums =
      Seq("CAST(count(*) AS BIGINT) AS n") ++
        feats.map(f => s"CAST(sum($f) AS BIGINT) AS s_$f") ++
        (for (i <- feats.indices; j <- i until feats.size)
          yield s"CAST(sum(${feats(i)} * ${feats(j)}) AS BIGINT)" +
            s" AS q_${feats(i)}_${feats(j)}")
    val pairs = for {
      i <- feats.indices; j <- (i + 1) until feats.size
      a = feats(i); b = feats(j)
    } yield
      s"""SELECT '$a' AS f1, '$b' AS f2, n,
         |  CASE WHEN (n * q_${a}_${a} - s_$a * s_$a) > 0
         |        AND (n * q_${b}_${b} - s_$b * s_$b) > 0 THEN
         |    CAST(n * q_${a}_${b} - s_$a * s_$b AS DOUBLE)
         |    / sqrt(CAST(n * q_${a}_${a} - s_$a * s_$a AS DOUBLE)
         |           * CAST(n * q_${b}_${b} - s_$b * s_$b AS DOUBLE))
         |  END AS corr
         |FROM m""".stripMargin
    s"""WITH base AS ($baseSql),
       |m AS (SELECT ${sums.mkString(",\n    ")} FROM base)
       |${pairs.mkString("\nUNION ALL\n")}""".stripMargin
  }
}
