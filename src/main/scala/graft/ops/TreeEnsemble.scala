package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Additive tree-ensemble (GBDT-style) inference — the analog of the
  * reference's LightGBM scorer (`Source/Crawler/Classification/Source/
  * Models/GBDT.cpp:50-117`, multiclass additive trees + softmax; the
  * shipped model blob is LFS-missing upstream, so models here are supplied
  * as data).
  *
  * == Spark-first design ==
  * A model is COMPILED TO CATALYST EXPRESSIONS: each tree becomes a nested
  * `CASE WHEN fv[i] < thr`, a class score is the sum of its trees, and the
  * whole scorer is a codegen'd projection — no UDF, no per-row
  * interpretation, and the identical SQL renders in DuckDB for the oracle.
  * This is the right shape for small ensembles (tens of trees — plan
  * analysis+codegen is the fixed cost, ~17 s for 16 depth-3 trees):
  * the model rides the plan, Tungsten fuses it with the feature projection,
  * and executors never deserialize a model object. (Giant ensembles would
  * instead broadcast a node table and walk it in a native kernel.)
  *
  * Determinism: inputs must be quantized (round 1e-6) BEFORE the walk —
  * a 1-ulp cross-engine feature difference at a split threshold would flip
  * a branch; with quantized features and exact-decimal thresholds the walk
  * and the leaf sums are bitwise. Softmax (exp) rounds at the boundary.
  */
object TreeEnsemble {

  sealed trait Tree
  final case class Leaf(v: Double) extends Tree
  final case class Split(feature: Int, thr: Double, left: Tree, right: Tree)
      extends Tree

  /** Model: per class, the list of additive trees. */
  final case class Model(classes: Seq[String], trees: Seq[Seq[Tree]])

  /** Deterministic synthetic model (no external blobs): depth-`depth`
    * complete trees; features/thresholds/leaves from a seeded integer
    * recurrence, thresholds on an exact 1/64 grid (exactly representable —
    * no parse ambiguity), leaf values on 1/128. */
  def synthModel(classes: Seq[String], treesPerClass: Int, nFeatures: Int,
                 depth: Int, seed: Long = 7L): Model = {
    var s = seed
    def next(m: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % m + m) % m).toInt
    }
    def build(d: Int): Tree =
      if (d == 0) Leaf((next(256) - 128) / 128.0)
      else Split(next(nFeatures), (next(128) - 64) / 64.0,
        build(d - 1), build(d - 1))
    Model(classes,
      classes.map(_ => Seq.fill(treesPerClass)(build(depth))))
  }

  /** Render one tree as a (dialect-shared) nested CASE; `feat(i)` renders
    * the i-th (already quantized) feature accessor. Using scalar accessors
    * — not `element_at(array(...))` — matters on the Spark side: an
    * ElementAt over a CreateArray is NOT simplified by
    * SimplifyExtractValueOps, so each of the ~200 split references would
    * re-materialize the feature array (measured 67 ms/doc vs ~1 ms with
    * scalar refs). */
  private def treeSql(t: Tree, feat: Int => String): String = t match {
    case Leaf(v) => s"CAST(${graft.queries.Duck.lit(v)} AS DOUBLE)"
    case Split(f, thr, l, r) =>
      s"CASE WHEN ${feat(f)} < CAST(${graft.queries.Duck.lit(thr)} AS DOUBLE) " +
        s"THEN ${treeSql(l, feat)} ELSE ${treeSql(r, feat)} END"
  }

  /** Per-class raw score: left-to-right sum of the class's trees. */
  def scoreSql(model: Model, cls: Int, feat: Int => String): String =
    model.trees(cls).map(t => s"(${treeSql(t, feat)})").mkString(" + ")

  /** Append `score_<class>` (exact), `prob_<class>` (softmax, rounded 1e-6
    * at the boundary) and `pred_class` (argmax, first-wins ties) columns.
    * `featCols(i)` names the i-th quantized feature column. */
  def score(df: DataFrame, featCols: Seq[String], model: Model): DataFrame = {
    val n = model.classes.length
    var out = df
    for (c <- 0 until n)
      out = out.withColumn(s"score_${model.classes(c)}",
        expr(scoreSql(model, c, featCols(_))))
    val scores = model.classes.map(c => col(s"score_$c"))
    val mx = scores.reduce((a, b) => greatest(a, b))
    out = out.withColumn("__mx", mx)
    val exps = model.classes.map(c => exp(col(s"score_$c") - col("__mx")))
    out = out.withColumn("__z", exps.reduce(_ + _))
    for (c <- model.classes)
      out = out.withColumn(s"prob_$c",
        round(exp(col(s"score_$c") - col("__mx")) / col("__z"), 6))
    // argmax, first class wins ties (reference: first max index)
    val pred = model.classes.zipWithIndex.foldRight(
      lit(model.classes.last): Column) { case ((c, _), acc) =>
      when(col(s"score_$c") === col("__mx"), lit(c)).otherwise(acc)
    }
    out.withColumn("pred_class", pred).drop("__mx", "__z")
  }

  /** DuckDB mirror of [[score]]'s column block (same expression shapes;
    * feature accessor = 1-based list extract over `fv`). */
  def duckScoreSql(model: Model, fv: String): Seq[String] =
    model.classes.indices.map(c =>
      s"(${scoreSql(model, c, i => s"$fv[${i + 1}]")}) AS score_${model.classes(c)}")
}
