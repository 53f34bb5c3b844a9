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
  * Determinism: inputs must be quantized to the 1e-6 grid BEFORE the walk —
  * a 1-ulp cross-engine feature difference at a split threshold would flip
  * a branch; with quantized features and exact-decimal thresholds the walk
  * and the leaf sums are bitwise. Quantization uses [[quant6Sql]], NOT the
  * engines' `round(x, 6)`: Spark rounds via BigDecimal HALF_UP on the
  * shortest decimal repr while DuckDB multiplies and `std::round`s — the two
  * can pick different 1e-6 multiples near `.5e-6` boundaries (round-3
  * ADVICE). `floor(x·1e6 + 0.5) / 1e6` is pure double arithmetic with
  * bit-identical results in both engines by construction (`floor` is exact
  * on doubles; the multiply/add/divide are the same IEEE ops).
  * Softmax (exp) rounds at the boundary. */
object TreeEnsemble {

  /** Dialect-shared 1e-6 quantizer — see the determinism note above.
    * Renders identically in Spark SQL (floor → BIGINT, exact ÷ 1e6) and
    * DuckDB (floor → DOUBLE): both yield the same double for |x| < 2^53/1e6.
    */
  def quant6Sql(x: String): String = s"floor(($x) * 1e6 + 0.5) / 1e6"

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

  // ------------------------------------------------------------------
  // Large-ensemble path: flattened node table + native walk
  // ------------------------------------------------------------------

  /** One class's trees flattened to heap-order arrays (complete depth-`d`
    * trees): internal node `i` of tree `t` at `feat/thr[t·nInt + i]`
    * (`nInt = 2^d − 1`), leaves at `leaf[t·nLeaf + (i − nInt)]`. The
    * layout [[graft.functions.expressions.TreeWalk]] walks. */
  final case class FlatClass(feat: Array[Int], thr: Array[Double],
      leaf: Array[Double])

  /** Flatten a [[Model]] of COMPLETE depth-`depth` trees (as
    * [[synthModel]] builds) into per-class node tables. */
  def flatten(model: Model, depth: Int): Seq[FlatClass] = {
    val nInt = (1 << depth) - 1
    val nLeaf = 1 << depth
    model.trees.map { trees =>
      val feat = new Array[Int](trees.length * nInt)
      val thr = new Array[Double](trees.length * nInt)
      val leaf = new Array[Double](trees.length * nLeaf)
      for ((tree, t) <- trees.zipWithIndex) {
        def fill(node: Tree, idx: Int): Unit = node match {
          case Split(f, v, l, r) =>
            require(idx < nInt, s"split below depth $depth at heap idx $idx")
            feat(t * nInt + idx) = f
            thr(t * nInt + idx) = v
            fill(l, 2 * idx + 1)
            fill(r, 2 * idx + 2)
          case Leaf(v) =>
            require(idx >= nInt, s"leaf above depth $depth at heap idx $idx")
            leaf(t * nLeaf + (idx - nInt)) = v
        }
        fill(tree, 0)
      }
      FlatClass(feat, thr, leaf)
    }
  }

  /** Append `score_<class>` (native node-table walk — O(1) plan build in
    * tree count) and `pred_class` columns. `fvCol` must be an
    * ARRAY<DOUBLE> of already-quantized features ([[quant6Sql]]). */
  def scoreLarge(df: DataFrame, fvCol: Column, model: Model,
                 depth: Int): DataFrame = {
    graft.functions.expressions.register(df.sparkSession)
    val flat = flatten(model, depth)
    var out = df
    for ((c, i) <- model.classes.zipWithIndex)
      out = out.withColumn(s"score_$c",
        call_function("graft_tree_walk", fvCol,
          typedlit(flat(i).feat), typedlit(flat(i).thr),
          typedlit(flat(i).leaf), lit(depth)))
    val scores = model.classes.map(c => col(s"score_$c"))
    out = out.withColumn("__mx", scores.reduce((a, b) => greatest(a, b)))
    val pred = model.classes.zipWithIndex.foldRight(
      lit(model.classes.last): Column) { case ((c, _), acc) =>
      when(col(s"score_$c") === col("__mx"), lit(c)).otherwise(acc)
    }
    out.withColumn("pred_class", pred).drop("__mx")
  }

  /** DuckDB mirror of one class's [[scoreLarge]] walk. `f/t/l` name the
    * class's literal model lists (bound ONCE in a `model` CTE — inlining
    * them per reference would repeat each ~2 000-literal list thousands of
    * times); `fv` the quantized DOUBLE feature list. The per-tree walk is
    * a `list_reduce` fold of the heap index over `depth` steps — the same
    * left-to-right semantics as the kernel, and tree scores sum in
    * ascending-`t` order. */
  def duckWalkSql(f: String, t: String, l: String, fv: String,
                  nTrees: Int, depth: Int): String = {
    val nInt = (1 << depth) - 1
    val nLeaf = 1 << depth
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range($nTrees), tt ->
       |    $l[tt * $nLeaf + (
       |      list_reduce(list_prepend(CAST(0 AS BIGINT), range($depth)),
       |        (idx, st) -> CASE WHEN $fv[$f[tt * $nInt + idx + 1] + 1]
       |                               < $t[tt * $nInt + idx + 1]
       |                     THEN 2 * idx + 1 ELSE 2 * idx + 2 END))
       |      - $nInt + 1])),
       |  (a, b) -> a + b)""".stripMargin
  }

  /** Render one [[FlatClass]] as three DuckDB list literals
    * (ints; [[graft.queries.Duck.lit]]-exact doubles). */
  def duckFlatLits(fc: FlatClass): (String, String, String) = (
    fc.feat.mkString("[", ", ", "]"),
    fc.thr.map(graft.queries.Duck.lit).mkString("[", ", ", "]"),
    fc.leaf.map(graft.queries.Duck.lit).mkString("[", ", ", "]"))
}
