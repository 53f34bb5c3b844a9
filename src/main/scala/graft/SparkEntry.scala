package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Framing
import graft.features.Pipeline
import graft.functions.Stats
import graft.sources.Seqs

/** Driver contract — one entry per implemented operator (SURVEY.md §2), each
  * with a DuckDB-runnable oracle over the same parquet tables.
  *
  * Conventions:
  *  - every computed column is aliased identically in the Spark query and the
  *    oracle SQL (the driver sorts columns by name before hashing);
  *  - floating-point columns are produced by *order-deterministic* plans
  *    (integer-exact sums, or sequential folds over ordered arrays) so Spark
  *    and DuckDB agree bitwise — no rounding fudge;
  *  - oracle table names reference the registered parquet views
  *    (`documents`, `lineitem`, …).
  */
object SparkEntry {

  /** Flagship query on sf=0.001: the full low-level feature pipeline. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.featuresLlFromDir(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------------------
  // shared pieces
  // ------------------------------------------------------------------

  private def seqs(s: SparkSession, dir: String): DataFrame =
    Seqs.fromDocuments(s, dir)

  private def ll(s: SparkSession, dir: String): DataFrame =
    Pipeline.featuresLl(seqs(s, dir))

  /** DuckDB prelude: seqs + frame CTEs (no leading WITH). */
  private val duckSeqs = s"seqs AS (${Seqs.duckSql})"
  private val duckFrames = s"$duckSeqs,\n${Framing.duckFrameCtes()}"

  /** Deterministic synthetic GBDT-style model (4 classes × 4 depth-3
    * trees over the 13 quantized rms statistics) — the ensemble-inference
    * surface (`GBDT.cpp:50-117` analog; the reference's trained blob is
    * LFS-missing upstream, so the model is data here). */
  private lazy val gbdtModel = graft.ops.TreeEnsemble.synthModel(
    Seq("oneshot", "loop", "noise", "tonal"),
    treesPerClass = 4, nFeatures = Stats.StatNames.length, depth = 3)

  /** 500-tree synthetic ensemble (4 classes × 125 depth-4 trees) for the
    * LARGE-ensemble inference path — the scale the reference trains at
    * (800 iters × 5 bags, `GBDT.cpp:50-117`) is out of reach for the
    * compiled-CASE scorer (~17 s plan build at 16 trees, measured round
    * 3); the node-table walk builds its plan in O(1) regardless. */
  private lazy val gbdtLargeDepth = 4
  private lazy val gbdtLargeModel = graft.ops.TreeEnsemble.synthModel(
    Seq("oneshot", "loop", "noise", "tonal"),
    treesPerClass = 125, nFeatures = Stats.StatNames.length,
    depth = gbdtLargeDepth, seed = 11L)

  // ------------------------------------------------------------------
  // queries + oracles
  // ------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++
      graft.queries.TokenQueries.defs ++
      graft.queries.EventQueries.defs ++
      graft.queries.CurationQueries.defs ++
      graft.queries.SketchQueries.defs ++
      graft.queries.PackingQueries.defs ++
      graft.queries.TokenizerQueries.defs ++
      graft.queries.RelationalQueries.defs ++
      graft.queries.HlQueries.defs ++
      graft.queries.VectorQueries.defs ++
      graft.queries.SpectralQueries.defs ++
      graft.queries.RhythmQueries.defs ++
      graft.queries.FeatureVectorQueries.defs

  def oracleSql: Map[String, String] =
    baseOracles ++
      graft.queries.TokenQueries.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.CurationQueries.oracles ++
      graft.queries.SketchQueries.oracles ++
      graft.queries.PackingQueries.oracles ++
      graft.queries.TokenizerQueries.oracles ++
      graft.queries.RelationalQueries.oracles ++
      graft.queries.HlQueries.oracles ++
      graft.queries.VectorQueries.oracles ++
      graft.queries.SpectralQueries.oracles ++
      graft.queries.RhythmQueries.oracles ++
      graft.queries.FeatureVectorQueries.oracles

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational sanity: group-agg on lineitem (integral quantities ⇒ exact)
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
    }),

    // the derived source table itself — token-array bitwise passthrough.
    // Driver-checkable form: the driver's pandas hasher can't hash array
    // cells, so the bitwise invariant is carried by an md5 digest over the
    // canonical CSV rendering of the tokens (int formatting is identical in
    // Spark and DuckDB — no float ambiguity), plus the length. The raw
    // array form stays available as Seqs.fromDocuments for local checks.
    "seqs_tokens" -> ((s, dir) => seqs(s, dir).select(
      col("doc_id"), col("source"), col("n_tok"),
      expr("md5(array_join(transform(tokens, x -> CAST(x AS STRING)), ','))")
        .as("tok_md5"))),

    // framing + per-frame energy features (SampleAnalyser.cpp:814,1760-1783)
    "frame_rms" -> ((s, dir) => Framing.frameRows(seqs(s, dir))),

    // 13-stat block over the per-doc frame-RMS series (Statistics.cpp:12-90).
    // gmean/flatness are exp/ln-derived: libm rounding differs across
    // engines by 1 ulp, so the *query boundary* rounds them to 1e-6 (the
    // engine itself keeps full precision).
    "doc_stats_rms" -> ((s, dir) =>
      ll(s, dir).select(Seq(col("doc_id")) ++
        Stats.StatNames.map {
          case n @ ("gmean" | "flatness") => round(col(s"rms_$n"), 6).as(s"rms_$n")
          case n => col(s"rms_$n")
        }: _*)),

    // tree-ensemble inference compiled to Catalyst CASE expressions
    // (GBDT.cpp:50-117 analog): per-class additive scores over the
    // quantized 13-stat feature block, softmax probs, argmax class
    "gbdt_score" -> ((s, dir) => {
      import graft.ops.TreeEnsemble
      var fr = Framing.withFrames(seqs(s, dir))
        .withColumn("xs", expr("transform(frames, fr -> fr.rms)"))
        .withColumn("__st", expr("graft_stats_block(xs)"))
      for (n <- Stats.StatNames)
        fr = fr.withColumn(s"__f_$n",
          expr(TreeEnsemble.quant6Sql(s"__st.$n")))
      val scored = TreeEnsemble.score(fr,
        Stats.StatNames.map(n => s"__f_$n"), gbdtModel)
      scored.select(Seq(col("doc_id")) ++
        gbdtModel.classes.flatMap(c => Seq(
          expr(s"IF(score_$c = 0.0, 0.0, score_$c)").as(s"score_$c"),
          expr(s"IF(prob_$c = 0.0, 0.0, prob_$c)").as(s"prob_$c"))) :+
        col("pred_class"): _*)
    }),

    // LARGE-ensemble inference (500 trees) via the flattened node-table
    // walk (graft_tree_walk) — model rides the plan as three literals,
    // plan build O(1) in tree count (vs ~17 s/16 trees compiled CASE)
    "gbdt_score_large" -> ((s, dir) => {
      import graft.ops.TreeEnsemble
      val fr = Framing.withFrames(seqs(s, dir))
        .withColumn("xs", expr("transform(frames, fr -> fr.rms)"))
        .withColumn("__st", expr("graft_stats_block(xs)"))
        .withColumn("__fv", array(Stats.StatNames.map(n =>
          expr(TreeEnsemble.quant6Sql(s"__st.$n"))): _*))
      TreeEnsemble.scoreLarge(fr, col("__fv"), gbdtLargeModel, gbdtLargeDepth)
        .select(Seq(col("doc_id")) ++
          gbdtLargeModel.classes.map(c =>
            expr(s"IF(score_$c = 0.0, 0.0, score_$c)").as(s"score_$c")) :+
          col("pred_class"): _*)
    }),

    // in-engine GBDT TRAINING (GBDT.cpp:50-117 analog, histogram method):
    // depth-2 boosting over quantized integer features; one row per round
    // (pre-round loss + fitted splits/leaves) + closing final-loss row
    "gbdt_train" -> ((s, dir) =>
      graft.ops.GbdtTrain.fitReport(seqs(s, dir))),

    // k-fold BAGGED fit (Bagging.h:191-217 analog): per-fold train/
    // out-of-bag losses + the fold-averaged predictor's full-corpus loss
    "gbdt_bagged" -> ((s, dir) =>
      graft.ops.GbdtTrain.fitBagged(seqs(s, dir))),

    // prefix/suffix silence trim + effective lengths (SampleAnalyser.cpp:646-676, 1715-1756)
    "silence_trim" -> ((s, dir) =>
      ll(s, dir).select(Seq(col("doc_id")) ++
        Pipeline.EffectiveLengthThresholds.flatMap(t => Seq(
          col(s"first_audible_$t"), col(s"last_audible_$t"),
          col(s"effective_len_$t"))): _*))
  )

  private def baseOracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "seqs_tokens" ->
      s"""WITH $duckSeqs
         |SELECT doc_id, source, n_tok,
         |       md5(array_to_string(tokens, ',')) AS tok_md5
         |FROM seqs""".stripMargin,

    "frame_rms" ->
      s"""WITH $duckFrames
         |SELECT doc_id, source, n_tok, frame_id, n_samp, fsum, fsumsq,
         |       rms, peak, is_audible
         |FROM frames""".stripMargin,

    "doc_stats_rms" -> {
      val block = Stats.duckBlock(
        inner = "SELECT doc_id, list(rms ORDER BY frame_id) AS xs FROM frames GROUP BY doc_id",
        keys = Seq("doc_id"), xs = "xs", p = "rms", prelude = duckFrames)
      val outer = Seq("doc_id") ++ Stats.StatNames.map {
        case n @ ("gmean" | "flatness") => s"round(rms_$n, 6) AS rms_$n"
        case n => s"rms_$n"
      }
      s"SELECT ${outer.mkString(", ")} FROM ($block)"
    },

    "gbdt_score" -> {
      import graft.ops.TreeEnsemble
      val cs = gbdtModel.classes
      val block = Stats.duckBlock(
        inner = "SELECT doc_id, list(rms ORDER BY frame_id) AS xs FROM frames GROUP BY doc_id",
        keys = Seq("doc_id"), xs = "xs", p = "rms", prelude = duckFrames)
      val fvList = Stats.StatNames
        .map(n => TreeEnsemble.quant6Sql(s"rms_$n"))
        .mkString("[", ", ", "]")
      val scoreCols = TreeEnsemble.duckScoreSql(gbdtModel, "fv").mkString(",\n  ")
      val mx = cs.map(c => s"score_$c").mkString("greatest(", ", ", ")")
      val z = cs.map(c => s"exp(score_$c - mx)")
        .reduce((a, b) => s"($a + $b)")
      val probs = cs.map(c =>
        s"CASE WHEN round(exp(score_$c - mx) / zz, 6) = 0.0 THEN 0.0 " +
          s"ELSE round(exp(score_$c - mx) / zz, 6) END AS prob_$c")
      val pred = cs.init.reverse.foldLeft(s"'${cs.last}'") { (acc, c) =>
        s"CASE WHEN score_$c = mx THEN '$c' ELSE $acc END"
      }
      val scoreOut = cs.map(c =>
        s"CASE WHEN score_$c = 0.0 THEN 0.0 ELSE score_$c END AS score_$c")
      s"""WITH base AS ($block),
         |fvt AS (SELECT doc_id, $fvList AS fv FROM base),
         |sc AS (SELECT doc_id,
         |  $scoreCols
         |FROM fvt),
         |m AS (SELECT *, $mx AS mx FROM sc),
         |zt AS (SELECT *, $z AS zz FROM m)
         |SELECT doc_id,
         |  ${scoreOut.mkString(",\n  ")},
         |  ${probs.mkString(",\n  ")},
         |  $pred AS pred_class
         |FROM zt""".stripMargin
    },

    "gbdt_score_large" -> {
      import graft.ops.TreeEnsemble
      val cs = gbdtLargeModel.classes
      val flat = TreeEnsemble.flatten(gbdtLargeModel, gbdtLargeDepth)
      val nTrees = gbdtLargeModel.trees.head.length
      val block = Stats.duckBlock(
        inner = "SELECT doc_id, list(rms ORDER BY frame_id) AS xs FROM frames GROUP BY doc_id",
        keys = Seq("doc_id"), xs = "xs", p = "rms", prelude = duckFrames)
      val fvList = Stats.StatNames.map(n => TreeEnsemble.quant6Sql(s"rms_$n"))
        .mkString("[", ", ", "]")
      val modelCols = cs.indices.map { c =>
        val (f, t, l) = TreeEnsemble.duckFlatLits(flat(c))
        s"$f AS f$c, $t AS t$c, $l AS l$c"
      }.mkString(",\n  ")
      val scoreCols = cs.indices.map(c =>
        s"${TreeEnsemble.duckWalkSql(s"f$c", s"t$c", s"l$c", "fv",
            nTrees, gbdtLargeDepth)} AS score_${cs(c)}").mkString(",\n  ")
      val mx = cs.map(c => s"score_$c").mkString("greatest(", ", ", ")")
      val pred = cs.init.reverse.foldLeft(s"'${cs.last}'") { (acc, c) =>
        s"CASE WHEN score_$c = mx THEN '$c' ELSE $acc END"
      }
      val scoreOut = cs.map(c =>
        s"CASE WHEN score_$c = 0.0 THEN 0.0 ELSE score_$c END AS score_$c")
      s"""WITH base AS ($block),
         |model AS (SELECT
         |  $modelCols),
         |fvt AS (SELECT doc_id, $fvList AS fv FROM base),
         |sc AS (SELECT doc_id,
         |  $scoreCols
         |FROM fvt CROSS JOIN model),
         |m AS (SELECT *, $mx AS mx FROM sc)
         |SELECT doc_id,
         |  ${scoreOut.mkString(",\n  ")},
         |  $pred AS pred_class
         |FROM m""".stripMargin
    },

    "gbdt_train" -> graft.ops.GbdtTrain.duckFitSql(Seqs.duckSql),

    "gbdt_bagged" -> graft.ops.GbdtTrain.duckBaggedSql(Seqs.duckSql),

    "silence_trim" -> {
      val cols = Pipeline.EffectiveLengthThresholds.map { t =>
        s"""  CAST(coalesce(min(CASE WHEN abs(v) > $t THEN pos END), -1) AS INTEGER) AS first_audible_$t,
           |  CAST(coalesce(max(CASE WHEN abs(v) > $t THEN pos END), -1) AS INTEGER) AS last_audible_$t,
           |  CAST(CASE WHEN count(CASE WHEN abs(v) > $t THEN 1 END) = 0 THEN 0
           |       ELSE max(CASE WHEN abs(v) > $t THEN pos END)
           |          - min(CASE WHEN abs(v) > $t THEN pos END) + 1
           |  END AS INTEGER) AS effective_len_$t""".stripMargin
      }.mkString(",\n")
      s"""WITH $duckSeqs,
         |tok AS (
         |  SELECT doc_id, unnest(tokens) AS v,
         |         generate_subscripts(tokens, 1) - 1 AS pos
         |  FROM seqs)
         |SELECT doc_id,
         |$cols
         |FROM tok GROUP BY doc_id""".stripMargin
    }
  )
}
