package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** In-engine gradient-boosted-tree TRAINING — the distributed analog of
  * the reference's model-creation stage (`Source/Crawler/Classification/
  * Source/Models/GBDT.cpp:50-117` trains LightGBM offline and ships a
  * blob; here the fit itself is a Spark job, closing the train side of
  * the [[TreeEnsemble]] inference path).
  *
  * == Algorithm (LightGBM's histogram method, squared loss) ==
  * Features are quantized once into `bins` equal-width integer bins; each
  * boosting round fits one depth-2 regression tree:
  *
  *  1. residual `r = y − pred` (exact int64 micro-units),
  *  2. ONE distributed aggregation builds the (feature, bin) histogram
  *     `(ΣG, n)` — map-side partials, F·B result rows,
  *  3. the best root split maximizes the variance-reduction gain
  *     `GL²/nL + GR²/nR − G²/n` over the cumulative histogram (driver-side
  *     argmax over ≤ F·B candidates — model-sized planning metadata, the
  *     same role as [[TreeEnsemble]]'s node table),
  *  4. one more aggregation keyed by (side, feature, bin) finds each
  *     child's split the same way,
  *  5. leaf values are shrunk means `⌊G/(2n) + ½⌋` (η = 0.5, micro-units)
  *     and the prediction column gains one CASE expression.
  *
  * Per round: two tiny collects (64 + 128 rows) and zero corpus shuffles
  * beyond the two histogram aggregations — exactly the shape that lets
  * LightGBM-style training run on 10^12 rows: the corpus is never sorted,
  * sampled to the driver, or joined against itself; everything the driver
  * sees is O(features × bins).
  *
  * == Determinism (bitwise, engine-independent) ==
  * Residuals/labels/leaf values are int64; histogram sums are exact
  * integer aggregations (order-free). Gains and leaf means are ONE double
  * expression over exact int64 inputs — IEEE-identical in any engine —
  * with ties broken (gain DESC, feature ASC, bin ASC). Split candidates
  * enumerate the PRESENT bins of each node's histogram (both engines see
  * the same histogram, so the same candidate set); a node with no valid
  * candidate keeps a marker split (f = −1) sending every row left. The
  * DuckDB mirror ([[duckFitSql]]) unrolls the same rounds as a CTE chain
  * and reproduces every emitted value bitwise.
  */
object GbdtTrain {

  /** Boosting rounds / bins / depth-2 shape constants. */
  val DefaultRounds = 4
  val DefaultBins = 16

  /** Integer per-doc features + planted nonlinear label, all mirrorable:
    * f0 = n_tok, f1 = mean |token| (floor), f2 = max token, f3 = zero-token
    * count; y_micro = 600k·[f1 > 560] + 400k·[(f3 > 79) XOR (f0 > 4800)]
    * + doc-hash noise — the XOR term is exactly what a depth-2 tree can
    * express and a stump cannot. The token sweep runs in the native
    * [[graft.functions.expressions.TokenFeats]] kernel — the interpreted
    * HOF trio (`aggregate`/`array_max`/`filter`) it replaced walked every
    * token array three times and dominated the fit's dump cost. */
  def features(seqs: DataFrame): DataFrame = {
    graft.functions.expressions.register(seqs.sparkSession)
    seqs.filter(col("n_tok") > 0)
      .withColumn("__tf", expr("graft_token_feats(tokens)"))
      .select(
        col("doc_id"),
        col("n_tok").cast("long").as("f0"),
        expr("__tf[0] DIV CAST(n_tok AS BIGINT)").as("f1"),
        col("__tf")(1).as("f2"),
        col("__tf")(2).as("f3"))
      .withColumn("y",
        expr("""CASE WHEN f1 > 560 THEN 600000 ELSE 0 END
               | + CASE WHEN (f3 > 79) != (f0 > 4800) THEN 400000 ELSE 0 END
               | + (CAST(substring(doc_id, 2) AS BIGINT) * 2654435761)
               |   % 100000""".stripMargin))
  }

  private val NF = 4

  private case class Split(f: Int, t: Int)

  /** Argmax over cumulative-histogram candidates; `hist` = (f, bin) →
    * (G, n) for ONE node. Returns the chosen split plus per-(≤,>) leaf
    * sufficient statistics. Fallback (no candidate with both sides
    * nonempty): marker split f = −1, t = bins−1, everything left. */
  private def bestSplit(hist: Map[(Int, Int), (Long, Long)], bins: Int)
      : (Split, (Long, Long), (Long, Long)) = {
    if (hist.isEmpty) return (Split(-1, bins - 1), (0L, 0L), (0L, 0L))
    val gt = hist.collect { case ((0, _), (g, _)) => g }.sum
    val nt = hist.collect { case ((0, _), (_, n)) => n }.sum
    var best: Option[(Double, Split, (Long, Long))] = None
    for (f <- 0 until NF) {
      val fb = hist.collect { case ((`f`, b), gn) => b -> gn }.toSeq.sortBy(_._1)
      var gl = 0L; var nl = 0L
      for (((b, (g, n)), i) <- fb.zipWithIndex if i < fb.size - 1) {
        gl += g; nl += n
        val gr = gt - gl; val nr = nt - nl
        if (nl > 0 && nr > 0) {
          // the exact IEEE shape the mirror uses: gl²/nl + gr²/nr − gt²/nt
          val gain = gl.toDouble * gl.toDouble / nl.toDouble +
            gr.toDouble * gr.toDouble / nr.toDouble -
            gt.toDouble * gt.toDouble / nt.toDouble
          val cand = (gain, Split(f, b), (gl, nl))
          val better = best match {
            case None => true
            case Some((bg, bs, _)) =>
              gain > bg || (gain == bg &&
                (f < bs.f || (f == bs.f && b < bs.t)))
          }
          if (better) best = Some(cand)
        }
      }
    }
    best match {
      case Some((_, s, (gl, nl))) => (s, (gl, nl), (gt - gl, nt - nl))
      case None => (Split(-1, bins - 1), (gt, nt), (0L, 0L))
    }
  }

  /** η = 0.5 shrunk integer leaf value — `⌊G/(2n) + ½⌋`, 0 on empty. */
  private def leafVal(g: Long, n: Long): Long =
    if (n == 0) 0L
    else math.floor(g.toDouble / (2.0 * n.toDouble) + 0.5).toLong

  private def binCol(f: Int, mn: Long, mx: Long, bins: Int): Column =
    expr(s"CAST((f$f - $mn) * $bins DIV (${mx - mn + 1}) AS INT)")

  private val OutSchema = StructType(Seq(
    StructField("round", IntegerType, nullable = false),
    StructField("loss_pre", LongType, nullable = false),
    StructField("root_f", IntegerType, nullable = false),
    StructField("root_bin", IntegerType, nullable = false),
    StructField("l_f", IntegerType, nullable = false),
    StructField("l_bin", IntegerType, nullable = false),
    StructField("r_f", IntegerType, nullable = false),
    StructField("r_bin", IntegerType, nullable = false),
    StructField("v_ll", LongType, nullable = false),
    StructField("v_lr", LongType, nullable = false),
    StructField("v_rl", LongType, nullable = false),
    StructField("v_rr", LongType, nullable = false)))

  /** Train `rounds` depth-2 trees over [[features]] of `seqs`; returns one
    * row per round — pre-round training loss `Σ resid²` (exact int64) and
    * the fitted tree (split features/bins + 4 leaf micro-values) — plus a
    * closing row (`round = rounds+1`, `root_f = −2`) carrying the final
    * loss, so the output itself evidences monotone descent. */
  def fitReport(seqs: DataFrame, rounds: Int = DefaultRounds,
                bins: Int = DefaultBins): DataFrame =
    fit(seqs, rounds, bins)._1

  /** [[fitReport]]'s companion surface closing the train → apply loop: the
    * per-doc predictions of the fitted ensemble, `(doc_id, y, pred_micro)`
    * — the additive CASE-expression application of every fitted tree (the
    * same compiled-expression shape [[TreeEnsemble.score]] uses for
    * external models). `Σ (y − pred)²` over this table equals the report's
    * closing-row loss exactly (pinned in OpsSpec). */
  def fitPredict(seqs: DataFrame, rounds: Int = DefaultRounds,
                 bins: Int = DefaultBins): DataFrame = {
    val (_, binned, predC, _, _) = fit(seqs, rounds, bins)
    binned.select(col("doc_id"), col("y"), predC.as("pred_micro"))
  }

  /** Core fitter. `trainPred` (over the [[features]] columns — doc_id and
    * f0..f3) restricts histogram building, quantization constants, the
    * base mean and every reported loss to the TRAIN subset, while the
    * prediction column applies to every row — the leak-free k-fold shape
    * [[fitBagged]] composes. The default `lit(true)` trains on everything
    * (identical to the pre-predicate form, bit for bit). */
  private def fit(seqs: DataFrame, rounds: Int, bins: Int,
                  trainPred: Column = lit(true))
      : (DataFrame, DataFrame, Column, Array[(Long, Long)], Long) = {
    val spark = seqs.sparkSession
    val fm = features(seqs)
    // quantization constants from the TRAIN subset only: one tiny agg
    // (8 longs of planning metadata)
    val mmRow = fm.filter(trainPred).agg(
      min("f0"), max("f0"), min("f1"), max("f1"),
      min("f2"), max("f2"), min("f3"), max("f3")).collect()(0)
    val mm = Array.tabulate(NF)(f => (mmRow.getLong(2 * f), mmRow.getLong(2 * f + 1)))
    // binned working set, checkpointed once: every round re-reads bins+y
    // only (at cluster scale: a persisted/checkpointed narrow table)
    val binned = fm.select(
      (col("doc_id") +: trainPred.as("is_train") +: col("y") +:
        Seq.tabulate(NF)(f =>
          binCol(f, mm(f)._1, mm(f)._2, bins).as(s"b$f"))): _*)
      .localCheckpoint(true)
    // base prediction: integer floor-mean of train y (both engines:
    // positive DIV)
    val b0 = binned.filter(col("is_train"))
      .agg(sum("y"), count(lit(1))).collect()(0)
    val base = b0.getLong(0) / b0.getLong(1)

    var predC: Column = lit(base)
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    var lastLoss = 0L
    for (r <- 1 to rounds) {
      val resid = binned.withColumn("resid", col("y") - predC)
      val train = resid.filter(col("is_train"))
      // loss + root histogram in ONE pass: long-form over the 4 features
      val longF = train.select(col("resid"),
        posexplode(array(Seq.tabulate(NF)(f => col(s"b$f")): _*))
          .as(Seq("f", "bin")))
      val histRows = longF.groupBy("f", "bin")
        .agg(sum("resid").as("g"), count(lit(1)).as("n"),
          sum(col("resid") * col("resid")).as("sq"))
        .collect()
      val hist = histRows.map(r0 => (r0.getInt(0), r0.getInt(1)) ->
        (r0.getLong(2), r0.getLong(3))).toMap
      val loss = histRows.filter(_.getInt(0) == 0).map(_.getLong(4)).sum
      lastLoss = loss
      val (rootS, _, _) = bestSplit(hist, bins)
      val sideC: Column =
        if (rootS.f < 0) lit(0)
        else when(col(s"b${rootS.f}") <= rootS.t, lit(0)).otherwise(lit(1))
      // level-2 histograms, keyed by side
      val hist2Rows = train.withColumn("side", sideC)
        .select(col("side"), col("resid"),
          posexplode(array(Seq.tabulate(NF)(f => col(s"b$f")): _*))
            .as(Seq("f", "bin")))
        .groupBy("side", "f", "bin")
        .agg(sum("resid").as("g"), count(lit(1)).as("n"))
        .collect()
      def sideHist(s: Int) = hist2Rows.filter(_.getInt(0) == s)
        .map(r0 => (r0.getInt(1), r0.getInt(2)) ->
          (r0.getLong(3), r0.getLong(4))).toMap
      val (lS, (gll, nll), (glr, nlr)) = bestSplit(sideHist(0), bins)
      val (rS, (grl, nrl), (grr, nrr)) = bestSplit(sideHist(1), bins)
      val vs = Array(leafVal(gll, nll), leafVal(glr, nlr),
        leafVal(grl, nrl), leafVal(grr, nrr))
      def childC(s: Split): Column =
        if (s.f < 0) lit(0)
        else when(col(s"b${s.f}") <= s.t, lit(0)).otherwise(lit(1))
      val leafC =
        when(sideC === 0,
          when(childC(lS) === 0, lit(vs(0))).otherwise(lit(vs(1))))
        .otherwise(
          when(childC(rS) === 0, lit(vs(2))).otherwise(lit(vs(3))))
      predC = predC + leafC
      out += Row(r, loss, rootS.f, rootS.t, lS.f, lS.t, rS.f, rS.t,
        vs(0), vs(1), vs(2), vs(3))
    }
    // closing row: final train loss after the last update
    val fin = binned.filter(col("is_train"))
      .withColumn("resid", col("y") - predC)
      .agg(sum(col("resid") * col("resid"))).collect()(0).getLong(0)
    out += Row(rounds + 1, fin, -2, 0, -2, 0, -2, 0, 0L, 0L, 0L, 0L)
    (spark.createDataFrame(new java.util.ArrayList[Row](out.asJava), OutSchema),
      binned, predC, mm, base)
  }

  /** Model-artifact export — the `ModelCreator.cpp:284-320` save analog:
    * the fitted ensemble as two MODEL-SIZED tables ready for
    * [[graft.sink.KeyedSink]] persistence: the per-round tree table
    * ([[fitReport]]'s exact output — splits + leaf values ARE the model)
    * and the quantization/bias table `(f, mn, mx, base)` (bin bounds per
    * feature + the base prediction, without which the trees cannot be
    * applied to new data). [[applyArtifacts]] inverts it; KeyedSinkSpec
    * pins persist → reload → apply bitwise-equal to [[fitPredict]]. */
  def fitArtifacts(seqs: DataFrame, rounds: Int = DefaultRounds,
                   bins: Int = DefaultBins): (DataFrame, DataFrame) = {
    val (report, _, _, mm, base) = fit(seqs, rounds, bins)
    val spark = seqs.sparkSession
    val bSchema = StructType(Seq(
      StructField("f", IntegerType, nullable = false),
      StructField("mn", LongType, nullable = false),
      StructField("mx", LongType, nullable = false),
      StructField("base", LongType, nullable = false)))
    val bRows: Seq[Row] =
      (0 until NF).map(f => Row(f, mm(f)._1, mm(f)._2, base))
    (report, spark.createDataFrame(
      new java.util.ArrayList[Row](bRows.asJava), bSchema))
  }

  /** Apply a persisted ensemble (the two [[fitArtifacts]] tables, e.g.
    * re-read through KeyedSink) to `seqs`: rebuild the bin columns from
    * the stored bounds and replay each round's CASE chain. The tables are
    * model-sized, so the collects are planning metadata (the
    * [[TreeEnsemble]] literal-model convention); scoring is one narrow
    * projection, zero shuffle. */
  def applyArtifacts(seqs: DataFrame, report: DataFrame, bounds: DataFrame,
                     bins: Int = DefaultBins): DataFrame = {
    val bRows = bounds.orderBy("f").collect()
    require(bRows.length == NF, s"bounds table must carry $NF features")
    val mm = bRows.map(r => (r.getAs[Long]("mn"), r.getAs[Long]("mx")))
    val base = bRows.head.getAs[Long]("base")
    val trees = report.filter(col("root_f") =!= -2).orderBy("round").collect()
    val fm = features(seqs)
    val binned = fm.select(
      (col("doc_id") +: col("y") +: Seq.tabulate(NF)(f =>
        binCol(f, mm(f)._1, mm(f)._2, bins).as(s"b$f"))): _*)
    var predC: Column = lit(base)
    for (t <- trees) {
      def splitC(fI: Int, tI: Int): Column =
        if (fI < 0) lit(0)
        else when(col(s"b$fI") <= tI, lit(0)).otherwise(lit(1))
      val sideC = splitC(t.getAs[Int]("root_f"), t.getAs[Int]("root_bin"))
      val leafC =
        when(sideC === 0,
          when(splitC(t.getAs[Int]("l_f"), t.getAs[Int]("l_bin")) === 0,
            lit(t.getAs[Long]("v_ll"))).otherwise(lit(t.getAs[Long]("v_lr"))))
        .otherwise(
          when(splitC(t.getAs[Int]("r_f"), t.getAs[Int]("r_bin")) === 0,
            lit(t.getAs[Long]("v_rl"))).otherwise(lit(t.getAs[Long]("v_rr"))))
      predC = predC + leafC
    }
    binned.select(col("doc_id"), col("y"), predC.as("pred_micro"))
  }

  /** k-FOLD BAGGED fit — the reference's actual model-creation shape
    * (`Bagging.h:191-217`: LightGBM bagged over cross-validation folds;
    * `ClassificationTestDataSet.cpp:455-530` builds the folds). Fold `f`
    * trains on documents with `doc_num % folds ≠ f` (quantization, base
    * mean and histograms all train-side only — leak-free), predicts
    * everyone; the bagged predictor is the integer-floored mean of the
    * fold predictors. Output: one `(part, loss)` row per fold×{train,oob}
    * plus `bagged_full` — Jensen guarantees bagged_full ≤ mean of the
    * folds' full-corpus losses (up to ±1-micro flooring), which the spec
    * asserts. Cost: folds × the [[fitReport]] job graph + one folds-way
    * doc_id join for the average — each join side is the narrow binned
    * table, co-partitioned on doc_id. */
  def fitBagged(seqs: DataFrame, folds: Int = 3, rounds: Int = 2,
                bins: Int = DefaultBins): DataFrame = {
    require(folds >= 2, "bagging needs at least 2 folds")
    val spark = seqs.sparkSession
    val fits = (0 until folds).map { f =>
      val pred = expr(
        s"CAST(substring(doc_id, 2) AS BIGINT) % $folds != $f")
      val (rep, binned, predC, _, _) = fit(seqs, rounds, bins, pred)
      val trainLoss = rep.orderBy(col("round").desc).collect()(0)
        .getAs[Long]("loss_pre")
      val oob = binned.filter(!col("is_train"))
        .withColumn("resid", col("y") - predC)
        .agg(sum(col("resid") * col("resid"))).collect()(0).getLong(0)
      (f, trainLoss, oob, binned.select(col("doc_id"), col("y"),
        predC.as(s"p$f")))
    }
    val joined = fits.map(_._4).reduce((a, b) =>
      a.join(b.drop("y"), Seq("doc_id")))
    val baggedLoss = joined
      .withColumn("bp", expr(
        s"CAST(floor(CAST(${fits.map(f => s"p${f._1}").mkString(" + ")} " +
          s"AS DOUBLE) / $folds) AS BIGINT)"))
      .withColumn("resid", col("y") - col("bp"))
      .agg(sum(col("resid") * col("resid"))).collect()(0).getLong(0)
    val rows: Seq[Row] =
      fits.flatMap { case (f, tr, ho, _) =>
        Seq(Row(s"fold${f}_train", tr), Row(s"fold${f}_oob", ho)) } :+
        Row("bagged_full", baggedLoss)
    val schema = StructType(Seq(
      StructField("part", StringType, nullable = false),
      StructField("loss", LongType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava), schema)
  }

  // ------------------------------------------------------------------
  // DuckDB mirror (unrolled CTE chain, one block per round)
  // ------------------------------------------------------------------

  /** DuckDB mirror of [[features]]. */
  private def duckFeaturesSql(seqsSql: String): String =
    s"""SELECT doc_id,
       |  CAST(n_tok AS BIGINT) AS f0,
       |  CAST(list_sum(list_transform(tokens, x -> abs(CAST(x AS BIGINT))))
       |    // CAST(n_tok AS BIGINT) AS BIGINT) AS f1,
       |  CAST(list_max(tokens) AS BIGINT) AS f2,
       |  CAST(len(list_filter(tokens, x -> x = 0)) AS BIGINT) AS f3
       |FROM ($seqsSql) WHERE n_tok > 0""".stripMargin


  /** Shared feat + lab CTE header (label formula identical to
    * [[features]]'s `y`). */
  private def duckHeader(seqsSql: String): String =
    s"""WITH feat AS MATERIALIZED (
       |${duckFeaturesSql(seqsSql)}),
       |lab AS (
       |  SELECT *,
       |    CASE WHEN f1 > 560 THEN 600000 ELSE 0 END
       |    + CASE WHEN (f3 > 79) != (f0 > 4800) THEN 400000 ELSE 0 END
       |    + (CAST(substring(doc_id, 2) AS BIGINT) * 2654435761) % 100000
       |      AS y
       |  FROM lab_src),
       |""".stripMargin.replace("FROM lab_src", "FROM feat")

  /** One boosting chain as CTE text — every CTE name prefixed `p`, every
    * statistic (quantization bounds, base mean, histograms, leaf values,
    * losses) restricted to `trainPredSql` rows while the prediction table
    * carries EVERY row. `p = ""` with `trainPredSql = "TRUE"` is the plain
    * [[duckFitSql]] chain. Assumes `feat`/`lab` are already defined. */
  private def duckChain(p: String, trainPredSql: String, rounds: Int,
                        bins: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""${p}mm AS (
         |  SELECT min(f0) mn0, max(f0) mx0, min(f1) mn1, max(f1) mx1,
         |         min(f2) mn2, max(f2) mx2, min(f3) mn3, max(f3) mx3
         |  FROM lab WHERE $trainPredSql),
         |${p}binned AS MATERIALIZED (
         |  SELECT doc_id, ($trainPredSql) AS is_train, y,
         |    CAST((f0 - mn0) * $bins // (mx0 - mn0 + 1) AS INT) AS b0,
         |    CAST((f1 - mn1) * $bins // (mx1 - mn1 + 1) AS INT) AS b1,
         |    CAST((f2 - mn2) * $bins // (mx2 - mn2 + 1) AS INT) AS b2,
         |    CAST((f3 - mn3) * $bins // (mx3 - mn3 + 1) AS INT) AS b3
         |  FROM lab CROSS JOIN ${p}mm),
         |${p}docs_0 AS (
         |  SELECT *, (SELECT sum(y) // count(*) FROM ${p}binned
         |             WHERE is_train) AS pred
         |  FROM ${p}binned),
         |""".stripMargin)
    for (r <- 1 to rounds) {
      val q = r - 1
      sb.append(
        s"""${p}res_$r AS MATERIALIZED (
           |  SELECT *, y - pred AS resid FROM ${p}docs_$q),
           |${p}long_$r AS (
           |  SELECT resid, 0 AS f, b0 AS bin FROM ${p}res_$r WHERE is_train
           |  UNION ALL
           |  SELECT resid, 1, b1 FROM ${p}res_$r WHERE is_train UNION ALL
           |  SELECT resid, 2, b2 FROM ${p}res_$r WHERE is_train UNION ALL
           |  SELECT resid, 3, b3 FROM ${p}res_$r WHERE is_train),
           |${p}hist_$r AS MATERIALIZED (
           |  SELECT f, bin, CAST(sum(resid) AS BIGINT) AS g,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM ${p}long_$r GROUP BY 1, 2),
           |${p}tot_$r AS (
           |  SELECT CAST(sum(g) AS BIGINT) gt, CAST(sum(n) AS BIGINT) nt
           |  FROM ${p}hist_$r WHERE f = 0),
           |${p}cum_$r AS (
           |  SELECT f, bin AS t,
           |    CAST(sum(g) OVER w AS BIGINT) AS gl,
           |    CAST(sum(n) OVER w AS BIGINT) AS nl,
           |    row_number() OVER (PARTITION BY f ORDER BY bin DESC) AS rn
           |  FROM ${p}hist_$r
           |  WINDOW w AS (PARTITION BY f ORDER BY bin)),
           |${p}cand_$r AS (
           |  SELECT f, t,
           |    CAST(gl AS DOUBLE) * CAST(gl AS DOUBLE) / CAST(nl AS DOUBLE)
           |    + CAST(gt - gl AS DOUBLE) * CAST(gt - gl AS DOUBLE)
           |      / CAST(nt - nl AS DOUBLE)
           |    - CAST(gt AS DOUBLE) * CAST(gt AS DOUBLE) / CAST(nt AS DOUBLE)
           |      AS gain
           |  FROM ${p}cum_$r CROSS JOIN ${p}tot_$r
           |  WHERE rn > 1 AND nl > 0 AND nt - nl > 0
           |  UNION ALL SELECT -1, ${bins - 1}, -1e300),
           |${p}best_$r AS (
           |  SELECT f, t FROM ${p}cand_$r
           |  ORDER BY gain DESC, f ASC, t ASC LIMIT 1),
           |${p}side_$r AS MATERIALIZED (
           |  SELECT d.*, CASE WHEN b.f = -1 OR
           |      (CASE b.f WHEN 0 THEN b0 WHEN 1 THEN b1
           |                WHEN 2 THEN b2 ELSE b3 END) <= b.t
           |    THEN 0 ELSE 1 END AS side
           |  FROM ${p}res_$r d CROSS JOIN ${p}best_$r b),
           |${p}long2_$r AS (
           |  SELECT side, resid, 0 AS f, b0 AS bin FROM ${p}side_$r
           |    WHERE is_train
           |  UNION ALL
           |  SELECT side, resid, 1, b1 FROM ${p}side_$r WHERE is_train
           |  UNION ALL
           |  SELECT side, resid, 2, b2 FROM ${p}side_$r WHERE is_train
           |  UNION ALL
           |  SELECT side, resid, 3, b3 FROM ${p}side_$r WHERE is_train),
           |${p}hist2_$r AS MATERIALIZED (
           |  SELECT side, f, bin, CAST(sum(resid) AS BIGINT) AS g,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM ${p}long2_$r GROUP BY 1, 2, 3),
           |${p}tot2_$r AS (
           |  SELECT side, CAST(sum(g) AS BIGINT) gt, CAST(sum(n) AS BIGINT) nt
           |  FROM ${p}hist2_$r WHERE f = 0 GROUP BY 1),
           |${p}cum2_$r AS (
           |  SELECT side, f, bin AS t,
           |    CAST(sum(g) OVER w AS BIGINT) AS gl,
           |    CAST(sum(n) OVER w AS BIGINT) AS nl,
           |    row_number() OVER (PARTITION BY side, f ORDER BY bin DESC) AS rn
           |  FROM ${p}hist2_$r
           |  WINDOW w AS (PARTITION BY side, f ORDER BY bin)),
           |${p}cand2_$r AS (
           |  SELECT c.side, f, t,
           |    CAST(gl AS DOUBLE) * CAST(gl AS DOUBLE) / CAST(nl AS DOUBLE)
           |    + CAST(tt.gt - gl AS DOUBLE) * CAST(tt.gt - gl AS DOUBLE)
           |      / CAST(tt.nt - nl AS DOUBLE)
           |    - CAST(tt.gt AS DOUBLE) * CAST(tt.gt AS DOUBLE)
           |      / CAST(tt.nt AS DOUBLE) AS gain
           |  FROM ${p}cum2_$r c JOIN ${p}tot2_$r tt ON c.side = tt.side
           |  WHERE rn > 1 AND nl > 0 AND tt.nt - nl > 0
           |  UNION ALL SELECT 0, -1, ${bins - 1}, -1e300
           |  UNION ALL SELECT 1, -1, ${bins - 1}, -1e300),
           |${p}cbest_$r AS (
           |  SELECT side, f, t FROM (
           |    SELECT side, f, t, row_number() OVER (PARTITION BY side
           |      ORDER BY gain DESC, f ASC, t ASC) AS rk
           |    FROM ${p}cand2_$r) WHERE rk = 1),
           |${p}sub_$r AS MATERIALIZED (
           |  SELECT d.*, CASE WHEN c.f = -1 OR
           |      (CASE c.f WHEN 0 THEN b0 WHEN 1 THEN b1
           |                WHEN 2 THEN b2 ELSE b3 END) <= c.t
           |    THEN 0 ELSE 1 END AS subside
           |  FROM ${p}side_$r d JOIN ${p}cbest_$r c ON d.side = c.side),
           |${p}leaf_$r AS (
           |  SELECT side, subside,
           |    CAST(floor(CAST(sum(resid) AS DOUBLE)
           |      / (2.0 * CAST(count(*) AS DOUBLE)) + 0.5) AS BIGINT) AS v
           |  FROM ${p}sub_$r WHERE is_train GROUP BY 1, 2),
           |${p}docs_$r AS MATERIALIZED (
           |  SELECT doc_id, is_train, y, b0, b1, b2, b3,
           |    pred + COALESCE(l.v, 0) AS pred
           |  FROM ${p}sub_$r s LEFT JOIN ${p}leaf_$r l
           |    ON s.side = l.side AND s.subside = l.subside),
           |${p}row_$r AS (
           |  SELECT $r AS round,
           |    (SELECT CAST(sum(resid * resid) AS BIGINT) FROM ${p}res_$r
           |     WHERE is_train) AS loss_pre,
           |    (SELECT CAST(f AS INT) FROM ${p}best_$r) AS root_f,
           |    (SELECT CAST(t AS INT) FROM ${p}best_$r) AS root_bin,
           |    (SELECT CAST(f AS INT) FROM ${p}cbest_$r WHERE side = 0) AS l_f,
           |    (SELECT CAST(t AS INT) FROM ${p}cbest_$r WHERE side = 0) AS l_bin,
           |    (SELECT CAST(f AS INT) FROM ${p}cbest_$r WHERE side = 1) AS r_f,
           |    (SELECT CAST(t AS INT) FROM ${p}cbest_$r WHERE side = 1) AS r_bin,
           |    COALESCE((SELECT v FROM ${p}leaf_$r WHERE side = 0 AND subside = 0), 0) AS v_ll,
           |    COALESCE((SELECT v FROM ${p}leaf_$r WHERE side = 0 AND subside = 1), 0) AS v_lr,
           |    COALESCE((SELECT v FROM ${p}leaf_$r WHERE side = 1 AND subside = 0), 0) AS v_rl,
           |    COALESCE((SELECT v FROM ${p}leaf_$r WHERE side = 1 AND subside = 1), 0) AS v_rr),
           |""".stripMargin)
    }
    sb.toString
  }

  /** DuckDB mirror of [[fitReport]] — the same rounds unrolled as a CTE
    * chain ([[duckChain]] with the everything-is-train predicate). All
    * aggregations integer; gains/leaf means the identical double
    * expressions; ties the identical (gain DESC, f, t) order. */
  def duckFitSql(seqsSql: String, rounds: Int = DefaultRounds,
                 bins: Int = DefaultBins): String = {
    val sb = new StringBuilder
    sb.append(duckHeader(seqsSql))
    sb.append(duckChain("", "TRUE", rounds, bins))
    sb.append(
      s"""fin AS (
         |  SELECT ${rounds + 1} AS round,
         |    (SELECT CAST(sum((y - pred) * (y - pred)) AS BIGINT)
         |     FROM docs_$rounds WHERE is_train) AS loss_pre,
         |    -2 AS root_f, 0 AS root_bin, -2 AS l_f, 0 AS l_bin,
         |    -2 AS r_f, 0 AS r_bin,
         |    CAST(0 AS BIGINT) AS v_ll, CAST(0 AS BIGINT) AS v_lr,
         |    CAST(0 AS BIGINT) AS v_rl, CAST(0 AS BIGINT) AS v_rr)
         |""".stripMargin)
    sb.append("SELECT * FROM (")
    sb.append((1 to rounds).map(r => s"SELECT * FROM row_$r")
      .mkString(" UNION ALL "))
    sb.append(" UNION ALL SELECT * FROM fin)")
    sb.toString
  }

  /** DuckDB mirror of [[fitBagged]] — one [[duckChain]] per fold (prefix
    * `f<k>_`, train predicate `doc_num % folds ≠ k`), then the per-fold
    * train/out-of-bag losses and the integer-floored-mean bagged
    * predictor's full-corpus loss. */
  def duckBaggedSql(seqsSql: String, folds: Int = 3, rounds: Int = 2,
                    bins: Int = DefaultBins): String = {
    val sb = new StringBuilder
    sb.append(duckHeader(seqsSql))
    for (f <- 0 until folds)
      sb.append(duckChain(s"f${f}_",
        s"(CAST(substring(doc_id, 2) AS BIGINT) % $folds) != $f",
        rounds, bins))
    val joins = (1 until folds).map(f =>
      s"JOIN f${f}_docs_$rounds t$f ON t0.doc_id = t$f.doc_id")
      .mkString("\n  ")
    val sumP = (0 until folds).map(f => s"t$f.pred").mkString(" + ")
    sb.append(
      s"""bag AS (
         |  SELECT t0.doc_id, t0.y,
         |    CAST(floor(CAST($sumP AS DOUBLE) / $folds) AS BIGINT) AS bp
         |  FROM f0_docs_$rounds t0
         |  $joins)
         |SELECT * FROM (
         |""".stripMargin)
    val parts = (0 until folds).flatMap { f =>
      Seq(
        s"""SELECT 'fold${f}_train' AS part,
           |  (SELECT CAST(sum((y - pred) * (y - pred)) AS BIGINT)
           |   FROM f${f}_docs_$rounds WHERE is_train) AS loss""".stripMargin,
        s"""SELECT 'fold${f}_oob',
           |  (SELECT CAST(sum((y - pred) * (y - pred)) AS BIGINT)
           |   FROM f${f}_docs_$rounds WHERE NOT is_train)""".stripMargin)
    } :+
      s"""SELECT 'bagged_full',
         |  (SELECT CAST(sum((y - bp) * (y - bp)) AS BIGINT) FROM bag)"""
        .stripMargin
    sb.append(parts.mkString("\nUNION ALL\n"))
    sb.append(")")
    sb.toString
  }
}
