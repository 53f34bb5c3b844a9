package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, IntervalJoin}

/** As-of join semantics: at-or-before match, tie goes to the series row,
  * missing history falls back to the default (silence-reference semantics,
  * SampleClassificationDescriptors.cpp:73-102). */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val series = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 5L, 9.0)
  ).toDF("k", "ts", "v")

  private lazy val probes = Seq(
    ("a", 9L), ("a", 10L), ("a", 25L), ("a", 99L),
    ("b", 4L), ("b", 5L)
  ).toDF("k", "t")

  test("at-or-before with default") {
    val out = AsOfJoin.asOf(probes, series, "k", "t", "ts", Seq("v"),
      defaults = Map("v" -> lit(-1.0)))
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("a", 9L, -1.0),   // before first -> default
      ("a", 10L, 1.0),   // tie -> inclusive
      ("a", 25L, 2.0),   // between
      ("a", 99L, 3.0),   // after last -> last (as-of, not default)
      ("b", 4L, -1.0),
      ("b", 5L, 9.0)))
  }

  test("no default -> null before first") {
    val out = AsOfJoin.asOf(probes, series, "k", "t", "ts", Seq("v"))
      .filter(col("t") === 9L).collect()
    assert(out.length == 1 && out(0).isNullAt(2))
  }

  test("tolerance: stale matches fall back like missing history") {
    // tolerance 10: probe 99 finds series 30 (age 69 > 10) -> stale
    val out = AsOfJoin.asOfTolerance(probes, series, "k", "t", "ts",
        Seq("v"), tolerance = 10L, defaults = Map("v" -> lit(-1.0)))
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("a", 9L, -1.0),  // no history at all -> default
      ("a", 10L, 1.0),  // tie: age 0 -> fresh
      ("a", 25L, 2.0),  // age 5 -> fresh
      ("a", 99L, -1.0), // age 69 > 10 -> STALE, default (asOf keeps 3.0)
      ("b", 4L, -1.0),
      ("b", 5L, 9.0)))
    // boundary is inclusive: age exactly == tolerance keeps the match
    val edge = AsOfJoin.asOfTolerance(
        Seq(("a", 30L)).toDF("k", "t"), series, "k", "t", "ts",
        Seq("v"), tolerance = 10L).collect()
    assert(edge.length == 1 && edge(0).getDouble(2) == 3.0)
    val edge2 = AsOfJoin.asOfTolerance(
        Seq(("a", 40L)).toDF("k", "t"), series, "k", "t", "ts",
        Seq("v"), tolerance = 10L).collect()
    assert(edge2.length == 1 && edge2(0).getDouble(2) == 3.0) // age == tol
    // without defaults a stale match nulls, preserving the payload type
    val n = AsOfJoin.asOfTolerance(
        Seq(("a", 99L)).toDF("k", "t"), series, "k", "t", "ts",
        Seq("v"), tolerance = 10L).collect()
    assert(n.length == 1 && n(0).isNullAt(2))
  }

  test("leadJoin: first outcome strictly after, within horizon") {
    val out = AsOfJoin.leadJoin(probes, series, "k", "t", "ts",
        Seq("v"), horizon = 100L, defaults = Map("v" -> lit(0.0)))
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("a", 9L, 1.0),   // next outcome at 10
      ("a", 10L, 2.0),  // STRICTLY after: same-ts 10 excluded -> 20
      ("a", 25L, 3.0),  // next at 30
      ("a", 99L, 0.0),  // no later outcome -> default (unconverted)
      ("b", 4L, 9.0),
      ("b", 5L, 0.0)))  // 5 itself excluded, nothing later
    // horizon is inclusive and bounds attribution
    val h = AsOfJoin.leadJoin(
        Seq(("a", 9L), ("a", 5L)).toDF("k", "t"), series, "k", "t", "ts",
        Seq("v"), horizon = 1L, defaults = Map("v" -> lit(0.0)))
      .orderBy("t").collect().map(_.getDouble(2))
    assert(h.toSeq == Seq(0.0, 1.0)) // t=5: 10 is 5 away > 1 -> 0; t=9: 10 in budget
    // no defaults -> typed null on unconverted probes
    val n = AsOfJoin.leadJoin(Seq(("a", 99L)).toDF("k", "t"), series,
      "k", "t", "ts", Seq("v"), horizon = 10L).collect()
    assert(n.length == 1 && n(0).isNullAt(2))
  }

  test("tolerance/lead serve the MATCHED row's value even when it is null") {
    // series: t=100 v=5.0, t=200 v=NULL; per-column ignoreNulls fill would
    // serve the stale 5.0 under the fresh matched ts 200 — the staleness
    // bound must apply to the value actually served
    val ser = Seq[(String, Long, Option[Double])](
      ("a", 100L, Some(5.0)), ("a", 200L, None)).toDF("k", "ts", "v")
    val tol = AsOfJoin.asOfTolerance(
        Seq(("a", 210L)).toDF("k", "t"), ser, "k", "t", "ts",
        Seq("v"), tolerance = 50L, defaults = Map("v" -> lit(-1.0)))
      .collect()
    // matched row (200, NULL) is fresh -> serve ITS value (null), never 5.0
    assert(tol.length == 1 && tol(0).isNullAt(2))
    // leadJoin: series (5, NULL), (50, 7.0); probe 0, horizon 10 — the
    // matched row is 5 (in horizon) with value NULL; 7.0 at t=50 is beyond
    // the horizon and must NOT leak in as the label
    val ser2 = Seq[(String, Long, Option[Double])](
      ("a", 5L, None), ("a", 50L, Some(7.0))).toDF("k", "ts", "v")
    val lead = AsOfJoin.leadJoin(
        Seq(("a", 0L)).toDF("k", "t"), ser2, "k", "t", "ts",
        Seq("v"), horizon = 10L).collect()
    assert(lead.length == 1 && lead(0).isNullAt(2))
  }

  test("trailingAgg: strictly-before range window, hand-computed") {
    val ser = Seq(("a", 10L, 5L), ("a", 20L, 7L), ("a", 30L, 11L))
      .toDF("k", "ts", "cents")
    val prb = Seq(("a", 10L), ("a", 20L), ("a", 25L), ("a", 31L), ("a", 200L),
      ("b", 50L)).toDF("k", "t")
    val out = graft.operators.WindowFeatures
      .trailingAgg(prb, ser, "k", "t", "ts", "cents", window = 15L)
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", 10L, 0L, 0L),   // event AT t excluded (strictly before)
      ("a", 20L, 1L, 5L),   // [5, 19] -> the 10
      ("a", 25L, 2L, 12L),  // [10, 24] -> 10 and 20
      ("a", 31L, 2L, 18L),  // [16, 30] -> 20 and 30
      ("a", 200L, 0L, 0L),  // empty history = 0, not null
      ("b", 50L, 0L, 0L)))  // key with no series at all
  }

  test("trailingStats: min/max/variance stat block, empty-window nulls") {
    val ser = Seq(("a", 1L, 10L), ("a", 5L, 30L))
      .toDF("k", "ts", "cents")
    val prb = Seq(("a", 0L), ("a", 5L), ("a", 6L)).toDF("k", "t")
    val out = graft.operators.WindowFeatures
      .trailingStats(prb, ser, "k", "t", "ts", "cents", window = 5L)
      .orderBy("t").collect()
    // t=0: empty history -> zeros and NULLs
    assert(out(0).getAs[Long]("w_n") == 0L &&
      out(0).getAs[Long]("w_sum") == 0L)
    assert(out(0).isNullAt(out(0).fieldIndex("w_min")) &&
      out(0).isNullAt(out(0).fieldIndex("w_max")) &&
      out(0).isNullAt(out(0).fieldIndex("w_var")))
    // t=5: [0,4] -> only the 10; singleton variance is exactly 0.0
    assert(out(1).getAs[Long]("w_n") == 1L &&
      out(1).getAs[Long]("w_min") == 10L &&
      out(1).getAs[Long]("w_max") == 10L &&
      out(1).getAs[Double]("w_var") == 0.0)
    // t=6: [1,5] -> {10, 30}: pop var = 100 exactly
    assert(out(2).getAs[Long]("w_n") == 2L &&
      out(2).getAs[Long]("w_sum") == 40L &&
      out(2).getAs[Long]("w_min") == 10L &&
      out(2).getAs[Long]("w_max") == 30L &&
      out(2).getAs[Double]("w_var") == 100.0)
  }

  test("trailingAggMulti == per-window singles, in ONE window operator") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.window.WindowExec
    val ser = Seq(("a", 10L, 5L), ("a", 20L, 7L), ("a", 30L, 11L),
      ("b", 8L, 3L)).toDF("k", "ts", "cents")
    val prb = Seq(("a", 15L), ("a", 31L), ("b", 9L)).toDF("k", "t")
    val wins = Seq(5L, 15L, 100L)
    val multi = graft.operators.WindowFeatures
      .trailingAggMulti(prb, ser, "k", "t", "ts", "cents", wins)
    val got = multi.orderBy("k", "t").collect()
      .map(r => (0 until r.length).map(i => r.get(i)).toList)
    val singles = wins.map(w => graft.operators.WindowFeatures
      .trailingAgg(prb, ser, "k", "t", "ts", "cents", w)
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(2), r.getLong(3))))
    for (row <- got.indices; wi <- wins.indices)
      assert((got(row)(2 + 2 * wi), got(row)(3 + 2 * wi)) ==
        (singles(wi)(row)._1, singles(wi)(row)._2))
    // all three frames share one sort: exactly ONE window op, ONE exchange
    multi.count()
    val plan = multi.queryExecution.executedPlan match {
      case ad: AdaptiveSparkPlanExec => ad.executedPlan
      case p => p
    }
    assert(plan.collect { case w: WindowExec => w }.size == 1)
    assert(plan.collect { case e: ShuffleExchangeLike => e }.size == 1)
  }

  test("decayedCounter: half-life bucket weights, hand-computed; one window op") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.window.WindowExec
    val ser = Seq(("a", 5L, 3L), ("a", 12L, 7L), ("a", 25L, 11L))
      .toDF("k", "ts", "cents")
    val prb = Seq(("a", 5L), ("a", 30L), ("b", 9L)).toDF("k", "t")
    val dc = graft.operators.WindowFeatures.decayedCounter(
      prb, ser, "k", "t", "ts", "cents",
      halfLife = 10L, nBuckets = 3, scalePow = 4)
    val out = dc.orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // probe (a, 30): ages 25/18/5 -> buckets 2/1/0, weights 4/8/16:
    //   n = 4 + 8 + 16 = 28; sum = 3*4 + 7*8 + 11*16 = 244
    // probe (a, 5): the event AT t is excluded (strictly before) -> 0
    assert(out.toSeq == Seq(
      ("a", 5L, 0L, 0L),
      ("a", 30L, 28L, 244L),
      ("b", 9L, 0L, 0L)))
    // nBuckets = 1 degenerates to trailingAgg scaled by 2^scalePow
    val one = graft.operators.WindowFeatures.decayedCounter(
        prb, ser, "k", "t", "ts", "cents",
        halfLife = 10L, nBuckets = 1, scalePow = 4)
      .orderBy("k", "t").collect().map(r => (r.getLong(2), r.getLong(3)))
    val single = graft.operators.WindowFeatures.trailingAgg(
        prb, ser, "k", "t", "ts", "cents", window = 10L)
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(2) * 16L, r.getLong(3) * 16L))
    assert(one.toSeq == single.toSeq)
    // all bucket frames share one sort: ONE window op, ONE exchange
    dc.count()
    val plan = dc.queryExecution.executedPlan match {
      case ad: AdaptiveSparkPlanExec => ad.executedPlan
      case p => p
    }
    assert(plan.collect { case w: WindowExec => w }.size == 1)
    assert(plan.collect { case e: ShuffleExchangeLike => e }.size == 1)
  }

  test("training-set assembly: zero temporal leakage by construction") {
    def assemble(outcomes: Seq[(String, Long, Long)]) =
      graft.features.TrainingSet.assemble(
        probes = Seq(("u", 1L, 100L)).toDF("k", "event_id", "t"),
        state = Seq(("u", 90L, 5.0)).toDF("k", "sts", "sv"),
        stateTs = "sts", stateVal = "sv",
        outcomes = outcomes.toDF("k", "ots", "cents"),
        outcomeTs = "ots", outcomeVal = "cents",
        key = "k", probeTs = "t",
        freshness = 50L, horizons = Seq(30L), labelH = 20L)
        .collect().map(r => (r.getDouble(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).head
    // baseline: one past outcome (in history), no future outcome
    val base = assemble(Seq(("u", 80L, 7L)))
    assert(base == ((5.0, 1L, 7L, 0L))) // state 5.0, history (1, 7), label 0
    // appending a FUTURE outcome changes ONLY the label, never a feature
    val withFuture = assemble(Seq(("u", 80L, 7L), ("u", 110L, 9L)))
    assert(withFuture == ((5.0, 1L, 7L, 9L)))
    // an outcome AT the probe timestamp is neither feature nor label
    val simultaneous = assemble(Seq(("u", 80L, 7L), ("u", 100L, 99L)))
    assert(simultaneous == ((5.0, 1L, 7L, 0L)))
  }

  test("randomized brute-force parity: tolerance / lead / trailing") {
    // 60 random keys (= trials), all evaluated in ONE job per operator by
    // baking the trial into the join key; reference = O(n^2) scan
    val rnd = new scala.util.Random(20260817L)
    val Tol = 37L; val Hor = 23L; val Win = 41L
    val series = for {
      t <- 0 until 60
      ts <- rnd.shuffle((0L until 300L).toList).take(rnd.nextInt(25))
    } yield (s"k$t", ts, (rnd.nextInt(199) + 1).toLong)
    val probes = for {
      t <- 0 until 60
      _ <- 0 until (rnd.nextInt(10) + 1)
    } yield (s"k$t", rnd.nextInt(320).toLong)
    val serByK = series.groupBy(_._1)
    val serDf = series.toDF("k", "ts", "cents")
    val prbDf = probes.distinct.toDF("k", "t")

    val tol = AsOfJoin.asOfTolerance(prbDf, serDf, "k", "t", "ts",
        Seq("cents"), Tol).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val lead = AsOfJoin.leadJoin(prbDf, serDf, "k", "t", "ts",
        Seq("cents"), Hor).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val trail = graft.operators.WindowFeatures
      .trailingAgg(prbDf, serDf, "k", "t", "ts", "cents", Win).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

    for ((k, t) <- probes.distinct) {
      val ser = serByK.getOrElse(k, Seq.empty)
      val expTol = ser.filter(_._2 <= t).sortBy(_._2).lastOption
        .filter(s => t - s._2 <= Tol).map(_._3)
      assert(tol((k, t)) == expTol, s"tol k=$k t=$t")
      val expLead = ser.filter(_._2 > t).sortBy(_._2).headOption
        .filter(s => s._2 - t <= Hor).map(_._3)
      assert(lead((k, t)) == expLead, s"lead k=$k t=$t")
      val inWin = ser.filter(s => s._2 >= t - Win && s._2 < t)
      assert(trail((k, t)) == ((inWin.size.toLong, inWin.map(_._3).sum)),
        s"trail k=$k t=$t")
    }
  }

  test("probe columns preserved; zero row multiplication") {
    val p2 = probes.withColumn("tag", concat(col("k"), lit("#"), col("t")))
    val out = AsOfJoin.asOf(p2, series, "k", "t", "ts", Seq("v"))
    assert(out.count() == probes.count())
    assert(out.columns.toSet == Set("k", "t", "tag", "v"))
  }

  test("salted == unsalted on a skewed coarse-key fixture") {
    // one hot key carrying ~90% of probes + one cold key; series points at
    // irregular spacings so probes land before/at/between/after
    val ser = Seq(
      ("hot", 10L, 1.0), ("hot", 50L, 2.0), ("hot", 51L, 3.0),
      ("hot", 400L, 4.0), ("cold", 7L, 9.0)
    ).toDF("k", "ts", "v")
    val prb = ((0 until 450).map(i => ("hot", i.toLong)) ++
      Seq(("cold", 3L), ("cold", 7L), ("cold", 900L)))
      .toDF("k", "t")
    val plain = AsOfJoin.asOf(prb, ser, "k", "t", "ts", Seq("v"),
      defaults = Map("v" -> lit(-1.0)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2))
    for (salts <- Seq(1, 3, 16)) {
      val salted = AsOfJoin.asOfSalted(prb, ser, "k", "t", "ts", Seq("v"),
        defaults = Map("v" -> lit(-1.0)), salts = salts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sortBy(x => (x._1, x._2))
      assert(salted.toSeq == plain.toSeq, s"salts=$salts")
    }
    // salted output keeps the probe-column contract (no salt leak)
    val cols = AsOfJoin.asOfSalted(prb, ser, "k", "t", "ts", Seq("v")).columns
    assert(cols.toSet == Set("k", "t", "v"))
  }

  test("interval join: overlap multi-match, half-open bounds, degenerate drop") {
    val iv = Seq(
      ("a", 0L, 100L, "x"),   // overlaps y on [50, 100)
      ("a", 50L, 150L, "y"),
      ("a", 200L, 200L, "z"), // empty half-open range -> dropped
      ("a", 300L, 290L, "w"), // reversed -> dropped
      ("b", 10L, 20L, "q")
    ).toDF("k", "lo", "hi", "tag")
    val pr = Seq(("a", 75L), ("a", 0L), ("a", 100L), ("a", 149L),
      ("a", 200L), ("b", 19L), ("b", 20L), ("c", 5L)).toDF("k", "t")
    val out = IntervalJoin.pointInInterval(pr, iv, "k", "t", "lo", "hi", 64L)
      .select("k", "t", "tag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.length == out.toSet.size) // each match found exactly once
    assert(out.toSet == Set(
      ("a", 75L, "x"), ("a", 75L, "y"), // multi-match in the overlap zone
      ("a", 0L, "x"),                   // `from` inclusive
      ("a", 100L, "y"),                 // `to` exclusive for x
      ("a", 149L, "y"),
      ("b", 19L, "q")))                 // t=20 out; t=200 empty interval
  }

  test("interval join: randomized brute-force parity across bucket widths") {
    val rnd = new scala.util.Random(20260819L)
    val ivRows = (for {
      t <- 0 until 40
      _ <- 0 until rnd.nextInt(8)
    } yield (s"k$t", rnd.nextInt(500).toLong, rnd.nextInt(120).toLong))
      .zipWithIndex.map { case ((k, lo, span), i) =>
        (k, lo, lo + span, i.toLong) } // span 0 => degenerate, must drop
    val prs = (for {
      t <- 0 until 40
      _ <- 0 until (rnd.nextInt(12) + 1)
    } yield (s"k$t", rnd.nextInt(650).toLong)).distinct
    val ivDf = ivRows.toDF("k", "lo", "hi", "id")
    val prDf = prs.toDF("k", "t")
    val expected = (for {
      (k, t) <- prs
      (ik, lo, hi, id) <- ivRows if ik == k && t >= lo && t < hi
    } yield (k, t, id)).toSet
    assert(expected.nonEmpty &&
      expected.groupBy(x => (x._1, x._2)).values.exists(_.size > 1))
    // the match set is an invariant of the plan, not of the bucket dial
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = IntervalJoin.pointInInterval(prDf, ivDf, "k", "t", "lo", "hi", w)
        .select("k", "t", "id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.length == got.toSet.size, s"duplicate matches at w=$w")
      assert(got.toSet == expected, s"w=$w")
    }
  }
}
