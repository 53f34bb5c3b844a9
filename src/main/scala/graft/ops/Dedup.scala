package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.expressions
import graft.functions.expressions.MinHashParams

/** Deduplication operators for training-data curation — exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * == Scale design ==
  *  - Exact: one hash-shuffle on `md5(text)` with map-side partial
  *    aggregation; group cardinality ≈ distinct docs.
  *  - MinHash+LSH: signatures are a narrow per-row pass (native
  *    [[expressions.MinHash]]); candidate pairs come from an equi-join on
  *    (band_id, band_hash) buckets — NEVER an all-pairs product. At 10^12
  *    docs the band join shuffles only (docs × nBands) small rows, and AQE
  *    skew-split handles hot buckets (e.g. the all-zeros doc).
  *  - SimHash: explode words → one groupBy(doc) with exact ±1 integer bit
  *    votes; near-dup candidates join on the simhash value (or rotated
  *    prefixes for hamming distance > 0).
  *  - N-gram Jaccard: exact verifier for candidate pairs — distinct
  *    trigram sets intersected via a co-grouped join, counts are exact ints.
  */
object Dedup {

  /** Exact duplicate groups by content hash. */
  def exactGroups(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))

  val duckExactSql: String =
    """SELECT md5(text) AS text_hash, count(*) AS n_docs,
      |       min(doc_id) AS min_doc_id
      |FROM documents GROUP BY 1""".stripMargin

  /** MinHash signatures + LSH band hashes per doc (over token shingles). */
  def minhash(seqs: DataFrame): DataFrame = {
    expressions.register(seqs.sparkSession)
    import MinHashParams._
    seqs.select(col("doc_id"),
      expr(s"graft_minhash(tokens, $NumHashes, $BandSize)").as("mh"))
      .select(col("doc_id"), col("mh.sig").as("sig"), col("mh.bands").as("bands"))
  }

  /** LSH candidate pairs: docs sharing any band bucket (doc_a < doc_b). */
  def lshCandidates(seqs: DataFrame): DataFrame = {
    val mh = minhash(seqs)
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_id", "band_hash")))
    val a = mh.as("a"); val b = mh.as("b")
    a.join(b,
        col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** DuckDB mirror of [[minhash]] (expects a `seqs` CTE in `prelude`).
    *
    * The per-permutation minimum runs VECTORIZED — shingle hashes unnested
    * to rows, cross-joined with the 16 permutation ids, one grouped `min`
    * — instead of the original `list_transform(range(k), k ->
    * list_min(list_transform(hs, …)))` nested-lambda form, whose
    * interpreted dispatch made every oracle sharing this CTE pay ~20-30 s
    * at the gate scale (the whole dedup-family replay cost; measured
    * round 5). Same exact int64 arithmetic, same `HashMod` fill for docs
    * shorter than one shingle — bitwise-identical output, ~10× cheaper. */
  def duckMinhashSql(prelude: String): String = {
    import MinHashParams._
    val aList = (0 until NumHashes).map(a).mkString(", ")
    val bList = (0 until NumHashes).map(b).mkString(", ")
    s"""WITH $prelude,
       |sh AS (
       |  SELECT doc_id,
       |    list_transform(range(CAST(len(tokens) - ${Shingle - 1} AS BIGINT)),
       |      i -> ((((((tokens[i + 1] + 2048) * 31
       |             + (tokens[i + 2] + 2048)) % $ShingleMod * 31
       |             + (tokens[i + 3] + 2048)) % $ShingleMod * 31
       |             + (tokens[i + 4] + 2048)) % $ShingleMod * 31
       |             + (tokens[i + 5] + 2048)) % $ShingleMod)) AS hs
       |  FROM seqs),
       |shr AS (SELECT doc_id, unnest(hs) AS h FROM sh),
       |perm AS (SELECT unnest(range($NumHashes)) AS k),
       |sigk AS (
       |  SELECT doc_id, k,
       |    min((CAST([$aList][k + 1] AS BIGINT) * h
       |         + CAST([$bList][k + 1] AS BIGINT)) % $HashMod) AS m
       |  FROM shr CROSS JOIN perm GROUP BY 1, 2),
       |sig0 AS (
       |  SELECT doc_id, list(m ORDER BY k) AS sig FROM sigk GROUP BY 1),
       |sig AS (
       |  SELECT sh.doc_id,
       |    coalesce(sig0.sig, list_transform(range($NumHashes),
       |      x -> CAST($HashMod AS BIGINT))) AS sig
       |  FROM sh LEFT JOIN sig0 ON sh.doc_id = sig0.doc_id)
       |SELECT doc_id, sig,
       |  list_transform(range(${NumHashes / BandSize}), bj ->
       |    ((((sig[bj * $BandSize + 1] * 31
       |       + sig[bj * $BandSize + 2]) % $HashMod * 31
       |       + sig[bj * $BandSize + 3]) % $HashMod * 31
       |       + sig[bj * $BandSize + 4]) % $HashMod)) AS bands
       |FROM sig""".stripMargin
  }

  /** 32-bit SimHash per doc over word hashes (explode + exact bit votes). */
  def simhash(documents0: DataFrame): DataFrame = {
    val documents = graft.core.Partitioning.balance(documents0, "doc_id")
    val words = documents
      .select(col("doc_id"), explode(expr(TextAnalysis.wordsExpr)).as("w"))
      .withColumn("h", expr(TextAnalysis.wordHashExpr))
    val votes = (0 until 32).map { b =>
      sum(when(expr(s"(h & ${1L << b}) <> 0"), 1).otherwise(-1)).as(s"v$b")
    }
    words.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  val duckSimhashSql: String = {
    val bits = (0 until 32).map { b =>
      s"CASE WHEN sum(CASE WHEN (h & ${1L << b}) <> 0 THEN 1 ELSE -1 END) > 0 THEN ${1L << b} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(${TextAnalysis.duckWordsExpr}) AS w
       |  FROM documents),
       |hashed AS (
       |  SELECT doc_id, ${TextAnalysis.duckWordHashExpr} AS h FROM words)
       |SELECT doc_id, CAST($bits AS BIGINT) AS simhash
       |FROM hashed GROUP BY doc_id""".stripMargin
  }

  /** Duplicate-cluster resolution: connected components over candidate
    * pairs via iterative min-label propagation, then canonical doc =
    * cluster minimum. Every doc appears (singletons label themselves).
    *
    * == Scale design ==
    * Each iteration is one edge⋈label join + min-aggregate — fully
    * distributed; the driver loop only checks a convergence count.
    * Iterations = cluster diameter (near-dup clusters are tiny — LSH
    * pairs link copies of the same content). At web scale the same loop
    * runs with `localCheckpoint` lineage truncation (done here) or the
    * large-star/small-star variant; the shape stays a keyed equi-join,
    * never all-pairs. */
  def resolveClusters(allDocs: DataFrame, pairs: DataFrame,
                      key: String = "doc_id"): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    var labels = allDocs.select(col(key).as("doc_id"))
      .withColumn("cluster", col("doc_id"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    val MaxIters = 50
    while (changed > 0 && iter < MaxIters) {
      val prop = edges.join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src")).agg(min(col("cluster")).as("nlabel"))
      val updated = labels
        .join(prop, labels("doc_id") === prop("src"), "left_outer")
        .select(labels("doc_id"),
          col("cluster"),
          least(col("cluster"), coalesce(col("nlabel"), col("cluster")))
            .as("cluster2"))
        .localCheckpoint(true)
      changed = updated.filter(col("cluster2") < col("cluster")).count()
      labels = updated.select(col("doc_id"), col("cluster2").as("cluster"))
      iter += 1
    }
    // a component with diameter > MaxIters would exit un-converged and be
    // returned split — fail loudly instead of silently (near-dup clusters
    // are tiny by construction; a giant chain means the candidate graph is
    // degenerate and needs the large-star/small-star variant)
    if (changed > 0)
      throw new IllegalStateException(
        s"resolveClusters did not converge within $MaxIters iterations " +
        s"($changed labels still propagating) — component diameter exceeds " +
        "the cap; use large-star/small-star for graphs this deep")
    labels
  }

  /** Connected components via alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond" —
    * the O(log n)-round algorithm [[resolveClusters]]'s scale comment
    * promised). Each round is two keyed groupBy/join shuffles; component
    * DIAMETER no longer bounds the round count, so billion-node chains
    * converge where min-label propagation needs diameter iterations.
    *
    *   - large-star: every neighbor v > u re-points to m(u) = min(Γ⁺(u))
    *   - small-star: every neighbor v ≤ u re-points to m(u), plus (u, m(u))
    *
    * Converges to star graphs centered on each component's minimum; the
    * label table then reads directly off the edges. Same output contract
    * as [[resolveClusters]] (OpsSpec asserts equality, including a
    * 120-node chain the capped propagation cannot finish). */
  def resolveClustersStar(allDocs: DataFrame, pairs: DataFrame,
                          key: String = "doc_id"): DataFrame = {
    def sym(e: DataFrame): DataFrame =
      e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    def minLabel(s: DataFrame): DataFrame =
      s.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
    def phase(e: DataFrame, large: Boolean): DataFrame = {
      val s = sym(e)
      val m = minLabel(s)
      val joined = s.join(m, Seq("u"))
      val next =
        if (large)
          joined.filter(col("v") > col("u"))
            .select(col("v").as("u"), col("m").as("v"))
        else
          joined.filter(col("v") <= col("u"))
            .select(col("v").as("u"), col("m").as("v"))
            .unionByName(m.select(col("u"), col("m").as("v")))
      next.filter(col("u") =!= col("v")).distinct()
    }
    var edges = pairs
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    var converged = false
    var round = 0
    val MaxRounds = 60 // >= log2 of any conceivable node count
    while (!converged && round < MaxRounds) {
      val next = phase(phase(edges, large = true), large = false)
        .localCheckpoint(true)
      // fixpoint test in ONE distributed action: both sides are distinct
      // edge sets, so the symmetric difference is empty iff they are equal —
      // union the two excepts and run a single isEmpty job (round-3 ADVICE:
      // the two separate exceptAll actions doubled the per-round job count)
      converged = next.exceptAll(edges)
        .unionByName(edges.exceptAll(next)).isEmpty
      edges = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"resolveClustersStar did not converge in $MaxRounds rounds")
    // stars: every edge points non-center -> center; centers + untouched
    // docs label themselves
    allDocs.select(col(key).as("doc_id"))
      .join(edges.select(col("u").as("doc_id"), col("v").as("__c")),
        Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("__c"), col("doc_id")).as("cluster"))
  }

  /** Quantized PageRank over the near-dup candidate graph — the
    * iterative-graph-algorithm class beyond connected components
    * ([[resolveClustersStar]] answers "which docs are the same cluster";
    * PageRank answers "which docs are the TEMPLATE HUBS of that graph" —
    * boilerplate sources that near-duplicate into many other documents
    * score high and are prime removal candidates).
    *
    * Unnormalized per-node-mass form with damping d = 0.85 in exact
    * integer MICRO units: pr₀ = 10⁶, and each round
    * `pr'(v) = 150000 + Σ_{u→v} (85·pr(u)) div (100·deg(u))` — the
    * damping multiply and the degree split are one integer
    * multiply/truncating-divide, so every iterate is an exact int64 under
    * any row order (a float PageRank would drift by summation order).
    * Truncation leaks ≤ deg(u) micro-units of mass per node per round —
    * quantization noise ~10⁻⁶, irrelevant at ranking precision, and
    * bitwise-reproducible.
    *
    * Shape per round: one (src-keyed) join of edges to the rank table +
    * one dst-keyed agg — two keyed shuffles of the EDGE table, the
    * classic distributed PageRank round; ranks checkpoint per round to
    * truncate lineage. `iters` is fixed (the oracle unrolls it), not
    * convergence-tested: curation wants a stable ranking, not a fixpoint
    * certificate. */
  def pagerankHubs(allDocs: DataFrame, pairs: DataFrame,
                   iters: Int, key: String = "doc_id"): DataFrame = {
    // r6: the degree table is pre-joined into the (checkpointed) edge
    // table once — one join per round instead of two — and ranks
    // checkpoint only every 8th round instead of every round: at ≤ 8
    // rounds the lineage is a shallow linear chain and the per-round
    // eager materialization barriers (5 extra jobs) dominated the
    // query's wall time at sf0.1; the damping/div integer arithmetic is
    // unchanged, so ranks are bitwise identical.
    val edges0 = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"),
        col("doc_a").as("dst")))
      .distinct().localCheckpoint(true)
    val edges = edges0
      .join(edges0.groupBy(col("src")).agg(count(lit(1)).as("deg")),
        Seq("src"))
      .localCheckpoint(true)
    val nodes = allDocs.select(col(key).as("doc_id")).localCheckpoint(true)
    var pr = nodes.withColumn("pr_micro", lit(1000000L))
    for (it <- 1 to iters) {
      val contribs = edges
        .join(pr.select(col("doc_id").as("src"),
          col("pr_micro").as("pr_src")), Seq("src"))
        .select(col("dst"),
          expr("(85 * pr_src) div (100 * deg)").as("w"))
        .groupBy(col("dst")).agg(sum(col("w")).as("inw"))
      pr = nodes
        .join(contribs, nodes("doc_id") === contribs("dst"), "left_outer")
        .select(col("doc_id"),
          (lit(150000L) + coalesce(col("inw"), lit(0L))).as("pr_micro"))
      if (it % 8 == 0 && it < iters) pr = pr.localCheckpoint(true)
    }
    pr
  }

  /** DuckDB mirror of [[pagerankHubs]] — `iters` rounds unrolled. */
  def duckPagerankSql(pairsSql: String, iters: Int,
                      seqsSql: String = graft.sources.Seqs.duckSql): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH seqs AS ($seqsSql),
       |pairs AS MATERIALIZED ($pairsSql),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT doc_a AS src, doc_b AS dst FROM pairs
       |    UNION ALL
       |    SELECT doc_b AS src, doc_a AS dst FROM pairs)),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |nodes AS (SELECT doc_id FROM seqs),
       |pr0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS pr_micro
       |        FROM nodes)""".stripMargin
    for (t <- 1 to iters) {
      val prev = s"pr${t - 1}"
      sb ++= s""",
         |pr$t AS (
         |  SELECT n.doc_id,
         |    CAST(150000 + coalesce(c.inw, 0) AS BIGINT) AS pr_micro
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst,
         |      CAST(sum((85 * p.pr_micro) // (100 * d.deg)) AS BIGINT)
         |        AS inw
         |    FROM edges e
         |    JOIN $prev p ON e.src = p.doc_id
         |    JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) c ON c.dst = n.doc_id)""".stripMargin
    }
    sb ++= s"\nSELECT doc_id, pr_micro FROM pr$iters"
    sb.toString
  }

  /** DuckDB mirror of [[resolveClusters]]: transitive min over the
    * undirected candidate graph (recursive CTE with set semantics). */
  def duckResolveSql(pairsSql: String,
                     seqsSql: String = graft.sources.Seqs.duckSql): String =
    s"""WITH RECURSIVE seqs AS ($seqsSql),
       |pairs AS MATERIALIZED ($pairsSql),
       |edges AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |reach(src, lab) AS (
       |  SELECT doc_id, doc_id FROM seqs
       |  UNION
       |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.src = e.dst)
       |SELECT src AS doc_id, min(lab) AS cluster
       |FROM reach GROUP BY src""".stripMargin

  /** Sorted-neighborhood duplicate screen (Hernández & Stolfo's
    * merge/purge method — the third dedup FAMILY next to hashing
    * (exact/LSH) and pairwise verification): sort the corpus by a
    * content-derived key, then compare only ADJACENT rows. One
    * distributed sort + a linear adjacency pass — no candidate
    * generation at all, the cheapest screen shape there is; its miss
    * mode is near-dups whose keys land apart (window size / key choice
    * is the recall dial, and the LSH family is the backstop).
    *
    * The key is the packed 4-gram at a FIXED offset past the maximal
    * leading-silence run (`offset` ≥ the corpus's lead-run bound):
    * near-copies in this corpus share content at equal ABSOLUTE
    * positions and differ in their silence runs, so a trimmed-head key
    * would misalign them while the fixed-offset window lines them up —
    * key choice is always domain knowledge in merge/purge. Verification
    * on the adjacent pair is the O(lcp) common-prefix kernel over the
    * same window.
    *
    * Scale: `orderBy` is a range-partitioned distributed sort; the
    * adjacency lag here is a single global window (fine at gate scale —
    * production runs the lag per range partition with one-row boundary
    * overlap, same results). Payload through the sort is (doc_id, one
    * int64 key, a clipped window), never full documents. */
  def sortedNeighborhood(seqs: DataFrame, offset: Int, win: Int,
      minLcp: Int): DataFrame = {
    graft.functions.expressions.register(seqs.sparkSession)
    val keyed = seqs.selectExpr("doc_id",
        s"slice(tokens, ${offset + 1}, $win) AS head")
      .selectExpr("doc_id", "head",
        """IF(size(head) >= 4,
          |   element_at(graft_pack_ngrams(slice(head, 1, 4), 4), 1),
          |   CAST(-1 AS BIGINT)) AS head_key""".stripMargin)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("head_key"), col("doc_id"))
    keyed
      .withColumn("prev_doc", lag(col("doc_id"), 1).over(w))
      .withColumn("prev_head", lag(col("head"), 1).over(w))
      .selectExpr("doc_id", "prev_doc", "head_key",
        """IF(prev_doc IS NULL, CAST(NULL AS INT),
          |   graft_common_prefix(head, prev_head)) AS lcp""".stripMargin)
      .selectExpr("doc_id", "prev_doc", "head_key", "lcp",
        s"""CASE WHEN lcp IS NULL THEN false
           |     ELSE lcp >= $minLcp END AS near_dup""".stripMargin)
  }

  /** DuckDB mirror of [[sortedNeighborhood]]. */
  def duckSortedNeighborhoodSql(seqsPrelude: String, offset: Int,
      win: Int, minLcp: Int): String =
    s"""WITH $seqsPrelude,
       |keyed AS (
       |  SELECT doc_id, head,
       |    CASE WHEN len(head) >= 4 THEN
       |      (((head[1] + 2048)::BIGINT * 4096 + (head[2] + 2048)) * 4096
       |        + (head[3] + 2048)) * 4096 + (head[4] + 2048)
       |    ELSE CAST(-1 AS BIGINT) END AS head_key
       |  FROM (SELECT doc_id,
       |          list_slice(tokens, ${offset + 1},
       |            least(${offset + win}, len(tokens))) AS head
       |        FROM seqs)),
       |lagged AS (
       |  SELECT doc_id, head_key, head,
       |    lag(doc_id) OVER w AS prev_doc,
       |    lag(head) OVER w AS prev_head
       |  FROM keyed
       |  WINDOW w AS (ORDER BY head_key, doc_id))
       |SELECT doc_id, prev_doc, head_key,
       |  CASE WHEN prev_doc IS NULL THEN CAST(NULL AS INTEGER)
       |       ELSE CAST(coalesce(list_min(list_transform(
       |              range(CAST(least(len(head), len(prev_head))
       |                AS BIGINT)),
       |              i -> CASE WHEN head[CAST(i + 1 AS INTEGER)]
       |                          <> prev_head[CAST(i + 1 AS INTEGER)]
       |                        THEN i END)),
       |            least(len(head), len(prev_head))) AS INTEGER)
       |  END AS lcp,
       |  CASE WHEN prev_doc IS NULL THEN false
       |       ELSE coalesce(list_min(list_transform(
       |              range(CAST(least(len(head), len(prev_head))
       |                AS BIGINT)),
       |              i -> CASE WHEN head[CAST(i + 1 AS INTEGER)]
       |                          <> prev_head[CAST(i + 1 AS INTEGER)]
       |                        THEN i END)),
       |            least(len(head), len(prev_head))) >= $minLcp
       |  END AS near_dup
       |FROM lagged""".stripMargin

  /** Near-dup component-SIZE histogram — the corpus-shape read after
    * cluster resolution (how much mass sits in pairs vs giant template
    * components decides whether canonical-keep or span-excision is the
    * right dedup treatment, and a heavy tail is the early warning for
    * crawler traps / mirror farms). One row per component size: cluster
    * count, doc mass, corpus fraction. Composes [[resolveClustersStar]];
    * both aggregations are cluster-table-sized. */
  def componentSizes(allDocs: DataFrame, pairs: DataFrame): DataFrame = {
    val cl = resolveClustersStar(allDocs, pairs)
    val sizes = cl.groupBy(col("cluster")).agg(count(lit(1)).as("csize"))
    val tot = cl.agg(count(lit(1)).as("__docs"))
    sizes.groupBy(col("csize")).agg(count(lit(1)).as("n_clusters"))
      .crossJoin(broadcast(tot))
      .selectExpr("csize", "n_clusters",
        "csize * n_clusters AS n_docs",
        "CAST(csize * n_clusters AS DOUBLE) / __docs AS doc_frac")
  }

  /** DuckDB mirror of [[componentSizes]] over [[duckResolveSql]]'s
    * transitive-closure clustering. */
  def duckComponentSizesSql(pairsSql: String,
      seqsSql: String = graft.sources.Seqs.duckSql): String =
    s"""WITH resolved AS (${duckResolveSql(pairsSql, seqsSql)}),
       |sizes AS (SELECT cluster, count(*) AS csize
       |          FROM resolved GROUP BY 1),
       |tot AS (SELECT count(*) AS docs FROM resolved)
       |SELECT CAST(csize AS BIGINT) AS csize,
       |  count(*) AS n_clusters,
       |  CAST(csize * count(*) AS BIGINT) AS n_docs,
       |  CAST(csize * count(*) AS DOUBLE) / tot.docs AS doc_frac
       |FROM sizes CROSS JOIN tot
       |GROUP BY csize, tot.docs""".stripMargin

  /** Corpus-duplicated n-gram statistics (the document-level signal of
    * Lee et al.'s "Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499): for every document, the fraction of its
    * token k-gram OCCURRENCES whose k-gram also appears in at least one
    * OTHER document. High `dup_frac` = boilerplate / template / near-copy
    * mass; the per-doc fraction is the filter axis, and the `n_docs >= 2`
    * gram set is the span-removal candidate list.
    *
    * Grams are exact packed identities ([[graft.functions.expressions
    * .PackNgrams]], k ≤ 4) — no collision noise. Plan: one narrow explode
    * (doc_id-only payload) → per-(doc, gram) partial agg → doc-frequency
    * as `count(*) OVER (PARTITION BY gram)` → doc-keyed agg. A STRAIGHT
    * pipeline: the window replaces an earlier doc-frequency self-join
    * whose two references to the per-(doc, gram) table re-ran the corpus
    * explode when AQE stage reuse missed (the sketch_hll diamond,
    * BENCH.md); the gram partition is bounded by distinct docs per gram,
    * never raw occurrences, so the Zipf head stays pre-aggregated. */
  def duplicatedNgramStats(seqs: DataFrame, k: Int): DataFrame = {
    val perDocGram = LanguageModel.gramInstances(seqs, k)
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("n_occ"))
    perDocGram
      .withColumn("n_docs", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_occ")).as("n_grams"),
        sum(when(col("n_docs") >= 2, col("n_occ")).otherwise(0L)).as("n_dup"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup_distinct"))
      .withColumn("dup_frac",
        col("n_dup").cast("double") / col("n_grams").cast("double"))
  }

  /** Cross-document exact substring-span dedup (the "dedup training data
    * at substring granularity" family, cf. the suffix-array exact-
    * substring method of Lee et al. 2022, arXiv:2107.06499): fixed-length
    * token windows at strided positions are hashed
    * ([[graft.functions.expressions.SpanHashes]], 60-bit md5 prefix), a
    * window is DUPLICATED when its hash occurs in ≥ 2 documents, and each
    * doc reports its window count, duplicated-window count, and
    * duplicated fraction — the removal signal substring dedup acts on.
    *
    * Spark shape instead of a suffix array: the window table carries ONLY
    * (doc_id, hash) — never token payload — through one per-(hash, doc)
    * partial agg, then the cross-doc frequency as `count(*) OVER
    * (PARTITION BY h)` on that deduplicated table, then a doc-keyed agg.
    * A STRAIGHT pipeline (an earlier doc-frequency self-join referenced
    * the corpus explode twice — the sketch_hll diamond, BENCH.md); the
    * hash partition is bounded by distinct docs per span, so a hot
    * boilerplate span costs its doc count, never its occurrence count.
    * Stride trades recall granularity for a 1/stride window count, the
    * standard production dial; windows per doc are capped by the analysis
    * cap. A same-doc repeat does not count (n_docs ≥ 2 is cross-document,
    * the within-doc signal is [[duplicatedNgramStats]]). */
  def spanDupStats(seqs: DataFrame, winLen: Int, stride: Int): DataFrame = {
    val perDocSpan = seqs
      .select(col("doc_id"),
        explode(expr(s"graft_span_hashes(tokens, $winLen, $stride)")).as("h"))
      .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("n_win"))
    perDocSpan
      .withColumn("n_docs", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_win")).as("n_windows"),
        sum(when(col("n_docs") >= 2, col("n_win")).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        col("n_dup").cast("double") / col("n_windows").cast("double"))
  }

  /** Cross-document span REMOVAL — the rewrite step [[spanDupStats]] only
    * reports (Lee et al. 2022 actually excise the duplicated substrings
    * from the training corpus): for every strided window whose hash
    * occurs in ≥ 2 documents, the MIN-doc_id owner keeps its text and
    * every other document drops ALL positions covered by that window.
    * Output: one row per doc with the REWRITTEN token array (the
    * engine-wide per-row invariant — exact token-array equality — applies
    * to the rewrite itself).
    *
    * Shape: the window table carries (doc_id, window-index, hash) — no
    * token payload; ownership (`n_docs`, `owner`) are window sums over
    * the distinct (hash, doc) table (bounded by docs-per-span, the
    * [[spanDupStats]] Zipf argument); removable window starts come back
    * as ONE sorted array per affected doc (`collect_set` — bounded by
    * windows-per-doc, which the analysis cap bounds), and the rewrite is
    * one [[graft.functions.expressions.SpanExcise]] kernel projection —
    * O(n + k) per doc, zero extra shuffle beyond the doc-keyed join.
    * Within-doc repeats of an owned span stay (cross-doc is the removal
    * axis; the within-doc signal is [[duplicatedNgramStats]]). */
  def spanRemove(seqs: DataFrame, winLen: Int, stride: Int): DataFrame = {
    graft.functions.expressions.register(seqs.sparkSession)
    val byH = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val wins = seqs.select(col("doc_id"),
      posexplode(expr(s"graft_span_hashes(tokens, $winLen, $stride)"))
        .as(Seq("j", "h")))
    val removable = wins
      .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("n_win"))
      .withColumn("n_docs", count(lit(1)).over(byH))
      .withColumn("owner", min(col("doc_id")).over(byH))
      .filter(col("n_docs") >= 2 && col("doc_id") =!= col("owner"))
      .select(col("h"), col("doc_id"))
    val starts = wins.join(removable, Seq("h", "doc_id"))
      .select(col("doc_id"), (col("j").cast("long") * stride).as("s"))
      .groupBy(col("doc_id"))
      .agg(expr("array_sort(collect_set(s))").as("starts"))
    seqs.join(starts, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tok"),
        expr(s"""graft_span_excise(tokens,
                |  coalesce(starts, CAST(array() AS ARRAY<BIGINT>)),
                |  $winLen)""".stripMargin).as("tokens_clean"))
      .select(col("doc_id"), col("n_tok"),
        size(col("tokens_clean")).as("n_kept"), col("tokens_clean"))
  }

  /** DuckDB mirror of [[spanRemove]] (prelude binds `seqs`, no leading
    * WITH). The rewrite is derived independently: exploded positions
    * anti-joined against the exploded coverage set, re-listed in
    * position order. */
  def duckSpanRemoveSql(prelude: String, winLen: Int, stride: Int): String =
    s"""WITH $prelude,
       |${duckSpanWindowsCte(winLen, stride)},
       |wf AS MATERIALIZED (
       |  SELECT doc_id, CAST(j * $stride AS BIGINT) AS s, h FROM wcte),
       |own AS (
       |  SELECT h, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS owner
       |  FROM wf GROUP BY 1),
       |rem AS (
       |  SELECT DISTINCT wf.doc_id, wf.s
       |  FROM wf JOIN own USING (h)
       |  WHERE own.n_docs >= 2 AND wf.doc_id <> own.owner),
       |remu AS (SELECT doc_id, s, unnest(range(CAST($winLen AS BIGINT))) AS u
       |         FROM rem),
       |cov AS (SELECT DISTINCT doc_id, s + u AS p FROM remu),
       |toks AS (
       |  SELECT doc_id, generate_subscripts(tokens, 1) - 1 AS i,
       |         unnest(tokens) AS t
       |  FROM seqs),
       |kept AS (
       |  SELECT k.doc_id, CAST(count(*) AS INTEGER) AS n_kept,
       |         list(k.t ORDER BY k.i) AS tokens_clean
       |  FROM toks k LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.p = k.i
       |  WHERE c.p IS NULL
       |  GROUP BY k.doc_id)
       |SELECT s2.doc_id, s2.n_tok,
       |  coalesce(kept.n_kept, 0) AS n_kept,
       |  coalesce(kept.tokens_clean, CAST([] AS INTEGER[])) AS tokens_clean
       |FROM seqs s2 LEFT JOIN kept USING (doc_id)""".stripMargin

  /** Vectorized window-hash CTE fragment shared by [[duckSpanDupSql]] /
    * [[duckSpanRemoveSql]]: yields `wcte` = (doc_id, j, h) — the 60-bit
    * md5 prefix of each strided window's space-joined token rendering —
    * computed from unnested position ROWS (each position expands to its
    * ≤ winLen/stride covering window ids; one grouped ordered
    * `string_agg` + md5 per window). The original per-window
    * `list_transform(…, j -> md5(array_to_string(tokens[slice], ' ')))`
    * lambda paid interpreted slice + render per window — 38 s of the
    * gate replay for span_dedup alone; this form is the identical hash
    * at ~4.6× less (measured bitwise-equal). */
  private def duckSpanWindowsCte(winLen: Int, stride: Int): String = {
    val span = winLen / stride
    s"""sp_toks AS (
       |  SELECT s.doc_id, generate_subscripts(s.tokens, 1) AS i,
       |    unnest(s.tokens) AS t,
       |    CAST((s.n_tok - $winLen) // $stride AS BIGINT) AS jmax
       |  FROM seqs s WHERE s.n_tok >= $winLen),
       |sp_pos2win AS (
       |  SELECT doc_id, (i - 1) // $stride - d AS j, i, t
       |  FROM sp_toks, (SELECT unnest(range($span)) AS d)
       |  WHERE (i - 1) // $stride - d BETWEEN 0 AND jmax
       |    AND i BETWEEN ((i - 1) // $stride - d) * $stride + 1
       |              AND ((i - 1) // $stride - d) * $stride + $winLen),
       |wcte AS MATERIALIZED (
       |  SELECT doc_id, j,
       |    CAST(('0x' || substr(md5(
       |        string_agg(CAST(t AS VARCHAR), ' ' ORDER BY i)), 1, 15))
       |      AS BIGINT) AS h
       |  FROM sp_pos2win GROUP BY doc_id, j)""".stripMargin
  }

  /** DuckDB mirror of [[spanDupStats]] over a `seqs` CTE body bound by
    * `prelude` (no leading WITH). */
  def duckSpanDupSql(prelude: String, winLen: Int, stride: Int): String =
    s"""WITH $prelude,
       |${duckSpanWindowsCte(winLen, stride)},
       |df AS (
       |  SELECT h, count(*) AS n_docs
       |  FROM (SELECT DISTINCT doc_id, h FROM wcte) GROUP BY 1)
       |SELECT wcte.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_windows,
       |  CAST(sum(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup,
       |  CAST(sum(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS dup_frac
       |FROM wcte JOIN df USING (h)
       |GROUP BY wcte.doc_id""".stripMargin

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the MOSS
    * scheme; see [[graft.functions.expressions.WinnowKeys]] for the
    * selection rule and packed-key layout): per-doc summary of the
    * selected fingerprint set — selection count, distinct fingerprints,
    * an order-free XOR digest, and the position sum. The four integer
    * aggregates pin the exact selection set without dumping the ~2/(w+1)
    * density per-position rows at gate scale.
    *
    * Plan: narrow kernel projection → explode (ids + packed key only) →
    * one doc-keyed partial agg. At 100 TB the explode carries no token
    * payload and the aggregate is map-side combined per doc — one
    * exchange on doc_id. */
  def winnowStats(seqs: DataFrame, k: Int, w: Int): DataFrame =
    seqs
      .select(col("doc_id"),
        explode(expr(s"graft_winnow(tokens, $k, $w)")).as("key"))
      .select(col("doc_id"),
        expr("CAST(8192 - (key % 8192) AS INT)").as("pos"),
        expr("key DIV 8192").as("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"),
        countDistinct(col("fp")).as("n_distinct_fp"),
        expr("bit_xor(fp)").as("fp_xor"),
        sum(col("pos").cast("long")).as("pos_sum"))

  /** Cross-document near-dup signal over winnowed fingerprints: a
    * fingerprint is DUPLICATED when selected by ≥ 2 documents; each doc
    * reports its selection count, duplicated-selection count, and
    * duplicated fraction — [[spanDupStats]] semantics with the winnowing
    * guarantee (any shared run ≥ k+w−1 tokens is caught; strided spans
    * miss runs straddling stride boundaries) at ~2/(w+1) the window
    * volume of stride-1 hashing.
    *
    * Same STRAIGHT pipeline as [[spanDupStats]]: ids-only explode →
    * per-(fp, doc) partial agg → doc-frequency as a window over the
    * deduplicated table (bounded by distinct docs per fingerprint, never
    * raw occurrences) → doc-keyed agg. */
  def winnowDupStats(seqs: DataFrame, k: Int, w: Int): DataFrame = {
    val perDocFp = seqs
      .select(col("doc_id"),
        expr(s"graft_winnow(tokens, $k, $w)").as("keys"))
      .select(col("doc_id"), explode(col("keys")).as("key"))
      .select(col("doc_id"), expr("key DIV 8192").as("fp"))
      .groupBy(col("fp"), col("doc_id")).agg(count(lit(1)).as("n_sel"))
    perDocFp
      .withColumn("n_docs", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_sel")).as("n_fp"),
        sum(when(col("n_docs") >= 2, col("n_sel")).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        col("n_dup").cast("double") / col("n_fp").cast("double"))
  }

  /** Shared DuckDB winnowing CTE chain: binds `fps(doc_id, pos, fp)` —
    * the mirror of [[graft.functions.expressions.WinnowKeys]] decoded.
    * The k-gram identity is the vectorized zip-slice arithmetic of
    * [[duckDupNgramsSql]]; the sliding minimum is a frame window with the
    * same packed tie-break key, QUALIFY-restricted to valid window starts
    * (`j ≤ greatest(m − w, 0)` keeps the single truncated window of short
    * docs). */
  private def duckWinnowCtes(prelude: String, k: Int, w: Int): String = {
    require(k >= 1 && k <= 4, s"winnow k must be 1..4, got $k")
    val slices = (1 to k)
      .map(i => s"tokens[$i:-${k - i + 1}]").mkString(", ")
    val gram = (2 to k).foldLeft("(z[1] + 2048)::BIGINT") {
      (acc, i) => s"($acc * 4096 + (z[$i] + 2048))"
    }
    s"""$prelude,
       |g AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(n_tok AS BIGINT) - $k + 1 AS m,
       |    unnest(range(CAST(n_tok AS BIGINT) - $k + 1)) AS j,
       |    unnest(list_transform(list_zip($slices),
       |      z -> (($gram % 1000000007) * 999999937) % 1000000007)) AS fp
       |  FROM seqs WHERE n_tok >= $k),
       |wm AS (
       |  SELECT doc_id,
       |    min(fp * 8192 + (8191 - j)) OVER (PARTITION BY doc_id ORDER BY j
       |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS wkey
       |  FROM g
       |  QUALIFY j <= greatest(m - $w, 0)),
       |sel AS (SELECT DISTINCT doc_id, wkey FROM wm),
       |fps AS (
       |  SELECT doc_id, CAST(8192 - (wkey % 8192) AS INT) AS pos,
       |    wkey // 8192 AS fp
       |  FROM sel)""".stripMargin
  }

  /** DuckDB mirror of [[winnowStats]]. */
  def duckWinnowStatsSql(prelude: String, k: Int, w: Int): String =
    s"""WITH ${duckWinnowCtes(prelude, k, w)}
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_fp,
       |  CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
       |  CAST(bit_xor(fp) AS BIGINT) AS fp_xor,
       |  CAST(sum(pos) AS BIGINT) AS pos_sum
       |FROM fps GROUP BY doc_id""".stripMargin

  /** DuckDB mirror of [[winnowDupStats]]. */
  def duckWinnowDupSql(prelude: String, k: Int, w: Int): String =
    s"""WITH ${duckWinnowCtes(prelude, k, w)},
       |pdf AS (SELECT fp, doc_id, count(*) AS n_sel FROM fps GROUP BY 1, 2),
       |df AS (SELECT fp, count(*) AS n_docs FROM pdf GROUP BY 1)
       |SELECT pdf.doc_id,
       |  CAST(sum(pdf.n_sel) AS BIGINT) AS n_fp,
       |  CAST(sum(CASE WHEN df.n_docs >= 2 THEN pdf.n_sel ELSE 0 END)
       |    AS BIGINT) AS n_dup,
       |  CAST(sum(CASE WHEN df.n_docs >= 2 THEN pdf.n_sel ELSE 0 END)
       |    AS DOUBLE) / CAST(sum(pdf.n_sel) AS DOUBLE) AS dup_frac
       |FROM pdf JOIN df USING (fp)
       |GROUP BY pdf.doc_id""".stripMargin

  /** DuckDB mirror of [[duplicatedNgramStats]] for k = 4 (vectorized
    * 4-slice zip — per-gram string lambdas are ~1000× slower there). */
  def duckDupNgramsSql(seqsSql: String): String =
    s"""WITH seqs AS ($seqsSql),
       |inst AS MATERIALIZED (
       |  SELECT doc_id,
       |    ((((z[1] + 2048)::BIGINT * 4096 + (z[2] + 2048)) * 4096
       |       + (z[3] + 2048)) * 4096 + (z[4] + 2048)) AS gram
       |  FROM (SELECT doc_id,
       |          unnest(list_zip(tokens[1:-4], tokens[2:-3],
       |                          tokens[3:-2], tokens[4:-1])) AS z
       |        FROM seqs)),
       |pdg AS (SELECT doc_id, gram, count(*) AS n_occ FROM inst GROUP BY 1, 2),
       |df AS (SELECT gram, count(*) AS n_docs FROM pdg GROUP BY 1)
       |SELECT pdg.doc_id,
       |  CAST(sum(pdg.n_occ) AS BIGINT) AS n_grams,
       |  CAST(sum(CASE WHEN df.n_docs >= 2 THEN pdg.n_occ ELSE 0 END) AS BIGINT)
       |    AS n_dup,
       |  CAST(sum(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_distinct,
       |  CAST(sum(CASE WHEN df.n_docs >= 2 THEN pdg.n_occ ELSE 0 END) AS DOUBLE)
       |    / CAST(sum(pdg.n_occ) AS DOUBLE) AS dup_frac
       |FROM pdg JOIN df USING (gram)
       |GROUP BY pdg.doc_id""".stripMargin

  /** Word-trigram Jaccard over candidate pairs blocked by `source` (exact
    * verifier; at scale feed it LSH candidates instead of the block join). */
  def ngramJaccard(documents0: DataFrame, minJaccard: Double): DataFrame = {
    val documents = graft.core.Partitioning.balance(documents0, "doc_id")
    val tri = documents
      .withColumn("words", expr(TextAnalysis.wordsExpr))
      .select(col("doc_id"), col("source"), expr(
        """CASE WHEN size(words) >= 3 THEN
          |  array_distinct(transform(sequence(0, size(words) - 3),
          |    i -> concat(words[i], ' ', words[i + 1], ' ', words[i + 2])))
          |ELSE array() END""".stripMargin).as("tris"))
      .select(col("doc_id"), col("source"), size(col("tris")).as("n_tri"),
        explode(col("tris")).as("tri"))
    val a = tri.as("a"); val b = tri.as("b")
    a.join(b,
        col("a.source") === col("b.source") &&
        col("a.tri") === col("b.tri") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_tri").as("na"), col("b.n_tri").as("nb"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        expr("CAST(common AS DOUBLE) / (na + nb - common)"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("common"), col("jaccard"))
  }

  /** N-gram Jaccard over a GIVEN candidate-pair set (the scale entry point:
    * feed it LSH candidates — verification cost is O(|pairs|), never
    * quadratic). `docs` must carry (doc_id, text). */
  def ngramJaccardPairs(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val tri = docs
      .withColumn("words", expr(TextAnalysis.wordsExpr))
      .select(col("doc_id"), expr(
        """CASE WHEN size(words) >= 3 THEN
          |  array_distinct(transform(sequence(0, size(words) - 3),
          |    i -> concat(words[i], ' ', words[i + 1], ' ', words[i + 2])))
          |ELSE array() END""".stripMargin).as("tris"))
    pairs
      .join(tri.select(col("doc_id").as("doc_a"), col("tris").as("ta")), Seq("doc_a"))
      .join(tri.select(col("doc_id").as("doc_b"), col("tris").as("tb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(expr("array_intersect(ta, tb)")).as("common"),
        size(col("ta")).as("na"), size(col("tb")).as("nb"))
      .withColumn("jaccard", expr(
        "IF(na + nb - common = 0, CAST(0.0 AS DOUBLE), CAST(common AS DOUBLE) / (na + nb - common))"))
  }

  /** DuckDB mirror of [[ngramJaccardPairs]] (docs = formatted-id view of
    * `documents`, pairsSql = a full SELECT yielding (doc_a, doc_b)). */
  def duckNgramPairsSql(pairsSql: String, docsWhere: String = ""): String =
    s"""WITH docs AS (
       |  SELECT 'd' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS doc_id, text
       |  FROM documents${if (docsWhere.isEmpty) "" else s" WHERE $docsWhere"}),
       |w AS (SELECT doc_id, ${TextAnalysis.duckWordsExpr} AS words FROM docs),
       |t AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN len(words) >= 3 THEN
       |      list_distinct(list_transform(range(CAST(len(words) - 2 AS BIGINT)),
       |        i -> concat(words[i + 1], ' ', words[i + 2], ' ', words[i + 3])))
       |    ELSE [] END AS tris
       |  FROM w),
       |pairs AS MATERIALIZED ($pairsSql)
       |SELECT p.doc_a, p.doc_b,
       |  CAST(len(list_intersect(a.tris, b.tris)) AS INTEGER) AS common,
       |  CAST(len(a.tris) AS INTEGER) AS na,
       |  CAST(len(b.tris) AS INTEGER) AS nb,
       |  CASE WHEN len(a.tris) + len(b.tris) - len(list_intersect(a.tris, b.tris)) = 0
       |       THEN CAST(0.0 AS DOUBLE)
       |       ELSE CAST(len(list_intersect(a.tris, b.tris)) AS DOUBLE)
       |            / (len(a.tris) + len(b.tris) - len(list_intersect(a.tris, b.tris)))
       |  END AS jaccard
       |FROM pairs p
       |JOIN t a ON a.doc_id = p.doc_a
       |JOIN t b ON b.doc_id = p.doc_b""".stripMargin

  def duckNgramSql(minJaccard: Double): String =
    s"""WITH w AS (
       |  SELECT doc_id, source, ${TextAnalysis.duckWordsExpr} AS words
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, source,
       |    CASE WHEN len(words) >= 3 THEN
       |      list_distinct(list_transform(range(CAST(len(words) - 2 AS BIGINT)),
       |        i -> concat(words[i + 1], ' ', words[i + 2], ' ', words[i + 3])))
       |    ELSE [] END AS tris
       |  FROM w),
       |e AS (
       |  SELECT doc_id, source, len(tris) AS n_tri, unnest(tris) AS tri FROM t),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.n_tri AS na, b.n_tri AS nb, count(*) AS common
       |  FROM e a JOIN e b
       |    ON a.source = b.source AND a.tri = b.tri AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |SELECT doc_a, doc_b, common,
       |       CAST(common AS DOUBLE) / (na + nb - common) AS jaccard
       |FROM pairs
       |WHERE CAST(common AS DOUBLE) / (na + nb - common) >= $minJaccard""".stripMargin

  /** Token-shingle CONTAINMENT scores over a given candidate-pair set:
    * `containment_a = |A∩B| / |A|` and the mirror `containment_b` — the
    * asymmetric near-dup measure Jaccard misses (a short doc fully quoted
    * inside a long one scores containment ≈ 1 while Jaccard stays small;
    * the planted near-dup pairs differ exactly this way, by silence runs
    * and length). Shingles are distinct packed 3-grams
    * ([[graft.functions.expressions.PackNgrams]]); verification cost is
    * O(|pairs|) like [[ngramJaccardPairs]] — feed it LSH candidates,
    * never all pairs. */
  def containmentPairs(seqs: DataFrame, pairs: DataFrame): DataFrame = {
    graft.functions.expressions.register(seqs.sparkSession)
    val sh = seqs.select(col("doc_id"),
      expr("array_distinct(graft_pack_ngrams(tokens, 3))").as("sh"))
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sa")),
        Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(expr("array_intersect(sa, sb)")).as("common"),
        size(col("sa")).as("na"), size(col("sb")).as("nb"))
      .withColumn("containment_a", expr(
        "IF(na = 0, CAST(0.0 AS DOUBLE), CAST(common AS DOUBLE) / na)"))
      .withColumn("containment_b", expr(
        "IF(nb = 0, CAST(0.0 AS DOUBLE), CAST(common AS DOUBLE) / nb)"))
  }

  /** DuckDB mirror of [[containmentPairs]]. `seqsPrelude` binds the
    * `seqs` CTE body (no leading WITH); `pairsSql` yields
    * (doc_a, doc_b). */
  def duckContainmentPairsSql(seqsPrelude: String, pairsSql: String): String =
    // CTE named `shingles` (NOT `sh`): the nested minhash pairs SQL has
    // its own `sh` CTE, and a collision re-binds the inner reference to
    // the outer table (DuckDB resolved `hs` against this CTE's column)
    s"""WITH $seqsPrelude,
       |shingles AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_distinct(list_transform(
       |      range(CAST(greatest(len(tokens) - 2, 0) AS BIGINT)),
       |      i -> ((tokens[i + 1] + 2048)::BIGINT * 4096
       |            + (tokens[i + 2] + 2048)) * 4096
       |            + (tokens[i + 3] + 2048))) AS sh
       |  FROM seqs),
       |pairs AS MATERIALIZED ($pairsSql)
       |SELECT p.doc_a, p.doc_b,
       |  CAST(len(list_intersect(a.sh, b.sh)) AS INTEGER) AS common,
       |  CAST(len(a.sh) AS INTEGER) AS na,
       |  CAST(len(b.sh) AS INTEGER) AS nb,
       |  CASE WHEN len(a.sh) = 0 THEN CAST(0.0 AS DOUBLE)
       |       ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |            / len(a.sh) END AS containment_a,
       |  CASE WHEN len(b.sh) = 0 THEN CAST(0.0 AS DOUBLE)
       |       ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |            / len(b.sh) END AS containment_b
       |FROM pairs p
       |JOIN shingles a ON a.doc_id = p.doc_a
       |JOIN shingles b ON b.doc_id = p.doc_b""".stripMargin

  /** Token-shingle Jaccard over a given candidate-pair set: the
    * [[containmentPairs]] counts plus the symmetric
    * `jaccard = common / (na + nb − common)` — the token-space sibling of
    * the word-trigram [[ngramJaccardPairs]]. O(pairs). */
  def shingleJaccardPairs(seqs: DataFrame, pairs: DataFrame): DataFrame =
    containmentPairs(seqs, pairs)
      .withColumn("jaccard", expr(
        """IF(na + nb - common = 0, CAST(0.0 AS DOUBLE),
          |   CAST(common AS DOUBLE) / (na + nb - common))""".stripMargin))

  /** Token-level edit-distance verification over a GIVEN candidate-pair
    * set — the exact ALIGNMENT measure next to the set-based verifiers
    * ([[ngramJaccardPairs]], [[containmentPairs]]): Levenshtein distance
    * on the first `prefixW` tokens of each side plus the normalized
    * similarity `1 − dist / max(len)`. Shingle measures score a shuffled
    * bag of the same n-grams as a perfect duplicate; edit distance is the
    * order-sensitive check that separates true near-copies (small token
    * edits, the planted silence-run variants) from coincidental shingle
    * overlap.
    *
    * Scale: cost is O(|pairs| · prefixW²) with the full DP — feed it LSH
    * candidates only, never all pairs; `prefixW` bounds the per-pair cost
    * regardless of document length (the Gopher-style head-window
    * convention). The production dial is the banded kernel
    * ([[graft.functions.expressions.TokenEditDistance]] with `cap > 0`,
    * O(cap·prefixW) per pair, capped-at-`cap+1` contract); the full-DP
    * form here is bitwise-checked against DuckDB and is the band's
    * correctness oracle (OpsSpec). Pair payload through the joins is ids
    * + two clipped prefixes; nothing corpus-sized shuffles. */
  def editDistancePairs(seqs: DataFrame, pairs: DataFrame,
      prefixW: Int): DataFrame = {
    graft.functions.expressions.register(seqs.sparkSession)
    val pre = seqs.select(col("doc_id"),
      expr(s"slice(tokens, 1, $prefixW)").as("pre"))
    pairs
      .join(pre.select(col("doc_id").as("doc_a"), col("pre").as("pa")),
        Seq("doc_a"))
      .join(pre.select(col("doc_id").as("doc_b"), col("pre").as("pb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(col("pa")).as("len_a"), size(col("pb")).as("len_b"),
        expr("graft_edit_distance(pa, pb, 0)").as("edit_dist"))
      .withColumn("edit_sim", expr(
        """IF(greatest(len_a, len_b) = 0, CAST(1.0 AS DOUBLE),
          |   CAST(1.0 AS DOUBLE)
          |     - CAST(edit_dist AS DOUBLE) / greatest(len_a, len_b))"""
          .stripMargin))
  }

  /** DuckDB mirror of [[editDistancePairs]]. DuckDB's `levenshtein` is
    * byte-based (a 3-byte UTF-8 codepoint counts as 3 edits), so token
    * arrays cannot be chr-mapped through it; instead the DP itself runs
    * as a recursive CTE using the prefix-min reformulation of the row
    * recurrence — `new[j] = j + min_{k ≤ j}(D[k] − k)` with
    * `D[k] = min(prev[k]+1, prev[k−1]+cost)` — which turns the
    * left-to-right in-row dependency into ONE window prefix-min per
    * iteration (n iterations of |pairs|·(prefixW+1) rows). Same integer
    * DP, same final one-subtract-one-divide similarity. */
  def duckEditDistancePairsSql(seqsPrelude: String, pairsSql: String,
      prefixW: Int): String =
    s"""WITH RECURSIVE $seqsPrelude,
       |pre AS MATERIALIZED (
       |  SELECT doc_id, tokens[1:$prefixW] AS pre FROM seqs),
       |cand AS MATERIALIZED ($pairsSql),
       |pt AS MATERIALIZED (
       |  SELECT c.doc_a, c.doc_b, a.pre AS pa, b.pre AS pb,
       |         len(a.pre) AS la, len(b.pre) AS lb
       |  FROM cand c
       |  JOIN pre a ON a.doc_id = c.doc_a
       |  JOIN pre b ON b.doc_id = c.doc_b),
       |dp AS (
       |  SELECT doc_a, doc_b, 0 AS i, CAST(j AS BIGINT) AS j,
       |         CAST(j AS BIGINT) AS v
       |  FROM pt, unnest(range(0, lb + 1)) t(j)
       |  UNION ALL
       |  SELECT doc_a, doc_b, i + 1, j,
       |    j + min(d - j) OVER (PARTITION BY doc_a, doc_b ORDER BY j
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |  FROM (
       |    SELECT dp.doc_a, dp.doc_b, dp.i, dp.j,
       |      CASE WHEN dp.j = 0 THEN dp.v + 1
       |           ELSE least(dp.v + 1,
       |             lag(dp.v) OVER (PARTITION BY dp.doc_a, dp.doc_b
       |                             ORDER BY dp.j)
       |               + CASE WHEN pt.pa[CAST(dp.i + 1 AS INTEGER)]
       |                           = pt.pb[CAST(dp.j AS INTEGER)]
       |                      THEN 0 ELSE 1 END)
       |      END AS d
       |    FROM dp
       |    JOIN pt ON pt.doc_a = dp.doc_a AND pt.doc_b = dp.doc_b
       |    WHERE dp.i < pt.la) s(doc_a, doc_b, i, j, d))
       |SELECT p.doc_a, p.doc_b,
       |  CAST(p.la AS INTEGER) AS len_a, CAST(p.lb AS INTEGER) AS len_b,
       |  CAST(d.v AS INTEGER) AS edit_dist,
       |  CASE WHEN greatest(p.la, p.lb) = 0 THEN CAST(1.0 AS DOUBLE)
       |       ELSE CAST(1.0 AS DOUBLE)
       |            - CAST(d.v AS DOUBLE) / greatest(p.la, p.lb)
       |  END AS edit_sim
       |FROM dp d
       |JOIN pt p ON p.doc_a = d.doc_a AND p.doc_b = d.doc_b
       |WHERE d.i = p.la AND d.j = p.lb""".stripMargin

  /** Frozen-corpus LSH band index: one (doc_id, band_id, band_hash) row per
    * band per doc — the table a production pipeline PERSISTS once (ids +
    * two small ints, never the tokens) and probes with every new crawl
    * batch. Narrow per-row pass ([[minhash]] + posexplode), no shuffle. */
  def bandIndex(seqs: DataFrame): DataFrame =
    minhash(seqs).select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_id", "band_hash")))

  /** Incremental candidates: NEW batch docs colliding with the frozen
    * index on any band bucket. The batch band table is BROADCAST (a crawl
    * batch is small next to the corpus), so the corpus-scale index is
    * probed in place — zero exchange on the big side; only the candidate
    * id pairs (bounded by batch size × bucket occupancy) shuffle for the
    * distinct. Contrast [[lshCandidates]], which self-joins the whole
    * corpus — right for the initial build, wasteful per increment. */
  def incrementalCandidates(index: DataFrame, batchSeqs: DataFrame): DataFrame = {
    val probe = broadcast(
      bandIndex(batchSeqs).withColumnRenamed("doc_id", "batch_doc"))
    index.join(probe, Seq("band_id", "band_hash"))
      .filter(col("doc_id") =!= col("batch_doc"))
      .select(col("batch_doc"), col("doc_id").as("corpus_doc"))
      .distinct()
  }

  /** Incremental near-dup screen: per NEW batch doc, the keep/drop verdict
    * against the frozen corpus — n verified matches (token-shingle Jaccard
    * ≥ `minJaccard` from the [[containmentPairs]] counts — the SAME token
    * space the band index hashes, O(candidates) only), the best match and
    * its score (rank = jaccard DESC, corpus doc ASC — a total order, so
    * the verdict is rerun-stable). Docs with no match survive with
    * `is_dup = false` — the screen's output is the whole batch, ready to
    * append to the corpus + index.
    *
    * Reference analog: the crawler re-scans only changed files against the
    * existing pool (`Source/Crawler/Source/Crawler.cpp:934-998`); this is
    * the same increment-vs-frozen-state contract at corpus scale. */
  def incrementalScreen(corpusSeqs: DataFrame, batchSeqs: DataFrame,
                        minJaccard: Double): DataFrame =
    incrementalScreenWith(bandIndex(corpusSeqs), corpusSeqs, batchSeqs,
      minJaccard)

  /** [[incrementalScreen]] against a PREBUILT band index (the persisted
    * table a production pipeline maintains — tokens are never re-hashed
    * per increment; `corpusSeqs` is consulted only to re-fetch the
    * candidates' tokens for the verify step). */
  def incrementalScreenWith(index: DataFrame, corpusSeqs: DataFrame,
                            batchSeqs: DataFrame,
                            minJaccard: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = incrementalCandidates(index, batchSeqs)
      .select(col("batch_doc").as("doc_a"), col("corpus_doc").as("doc_b"))
    // verify re-fetches tokens by id from BOTH sides (the candidate
    // shuffle carried ids only); sides may carry different extra columns
    val toks = (d: DataFrame) => d.select(col("doc_id"), col("tokens"))
    val verified = shingleJaccardPairs(
      toks(batchSeqs).unionByName(toks(corpusSeqs)), cand)
      .filter(col("jaccard") >= minJaccard)
    // the verified pair set is candidate-sized (not corpus-sized), so the
    // per-batch-doc rank window is a cheap post-verify pass
    val w = Window.partitionBy(col("doc_a"))
      .orderBy(col("jaccard").desc, col("doc_b"))
    val agg = verified.withColumn("rk", row_number().over(w))
      .groupBy(col("doc_a").as("batch_doc"))
      .agg(count(lit(1)).as("n_matches"),
        max(when(col("rk") === 1, col("doc_b"))).as("best_match"),
        max(when(col("rk") === 1, col("jaccard"))).as("best_jaccard"))
    batchSeqs.select(col("doc_id").as("batch_doc"))
      .join(agg, Seq("batch_doc"), "left_outer")
      .select(col("batch_doc"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        (coalesce(col("n_matches"), lit(0L)) > 0).as("is_dup"),
        col("best_match"), col("best_jaccard"))
  }

  /** DuckDB mirror of [[incrementalScreen]]. `seqsPrelude` binds the
    * `seqs` CTE body over the UNION of corpus + batch (minhash is per-doc,
    * so one pass then a split-by-predicate is identical to two passes);
    * `batchPred`/`corpusPred` select each side by formatted doc id;
    * `rawBatchPred` is the batch split on the raw `documents` table. */
  def duckIncrementalSql(seqsPrelude: String, batchPred: String,
                         corpusPred: String, rawBatchPred: String,
                         minJaccard: Double): String = {
    val candSql =
      s"""WITH mh AS MATERIALIZED (${duckMinhashSql(seqsPrelude)}),
         |bx AS MATERIALIZED (
         |  SELECT doc_id, unnest(bands) AS band_hash,
         |         generate_subscripts(bands, 1) - 1 AS band_id
         |  FROM mh)
         |SELECT DISTINCT bb.doc_id AS doc_a, bc.doc_id AS doc_b
         |FROM bx bc JOIN bx bb
         |  ON bc.band_id = bb.band_id AND bc.band_hash = bb.band_hash
         |WHERE (${batchPred.replace("doc_id", "bb.doc_id")})
         |  AND (${corpusPred.replace("doc_id", "bc.doc_id")})
         |  AND bc.doc_id <> bb.doc_id""".stripMargin
    s"""WITH verified AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT doc_a, doc_b, common, na, nb,
       |      CASE WHEN na + nb - common = 0 THEN CAST(0.0 AS DOUBLE)
       |           ELSE CAST(common AS DOUBLE) / (na + nb - common)
       |      END AS jaccard
       |    FROM (${duckContainmentPairsSql(seqsPrelude, candSql)}) v) vv
       |  WHERE vv.jaccard >= $minJaccard),
       |ranked AS (
       |  SELECT doc_a, doc_b, jaccard,
       |         row_number() OVER (PARTITION BY doc_a
       |                            ORDER BY jaccard DESC, doc_b) AS rk
       |  FROM verified),
       |agg AS (
       |  SELECT doc_a AS batch_doc, count(*) AS n_matches,
       |         max(CASE WHEN rk = 1 THEN doc_b END) AS best_match,
       |         max(CASE WHEN rk = 1 THEN jaccard END) AS best_jaccard
       |  FROM ranked GROUP BY 1),
       |batch AS (
       |  SELECT 'd' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS batch_doc
       |  FROM documents WHERE $rawBatchPred)
       |SELECT b.batch_doc,
       |       coalesce(a.n_matches, CAST(0 AS BIGINT)) AS n_matches,
       |       coalesce(a.n_matches, CAST(0 AS BIGINT)) > 0 AS is_dup,
       |       a.best_match, a.best_jaccard
       |FROM batch b LEFT JOIN agg a ON a.batch_doc = b.batch_doc""".stripMargin
  }
}
