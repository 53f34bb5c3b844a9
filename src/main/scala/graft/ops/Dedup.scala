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

  /** DuckDB mirror of [[minhash]] (expects a `seqs` CTE in `prelude`). */
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
       |sig AS (
       |  SELECT doc_id,
       |    list_transform(range($NumHashes), k ->
       |      coalesce(list_min(list_transform(hs,
       |        h -> (CAST([$aList][k + 1] AS BIGINT) * h
       |              + CAST([$bList][k + 1] AS BIGINT)) % $HashMod)),
       |        $HashMod)) AS sig
       |  FROM sh)
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
}
