package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Packing

/** Sequence packing (concat-and-chunk training-window assembly):
  * conservation, contiguity, full-chunk invariants, and invariance to the
  * distributed prefix-sum's bucketing. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val C = 10L

  // lengths chosen to cross chunk boundaries every which way: doc exactly
  // filling a chunk, doc spanning 3 chunks, zero-length doc, 1-token doc
  private def corpus = Seq(
    ("d01", 7), ("d02", 3), ("d03", 10), ("d04", 25), ("d05", 0),
    ("d06", 1), ("d07", 4), ("d08", 12)
  ).toDF("doc_id", "n_tok")

  private def segs = Packing.packChunks(corpus, "doc_id", "n_tok", C, buckets = 3)

  test("packChunks conserves every token of every doc, in order") {
    val perDoc = segs.groupBy("doc_id")
      .agg(sum("seg_len").as("tot"), min("doc_off").as("o0"),
        max(col("doc_off") + col("seg_len")).as("oEnd"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val lens = corpus.collect().map(r => (r.getString(0), r.getInt(1).toLong)).toMap
    for ((d, len) <- lens if len > 0) {
      val (tot, o0, oEnd, _) = perDoc(d)
      assert(tot == len, s"$d total")
      assert(o0 == 0L && oEnd == len, s"$d offsets cover [0,$len)")
    }
    assert(!perDoc.contains("d05"), "zero-length doc emits no segments")
    // intra-doc contiguity: sorted segments tile [0, len)
    val byDoc = segs.orderBy("doc_id", "doc_off")
      .collect().groupBy(_.getString(0))
    for ((d, rows) <- byDoc) {
      var cursor = 0L
      for (r <- rows) {
        assert(r.getLong(2) == cursor, s"$d doc_off contiguous")
        cursor += r.getLong(4)
      }
    }
  }

  test("every chunk except the last is exactly full and tiles [0, C)") {
    val stats = Packing.packStats(segs, C).orderBy("chunk_id").collect()
    val lastChunk = stats.map(_.getLong(0)).max
    for (r <- stats) {
      val (chunk, fill, isFull) = (r.getLong(0), r.getLong(2), r.getInt(5))
      if (chunk < lastChunk) assert(fill == C && isFull == 1, s"chunk $chunk full")
      else assert(fill <= C, "final chunk may be partial")
    }
    // chunk ids are dense 0..last
    assert(stats.map(_.getLong(0)).toSeq == (0L to lastChunk).toSeq)
    // intra-chunk contiguity
    val byChunk = segs.orderBy("chunk_id", "chunk_off")
      .collect().groupBy(_.getLong(1))
    for ((c, rows) <- byChunk) {
      var cursor = 0L
      for (r <- rows) {
        assert(r.getLong(3) == cursor, s"chunk $c chunk_off contiguous")
        cursor += r.getLong(4)
      }
    }
  }

  test("splitWindows: geometry, overlap, partial tail, token fidelity") {
    // win=5, stride=3, minLen=2 over hand-sized docs
    val docs = Seq(
      ("a", (1 to 12).toSeq),   // starts 0,3,6,9 -> lens 5,5,5,3 (all kept)
      ("b", (1 to 4).toSeq),    // starts 0,3    -> lens 4,1 (tail dropped)
      ("c", Seq(7)),            // start 0       -> len 1 < minLen, dropped
      ("d", Seq.empty[Int])     // no windows
    ).map { case (id, t) => (id, t, t.size) }
      .toDF("doc_id", "tokens", "n_tok")
    val got = graft.ops.Packing.splitWindows(docs, 5, 3, 2)
      .orderBy("doc_id", "win_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getSeq[Int](3).toList, r.getInt(4)))
    val exp = Seq(
      ("a", 0, 0, List(1, 2, 3, 4, 5), 5),
      ("a", 1, 3, List(4, 5, 6, 7, 8), 5),
      ("a", 2, 6, List(7, 8, 9, 10, 11), 5),
      ("a", 3, 9, List(10, 11, 12), 3),
      ("b", 0, 0, List(1, 2, 3, 4), 4))
    assert(got.toSeq == exp)
  }

  test("unkRemap: rare tokens collapse to UNK, common survive, empty ok") {
    graft.functions.expressions.register(spark)
    // token 5 appears 6x (common at minCount=3), 9 twice, -7 once (rare)
    val docs = Seq(
      ("a", Seq(5, 9, 5, 5, -7), 5),
      ("b", Seq(5, 5, 9, 5), 4),
      ("c", Seq.empty[Int], 0)
    ).toDF("doc_id", "tokens", "n_tok")
    val got = graft.ops.Tokenizer.unkRemap(docs, 3L, 2047)
      .orderBy("doc_id").collect()
      .map(r => (r.getString(0), r.getSeq[Int](1).toList)).toList
    assert(got == List(
      ("a", List(5, 2047, 5, 5, 2047)),
      ("b", List(5, 5, 2047, 5)),
      ("c", Nil)))
  }

  test("result is invariant to the prefix-sum bucketing") {
    val one = Packing.packChunks(corpus, "doc_id", "n_tok", C, buckets = 1)
    val eight = Packing.packChunks(corpus, "doc_id", "n_tok", C, buckets = 8)
    assert(one.exceptAll(eight).isEmpty && eight.exceptAll(one).isEmpty)
  }

  test("segment map reconstructs the exact concatenated stream") {
    // materialize chunks from the map and compare against a straight
    // in-memory concat-and-chunk of the same corpus order
    val lens = corpus.orderBy("doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    val stream = lens.flatMap { case (d, n) => (0 until n).map(i => (d, i)) }
    val expected = stream.zipWithIndex.groupBy(_._2 / C.toInt).map {
      case (chunk, xs) => chunk.toLong -> xs.map(_._1)
    }
    val got = segs.collect().groupBy(_.getLong(1)).map { case (chunk, rows) =>
      chunk -> rows.sortBy(_.getLong(3)).flatMap { r =>
        val (d, dOff, len) = (r.getString(0), r.getLong(2), r.getLong(4))
        (dOff until dOff + len).map(i => (d, i.toInt))
      }.toSeq
    }
    assert(got.keySet == expected.keySet)
    for ((c, xs) <- expected) assert(got(c) == xs.toSeq, s"chunk $c")
  }
}
