package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Packing
import graft.sources.Seqs

/** Oracle-checked queries for the sequence-packing operator family
  * (training-window assembly over the token table). */
object PackingQueries {

  /** Training context-window capacity (tokens per packed chunk). */
  val ChunkCapacity = 512L

  private val duckSeqs = s"seqs AS (${Seqs.duckSql})"

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // concat-and-chunk segment map: which slice of which doc lands where
    // in the fixed-capacity training windows (distributed prefix sum)
    "seq_pack" -> ((s, dir) =>
      Packing.packChunks(Seqs.fromDocuments(s, dir), "doc_id", "n_tok",
        ChunkCapacity)),

    // per-chunk packing report: fill, fragmentation, doc starts — proves
    // every chunk except the last is exactly full
    "pack_stats" -> ((s, dir) =>
      Packing.packStats(
        Packing.packChunks(Seqs.fromDocuments(s, dir), "doc_id", "n_tok",
          ChunkCapacity),
        ChunkCapacity)),

    // within-doc training windows (stride < win -> 25% context overlap),
    // materialized token slices bitwise-checked — the complement of
    // seq_pack's cross-doc dense stream. Array-free driver boundary:
    // each window's token slice rides as an md5 over its canonical CSV
    // (the `seqs_tokens` convention); Packing.splitWindows is the raw
    // array form for specs.
    "seq_split" -> ((s, dir) =>
      Packing.splitWindows(Seqs.fromDocuments(s, dir),
        SplitWin, SplitStride, SplitMinLen)
        .select(col("doc_id"), col("win_id"), col("start"),
          expr("md5(array_join(transform(win_tokens, x -> CAST(x AS STRING)), ','))")
            .as("win_md5"),
          col("win_len")))
  )

  /** seq_split window geometry: 512-token windows every 384 tokens
    * (25 % overlap), final partial window kept at >= 64 tokens. */
  val SplitWin = 512
  val SplitStride = 384
  val SplitMinLen = 64

  def oracles: Map[String, String] = Map(
    "seq_pack" -> Packing.duckPackSql(duckSeqs, ChunkCapacity),
    "pack_stats" -> Packing.duckPackStatsSql(duckSeqs, ChunkCapacity),
    "seq_split" ->
      s"""SELECT doc_id, win_id, start,
         |  md5(array_to_string(win_tokens, ',')) AS win_md5, win_len
         |FROM (${Packing.duckSplitWindowsSql(duckSeqs,
                  SplitWin, SplitStride, SplitMinLen)}) q""".stripMargin
  )
}
