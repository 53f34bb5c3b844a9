package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pattern redaction — the PII-scrubbing stage of a curation pipeline:
  * sequentially count and mask rule patterns (email / IPv4 / phone by
  * default) in every document, emitting per-rule match counts plus the
  * redacted text's length and md5 (the full-text equality witness without
  * dumping text through the oracle compare).
  *
  * Engine-portability: rules are written in the regex intersection of
  * Java's engine (Spark) and RE2 (DuckDB) — character classes, bounded
  * repetition, `\b`, no backrefs/lookaround — so counts and replacements
  * are identical. Rules apply IN ORDER, each counting against the text
  * state its predecessors produced (a later rule never re-matches inside
  * an earlier rule's mask token).
  *
  * Scale: one codegen'd projection per rule over the scan — narrow, no
  * shuffle, no UDF; cost is linear in corpus bytes like every other
  * text-analysis pass.
  *
  * Reference analog: the crawler normalizes/sanitizes descriptor strings
  * before persisting (`SqliteSampleDescriptorPool.cpp:1164-1210` path
  * rewriting); redaction is the text-corpus counterpart of rewriting
  * matched spans to canonical tokens. */
object Redact {

  /** A redaction rule: RE2-compatible `pattern` rewritten to `token`;
    * `name` labels the count column `n_<name>`. */
  final case class Rule(name: String, pattern: String, token: String)

  val Default: Seq[Rule] = Seq(
    Rule("email", "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]{2,4}", "<EMAIL>"),
    Rule("ipv4",
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    Rule("phone", "\\+[0-9]{7,12}", "<PHONE>"))

  /** Redact `docs.text`: per rule (in order) count-then-mask. Output:
    * (doc_id, n_<rule>..., redacted_len, redacted_md5). */
  def redact(docs: DataFrame, rules: Seq[Rule] = Default): DataFrame = {
    val masked = rules.foldLeft(docs) { (d, r) =>
      d.withColumn(s"n_${r.name}", regexp_count(col("text"), lit(r.pattern)))
        .withColumn("text", regexp_replace(col("text"), r.pattern, r.token))
    }
    masked.select((Seq(col("doc_id")) ++
      rules.map(r => col(s"n_${r.name}")) ++
      Seq(length(col("text")).as("redacted_len"),
        md5(col("text")).as("redacted_md5"))): _*)
  }

  /** Deterministic synthetic PII injection (both engines build the same
    * string): appends an email to every doc_id % 3 = 0, an IPv4 to % 5 =
    * 0, a phone to % 7 = 0 — so the redaction oracle has real matches in
    * an otherwise PII-free synthetic corpus. */
  def injectPii(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" user"), col("doc_id").cast("string"), lit("@mail"),
          (col("doc_id") % 7).cast("string"), lit(".com")))
        .otherwise(""),
      when(col("doc_id") % 5 === 0,
        concat(lit(" 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), (col("doc_id") % 100).cast("string")))
        .otherwise(""),
      when(col("doc_id") % 7 === 0,
        concat(lit(" +49"), (col("doc_id") + 1000000).cast("string")))
        .otherwise("")))

  /** DuckDB mirror of [[injectPii]] |> [[redact]](Default) over the
    * documents table. */
  def duckSql(rules: Seq[Rule] = Default): String = {
    val inject =
      s"""SELECT doc_id, text
         |  || CASE WHEN doc_id % 3 = 0 THEN ' user' || CAST(doc_id AS VARCHAR)
         |       || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.com'
         |     ELSE '' END
         |  || CASE WHEN doc_id % 5 = 0 THEN ' 10.' || CAST(doc_id % 256 AS VARCHAR)
         |       || '.0.' || CAST(doc_id % 100 AS VARCHAR)
         |     ELSE '' END
         |  || CASE WHEN doc_id % 7 = 0 THEN ' +49' || CAST(doc_id + 1000000 AS VARCHAR)
         |     ELSE '' END AS text
         |FROM documents""".stripMargin
    val sb = new StringBuilder(s"WITH t0 AS (\n$inject),\n")
    rules.zipWithIndex.foreach { case (r, i) =>
      sb.append(
        s"""t${i + 1} AS (
           |  SELECT * EXCLUDE (text),
           |    CAST(len(regexp_extract_all(text, '${r.pattern}')) AS INTEGER)
           |      AS n_${r.name},
           |    regexp_replace(text, '${r.pattern}', '${r.token}', 'g') AS text
           |  FROM t$i),
           |""".stripMargin)
    }
    sb.setLength(sb.length - 2)
    sb.append("\n")
    sb.append(s"""SELECT doc_id, ${rules.map(r => s"n_${r.name}").mkString(", ")},
       |  CAST(length(text) AS INTEGER) AS redacted_len,
       |  md5(text) AS redacted_md5
       |FROM t${rules.length}""".stripMargin)
    sb.toString
  }
}
