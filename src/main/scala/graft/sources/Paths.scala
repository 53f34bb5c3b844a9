package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Path/string normalization — the analog of the pool's relative/absolute
  * filename rewrites (`SqliteSampleDescriptorPool.cpp:1164-1210`): separator
  * normalization (`\` → `/`), base-path strip for storage, base-path
  * prepend for resolution. Pure built-in column functions (regexp-free
  * `translate`/`startswith`/`substring`) — codegen'd, no UDF.
  */
object Paths {

  /** Normalize separators to `/` (the cross-platform storage form).
    * `translate` is a per-char map — no regex engine, and it mirrors the
    * DuckDB oracle's plain `replace` exactly for single-char patterns. */
  def normalizeSeparators(path: Column): Column =
    translate(path, "\\", "/")

  /** Storage form: separators normalized, `base` prefix stripped when
    * present (`RelativeFilenamePath`). `base` must end with `/`. */
  def relativePath(path: Column, base: String): Column = {
    val norm = normalizeSeparators(path)
    when(norm.startsWith(base), norm.substr(lit(base.length + 1), length(norm)))
      .otherwise(norm)
  }

  /** Resolution form: `base` prepended unless already under it
    * (`AbsFilenamePath`). */
  def absPath(path: Column, base: String): Column = {
    val norm = normalizeSeparators(path)
    when(norm.startsWith(base), norm).otherwise(concat(lit(base), norm))
  }
}
