package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{split, trim}

/** Shared tokenization conventions.
  *
  * Two conventions coexist in this repo ON PURPOSE:
  *   - `whitespaceTokens`: split on `\s+` (any run of spaces/tabs/
  *     newlines is one separator) — the production text convention,
  *     used by substring dedup, the corpus LMs and DSIR. DuckDB oracle
  *     mirror: `string_split_regex(trim(text), '\s+')`.
  *   - the MinHash/shingle family splits on a SINGLE space
  *     (`split(trim(c), " ")`) because its gate oracles are written
  *     against DuckDB's `string_split(trim(text), ' ')`; changing one
  *     side without the other breaks every hash-matched dedup gate.
  * New operators should use `whitespaceTokens` unless they must join
  * against the minhash word sets.
  */
object Text {

  /** Whitespace-run tokenization (`\s+`), the production convention. */
  def whitespaceTokens(c: Column): Column = split(trim(c), "\\s+")
}
