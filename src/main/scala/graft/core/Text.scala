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

  /** Whitespace-run tokenization, the production convention. The class
    * is spelled out as `[ \t\n\r\f]+` — exactly RE2's `\s` — because
    * Java's `\s` ALSO matches vertical tab (0x0B) while DuckDB's RE2
    * does not; a bare `\s+` here would tokenize a 0x0B-carrying
    * document differently on the two engines and break every
    * hash-matched gate downstream. 0x0B is a token character on BOTH
    * engines under this spelling.
    */
  def whitespaceTokens(c: Column): Column = split(trim(c), "[ \\t\\n\\r\\f]+")
}
