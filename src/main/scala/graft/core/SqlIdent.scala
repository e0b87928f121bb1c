package graft.core

/** Backtick-quoting for SQL identifiers that originate from DATA
  * (arbitrary parquet column names reaching ANALYZE / stats / stream
  * schemas) — one definition so the escape rule (backticks double
  * inside a backtick-quoted name) cannot drift between call sites.
  */
object SqlIdent {
  def quote(name: String): String =
    "`" + name.replace("`", "``") + "`"
}
