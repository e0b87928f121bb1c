package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT edit-distance similarity join via deletion neighborhoods
  * (the FastSS family — Bocek et al. 2007): the string-level
  * complement to [[SetJoin]]'s set-level prefix filtering. Fuzzy
  * matching a dirty column against a clean reference (catalog
  * reconciliation, entity resolution, OCR/typo cleanup of scraped
  * metadata) needs pairs within Levenshtein distance k, and an
  * all-pairs `levenshtein()` join is O(n²·len²) — nonexistent at
  * corpus scale.
  *
  * The guarantee: let Uₖ(s) be s plus every string obtainable by
  * deleting ≤ k characters. If lev(a, b) ≤ k then Uₖ(a) ∩ Uₖ(b) ≠ ∅
  * (delete the characters touched by the edit script from each side;
  * substitutions delete one position from BOTH, insertions/deletions
  * delete the inserted/extra character from the longer side — ≤ k
  * deletions each). So joining on neighborhood signatures finds every
  * qualifying pair, and the exact `levenshtein` verify on candidates
  * removes false positives: zero false negatives by construction, no
  * sketches.
  *
  * Scale shape: each side explodes into ≤ Σᵢ≤ₖ C(len, i) signatures
  * (len+1 per row at k=1 — linear in corpus characters), one
  * hash-partitioned equi-join on the 64-bit signature hash, a
  * `distinct` over surviving id pairs, then the codegen'd verify on
  * that (small) candidate relation. Fan-in is bounded by signature
  * bucket size — natural-language strings collide rarely — and the
  * length filter |len(a) − len(b)| ≤ k prunes inside the join. No
  * driver state, no broadcast of either corpus.
  */
object Fuzzy {

  /** Deletion-neighborhood signatures for `textCol` at max distance
    * `k` (k ∈ {1, 2}): an array of xxhash64 values over the string
    * itself and every ≤ k-deletion variant. Hashing keeps the shuffle
    * key 8 bytes regardless of string length — the neighborhood
    * relation is the operator's whole cost at scale, exactly the
    * window-key-width lesson from the substring-dedup operator.
    */
  private def signatures(c: org.apache.spark.sql.Column, k: Int) = {
    // one deletion: s with position i removed (i is 0-based; SQL
    // substring is 1-based). sequence(0, len-1) on an empty string is
    // sequence(0, -1) — invalid in Spark — so guard with greatest().
    def del1(e: String): String =
      s"""transform(sequence(0, greatest(length($e) - 1, 0)),
         |          i -> if(i < length($e),
         |                  concat(substring($e, 1, i),
         |                         substring($e, i + 2, 2147483647)),
         |                  $e))""".stripMargin.replaceAll("\\s+", " ")
    val self = "array(_s)"
    val base = k match {
      case 1 => s"concat($self, ${del1("_s")})"
      case 2 =>
        // flatten(transform(del1)) gives every ≤2-deletion variant;
        // duplicates collapse in array_distinct below
        s"""concat($self, ${del1("_s")},
           |       flatten(transform(${del1("_s")}, _d1 -> ${del1("_d1")})))"""
          .stripMargin.replaceAll("\\s+", " ")
      case _ => throw new IllegalArgumentException(
        s"deletion neighborhoods supported for k in {1, 2}, got $k")
    }
    expr(s"array_distinct(transform($base, _v -> xxhash64(_v)))")
      .as("_sigs")
  }

  /** All pairs (one row per (left id, right id)) with
    * lev(left, right) ≤ `k` between `left` and `right` (either two
    * relations or the same one). Output: `idL`, `idR`, the two
    * strings, and `dist`. Null strings are dropped (no distance);
    * self-pairs survive only across relations (a self-JOIN caller
    * filters `idL < idR` downstream — kept out of here so the
    * dirty-vs-clean linkage shape, where idL == idR is the MATCH
    * signal, works unchanged).
    */
  def editJoin(left: DataFrame, leftId: String, leftText: String,
      right: DataFrame, rightId: String, rightText: String,
      k: Int): DataFrame = {
    require(k == 1 || k == 2, s"k must be 1 or 2, got $k")
    def side(df: DataFrame, id: String, text: String, tag: String) =
      df.filter(col(text).isNotNull)
        .select(col(id).as(s"id$tag"), col(text).as("_s"))
        .withColumn("_sigs", signatures(col("_s"), k))
        .select(col(s"id$tag"), col("_s").as(s"s$tag"),
          explode(col("_sigs")).as("_sig"))
    val l = side(left, leftId, leftText, "L")
    val r = side(right, rightId, rightText, "R")
    // candidates: signature match + length filter, then ONE distinct
    // over pairs so a pair sharing many signatures verifies once
    val cand = l.join(r,
        l("_sig") === r("_sig") &&
          abs(length(l("sL")) - length(r("sR"))) <= k)
      .select("idL", "sL", "idR", "sR")
      .distinct()
    cand.withColumn("dist", levenshtein(col("sL"), col("sR")))
      .filter(col("dist") <= k)
  }
}
