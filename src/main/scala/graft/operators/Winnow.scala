package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003
  * — the MOSS algorithm): slide a window of `w` consecutive k-gram
  * hashes over each document and keep the MINIMUM hash per window.
  *
  * Why this beats full shingle sets at scale: winnowing selects only
  * ~2/(w+1) of a document's k-grams, so the exploded fingerprint
  * relation — the thing that gets shuffled and joined — is
  * corpus-tokens/w-sized instead of corpus-tokens-sized, while
  * keeping the DETECTION GUARANTEE: any token run of length
  * ≥ w + k − 1 shared by two documents contains at least one shared
  * window minimum, so the pair shares a fingerprint. (Between the
  * guarantee threshold and k there can be misses — that is the
  * bargain; full-set containment ([[SetJoin.containmentJoin]]) is
  * the exact instrument when the policy needs one.)
  *
  * Hash convention: 16-hex-md5 k-gram prefixes
  * ([[Curation.shingleSeq]] — positional, duplicates kept), window
  * minimum by LEXICOGRAPHIC order on the hex string, which every
  * engine orders identically (ASCII). All selection is a pure
  * codegen column program (sequence + transform + array_min), no
  * shuffle until the fingerprint explode.
  */
object Winnow {

  /** Distinct winnowed fingerprints, one (idCol, fp) row each.
    * Documents with fewer than k + w − 1 words emit nothing (no full
    * window exists).
    *
    * Implementation: winnowing is a per-ROW computation, so the whole
    * selection (k-gram md5, sliding w-minimum, per-row dedup) runs as
    * ONE native scalar expression
    * ([[graft.functions.WinnowExpression]] — monotonic-deque sliding
    * min, each gram hashed exactly once) inside the corpus scan: zero
    * shuffle until the fingerprint explode, and the exploded relation
    * is born ~2/(w+1)-of-tokens-sized instead of tokens-sized. The
    * final distinct unions fingerprints across rows SHARING an id (a
    * pre-dedup corpus, a union replaying an id) — per-row sets are
    * already distinct. [[fingerprintsDeclarative]] keeps the pure
    * column-program derivation; the spec pins them equal.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(idCol != "fp", "fingerprints: idCol 'fp' would collide with the output column")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(graft.functions.WinnowExpression
          .winnowFps(col(textCol), k, w)).as("fp"))
      .distinct()
  }

  /** The declarative reference derivation of [[fingerprints]]: a
    * sliding `min` over the POSITIONALLY EXPLODED gram relation (one
    * row per gram, rowsBetween(0, w−1)). Not the default path — the
    * explode + per-document window costs one corpus-tokens-sized
    * shuffle (the nested array-lambda alternative is worse still:
    * CollapseProject inlines the gram array into every window —
    * O(len²) md5 calls per document, measured 370 s at sf0.1). Kept
    * as the spec's differential oracle for the native expression.
    */
  def fingerprintsDeclarative(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    require(idCol != "fp", "fingerprints: idCol 'fp' would collide with the output column")
    Seq("_rid", "_grams", "_n", "_pos", "_g").foreach(c =>
      require(!df.columns.contains(c),
        s"fingerprints: input already has a $c column"))
    // winnow per ROW (a synthetic row key partitions the window, so
    // duplicate ids — a pre-dedup corpus, a union replaying an id —
    // can never interleave two texts' grams into one frame), then
    // union per id via the distinct: the fingerprints of an id are
    // the union over its rows, matching a per-row oracle
    val grams = df.filter(col(textCol).isNotNull)
      .withColumn("_rid", monotonically_increasing_id())
      .withColumn("_grams", Curation.shingleSeq(col(textCol), k))
      .withColumn("_n", size(col("_grams")))
      .select(col(idCol), col("_rid"), col("_n"),
        posexplode(col("_grams")).as(Seq("_pos", "_g")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("_rid").orderBy("_pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    grams
      .withColumn("_wmin", min("_g").over(win))
      // only positions with a FULL w-window select a fingerprint
      .filter(col("_pos") <= col("_n") - w)
      .select(col(idCol), col("_wmin").as("fp"))
      .distinct()
  }

  /** Candidate near-duplicate / partial-overlap pairs: documents
    * sharing at least `minShared` winnowed fingerprints
    * (id_a < id_b, n_shared). The join fan-in per fingerprint is its
    * document frequency — the same bucket-bounded shape as the LSH
    * band join, on a w-fold smaller relation.
    */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, minShared: Int = 2): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val fp = fingerprints(df, idCol, textCol, k, w)
    val a = fp.select(col(idCol).as("id_a"), col("fp"))
    val b = fp.select(col(idCol).as("id_b"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
