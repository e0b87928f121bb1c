package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering (the
  * AllPairs/PPJoin family — Chaudhuri et al. 2006, Xiao et al. 2008):
  * the deterministic complement to MinHash-LSH ([[Dedup]]). LSH is
  * probabilistic (a pair can be missed with vanishing but nonzero
  * probability) and pays signature construction; prefix filtering has
  * ZERO false negatives by theorem and instead pays a global
  * document-frequency ranking join. Use it when the dedup/contamination
  * policy needs a provable "no pair above τ survives" guarantee —
  * decontamination against a benchmark, legal/compliance removal — and
  * LSH when approximate recall at lower cost is acceptable.
  *
  * The guarantee: order every document's token set by ONE global order
  * (rarest-first document frequency, token tiebreak). For Jaccard ≥ t,
  * |x∩y| ≥ ⌈t·|x|⌉ (and symmetrically for y), so x and y MUST share a
  * token inside each's first |x| − ⌈t·|x|⌉ + 1 tokens — the prefix.
  * Joining on prefix tokens therefore finds every qualifying pair; the
  * exact Jaccard verify then removes false positives.
  *
  * Scale shape: one token-frequency agg + one corpus-token-sized join
  * to rank tokens (the price of exactness), one doc regroup, then the
  * prefix self-join whose fan-in is Σ df_prefix(token)² — rarest-first
  * ordering makes prefix tokens the LOW-frequency ones, so buckets
  * stay small on natural vocabularies; the length filter
  * (t·|x| ≤ |y| ≤ |x|/t) prunes inside the join. No sketches, no
  * probabilistic pre-filter anywhere in the verify.
  */
object SetJoin {

  /** Pruning-filter slack for double rounding (see jaccardJoin): far
    * below any meaningful threshold granularity, far above an ulp.
    */
  private val FpSlack = 1e-9

  /** Shared prefix-filter scaffold: global rarest-first ranking of a
    * `(idCol, _tok)` relation into per-document sorted sets with
    * prefix lengths — `_stoks` (tokens sorted by one global
    * (df, token) total order every document sorts by identically),
    * `_len`, `_plen`. Returned PERSISTED (spill-tolerant): it feeds
    * the prefix explode AND both verify sides; callers release it
    * after the pair list is materialized (handOff: the bounded
    * OUTPUT stays cached, the corpus-sized intermediate does not).
    *
    * FpSlack before every ceil/compare: t·len computed in doubles
    * can exceed the true rational by an ulp (e.g. 100·0.07 =
    * 7.000000000000001), which would SHORTEN the prefix / TIGHTEN
    * the length filter and prune a qualifying pair — a false
    * negative. The slack errs the pruning filters conservative
    * (never the verify, which stays the semantic boundary). Jaccard
    * and containment share this scaffold so a slack/ordering fix
    * can never apply to one cross-checkable join and not the other.
    */
  private def rankedSets(toks: DataFrame, idCol: String,
      threshold: Double): DataFrame = {
    val dfreq = toks.groupBy("_tok").agg(count(lit(1)).as("_df"))
    toks.join(dfreq, "_tok")
      .groupBy(idCol).agg(
        expr("transform(array_sort(collect_list(struct(_df, _tok))), s -> s._tok)")
          .as("_stoks"))
      .withColumn("_len", size(col("_stoks")))
      .withColumn("_plen",
        (col("_len") - ceil(lit(threshold) * col("_len") - lit(FpSlack)) + 1)
          .cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** All pairs (id_a < id_b, jac) with exact Jaccard ≥ `threshold`
    * over the word sets of `textCol` (engine word-set convention:
    * single-space split of trimmed text, xxhash64 tokens, distinct —
    * identical to [[Dedup.withSignature]] so the two algorithms are
    * directly cross-checkable). Null-text rows are dropped (no set);
    * empty strings keep their singleton empty-word set, matching the
    * all-pairs oracle semantics.
    */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    // ONE shared tokenization with the LSH pipeline (Dedup.wordSet) —
    // the cross-validation gates depend on bit-identical word sets
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(Dedup.wordSet(col(textCol))).as("_tok"))
    val sorted = rankedSets(toks, idCol, threshold)
    try {
      val pre = sorted.select(col(idCol), col("_len"),
        explode(expr("slice(_stoks, 1, _plen)")).as("_ptok"))
      val a = pre.select(col(idCol).as("id_a"), col("_len").as("_la"), col("_ptok"))
      val b = pre.select(col(idCol).as("id_b"), col("_len").as("_lb"), col("_ptok"))
      val cands = a.join(b, Seq("_ptok"))
        .filter(col("id_a") < col("id_b"))
        .filter(col("_lb") >= ceil(col("_la") * threshold - lit(FpSlack)) &&
          col("_la") >= ceil(col("_lb") * threshold - lit(FpSlack)))
        .select("id_a", "id_b").distinct()
      val sides = sorted.select(col(idCol), col("_stoks"))
      val out = cands
        .join(sides.select(col(idCol).as("id_a"), col("_stoks").as("_sa")), Seq("id_a"))
        .join(sides.select(col(idCol).as("id_b"), col("_stoks").as("_sb")), Seq("id_b"))
        .withColumn("_nc", size(array_intersect(col("_sa"), col("_sb"))))
        .withColumn("jac", col("_nc").cast("double") /
          (size(col("_sa")) + size(col("_sb")) - col("_nc")))
        .filter(col("jac") >= threshold)
        .select("id_a", "id_b", "jac")
      Caching.handOff(out)
    } finally { sorted.unpersist(blocking = false); () }
  }

  /** All DIRECTED pairs (id_a, id_b, cont) with exact shingle
    * containment |A∩B| / |A| ≥ `threshold`, id_a ≠ id_b, where A/B
    * are the documents' distinct word-`shingleN`-gram shingle sets
    * ([[Curation.shingleHashes]] — the decontamination convention).
    * The asymmetric member of the dedup ladder: Jaccard is blind to
    * small-inside-big inclusion (a 50-token quote verbatim inside a
    * 5,000-token page has Jaccard ≈ 0.01 but containment 1.0), and
    * SHINGLE sets are what make the predicate mean quote inclusion —
    * unigram word sets are structurally dense on any shared
    * vocabulary (measured on the test corpus: τ=0.95 word containment
    * still matched 42k of 250k possible pairs; τ=0.8 shingle
    * containment matched 50). Documents shorter than `shingleN`
    * words have no shingles and are excluded (containment of an
    * empty set is undefined).
    *
    * Prefix guarantee (one-sided): under a global rarest-first order,
    * |A∩B| ≥ ⌈t·|A|⌉ shared shingles cannot all avoid A's first
    * |A| − ⌈t·|A|⌉ + 1 shingles (pigeonhole on A alone). The B side
    * has NO prefix — containment puts no bound on where a shared
    * shingle sits in B's order — so the index side explodes B's full
    * shingle set. That one-sidedness is the price of asymmetry:
    * candidate fan-in per A-prefix shingle is its document frequency
    * df(t), and rarest-first ordering keeps prefix shingles the
    * low-df ones (shingle df is far more skew-resistant than word df
    * — a 5-gram shared by many documents IS the duplication being
    * hunted). The |B| ≥ ⌈t·|A|⌉ length filter prunes inside the
    * join; the exact set intersection is the verify.
    */
  def containmentJoin(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")
    // explode of an empty shingle array drops the row — sub-shingleN
    // documents leave the relation here
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(Curation.shingleHashes(col(textCol), shingleN)).as("_tok"))
    val sorted = rankedSets(toks, idCol, threshold)
    try {
      val a = sorted.select(col(idCol).as("id_a"), col("_len").as("_la"),
        explode(expr("slice(_stoks, 1, _plen)")).as("_ptok"))
      val b = sorted.select(col(idCol).as("id_b"), col("_len").as("_lb"),
        explode(col("_stoks")).as("_ptok"))
      val cands = a.join(b, Seq("_ptok"))
        .filter(col("id_a") =!= col("id_b"))
        .filter(col("_lb") >= ceil(col("_la") * threshold - lit(FpSlack)))
        .select("id_a", "id_b").distinct()
      val sides = sorted.select(col(idCol), col("_stoks"))
      val out = cands
        .join(sides.select(col(idCol).as("id_a"), col("_stoks").as("_sa")), Seq("id_a"))
        .join(sides.select(col(idCol).as("id_b"), col("_stoks").as("_sb")), Seq("id_b"))
        .withColumn("cont",
          size(array_intersect(col("_sa"), col("_sb"))).cast("double") /
            size(col("_sa")))
        .filter(col("cont") >= threshold)
        .select("id_a", "id_b", "cont")
      Caching.handOff(out)
    } finally { sorted.unpersist(blocking = false); () }
  }
}
