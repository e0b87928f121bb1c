package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * stratified sampling, token-budget shard packing, eval-set
  * decontamination, and PII/denylist redaction.
  *
  * Everything here is a pure column program or a key-partitioned
  * join/agg — no UDFs, no driver-side state, no broadcast of anything
  * that grows with the corpus — so each operator's plan shape survives
  * a 100× scale-up unchanged. Hash-derived decisions (sampling,
  * shingle keys) use md5, which both Spark and DuckDB expose, so every
  * operator is oracle-checkable bit-for-bit AND retry-stable: a task
  * retry or repartition cannot flip a sampling decision the way
  * rand()/monotonically_increasing_id can.
  */
object Curation {

  /** Sampling-bucket space: 7 hex chars = 28 bits. */
  val BucketSpace: Long = 1L << 28

  /** Deterministic 28-bit bucket from md5(key): uniform on
    * [0, 2^28), content-derived (retry-stable), and reproducible in
    * any engine with md5 — `CAST('0x' || substr(md5(k),1,7) AS BIGINT)`
    * in DuckDB.
    */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key), 1, 7), 16, 10).cast("long")

  /** Deterministic corpus shuffle for reproducible training order:
    * every row gets a content-derived sort key
    * (md5 bucket of `shuf:<seed>:<id>`, id tiebreak) and the frame is
    * globally ordered by it — the same permutation on every run, any
    * cluster layout, any retry. A different `seed` per epoch yields an
    * independent order, so epoch schedules are reproducible from
    * (corpus, seed) alone — no RNG state to persist.
    *
    * Scale shape: the global sort is ONE range exchange (sampled
    * bounds) + local sorts — exactly what a sharded training-data
    * write wants; `df.orderBy` here feeds `write.parquet` so shard N
    * holds the Nth slice of the permutation. No window over the
    * corpus, no driver state, no RNG whose draw depends on layout.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long): DataFrame =
    df.orderBy(
      hashBucket(concat_ws("", lit(s"shuf:$seed:"), col(idCol).cast("string"))),
      col(idCol))

  /** Per-stratum deterministic sampling: keep a row iff its bucket
    * falls below the stratum's rate. The bucket key salts the id with
    * the stratum so re-using an id across strata draws independently.
    *
    * Scale shape: a filter — fully pushdown-adjacent, no shuffle, no
    * state; the sample is a property of the row alone. Contrast
    * df.sample(), whose outcome depends on partition layout and seed
    * plumbing under retry.
    */
  def stratifiedSample(df: DataFrame, idCol: String, groupCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    df.filter(
      hashBucket(concat_ws(":", col(groupCol), col(idCol).cast("string")))
        < rate * BucketSpace)
  }

  /** Exactly-n deterministic sample per group (eval-set construction,
    * per-source caps): rows rank within their group by md5 bucket — a
    * content-derived total order, so the chosen set is stable under
    * retries and layout — and the first n survive. One partitioned
    * window; group width bounds the sort, not the corpus.
    */
  def sampleExactPerGroup(df: DataFrame, idCol: String, groupCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(
      hashBucket(concat_ws(":", col(groupCol), col(idCol).cast("string"))),
      col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** Exact class rebalance: downsample every class to the size of the
    * SMALLEST class (the classic "balance to the minority" rebalance
    * before fine-tuning), deterministically — the survivors of class g
    * are its first min-count rows under the content-hash order
    * (`rebal:<seed>:<class>:<id>` bucket, id tiebreak), so the result
    * is identical on every run, cluster layout, and retry, and adding
    * unrelated classes never changes which rows of g survive.
    *
    * Scale shape: the per-class count relation is classes-sized; its
    * 1-row min aggregate joins back as a broadcast cross, and the only
    * wide operation is the per-class rank window — as wide as the
    * largest CLASS, never the corpus (the same accepted shape as
    * [[sampleExactPerGroup]], which this generalizes with a
    * data-derived n).
    */
  def rebalanceClasses(df: DataFrame, idCol: String, classCol: String,
      seed: Long): DataFrame = {
    val minCount = df.groupBy(classCol).agg(count(lit(1)).as("_cnt"))
      .agg(min("_cnt").as("_min_cnt"))
    val w = Window.partitionBy(classCol).orderBy(
      hashBucket(concat_ws(":", lit("rebal"), lit(seed), col(classCol),
        col(idCol).cast("string"))),
      col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .crossJoin(broadcast(minCount))
      .filter(col("_rn") <= col("_min_cnt"))
      .drop("_rn", "_min_cnt")
  }

  /** Weighted sample WITHOUT replacement, exactly k rows, inclusion
    * probability ∝ `weight` (Efraimidis–Spirakis A-ES): each row draws
    * its uniform u from a content-hash bucket (salted, retry/layout-
    * stable like every sampler here) and ranks by the exponential key
    * e = −ln(u)/w; the k smallest win. Appends `_es_key` (the rank
    * key, for auditability).
    *
    * Scale shape: orderBy+limit compiles to TakeOrderedAndProject —
    * a size-k heap per partition and a k-way driver merge; no global
    * sort, no shuffle of the data, driver state = k rows.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (hashBucket(concat_ws(":", lit("ws"), col(idCol).cast("string")))
      + 1.0) / BucketSpace.toDouble
    df.where(weight > 0)
      .withColumn("_es_key", -log(u) / weight)
      .orderBy(col("_es_key"), col(idCol))
      .limit(k)
  }

  /** Token-budget shard assignment: within each group (ordered by
    * `orderCol`) rows are packed greedily into shards of ~`budget`
    * tokens; a row belongs to the shard its cumulative-token START
    * offset falls in, so every shard except a group's last holds at
    * least `budget` tokens' worth of starts and assignment is a pure
    * prefix-sum — one window sort per group, no iteration.
    *
    * Scale shape: a partitioned window (sort within group), which at
    * 100 TB is a single range-partitioned sort per group — groups
    * (sources/shard-families) bound the sort width, and no global
    * total order is ever required.
    */
  def packShards(df: DataFrame, groupCol: String, orderCols: Seq[String],
      tokensCol: String, budget: Long): DataFrame = {
    // orderCols must reach a total order within each group (end with a
    // unique id): with ties the running sum cumulates in
    // partition-arrival order and a retry could flip a row's shard —
    // the exact instability this module promises to avoid.
    val w = Window.partitionBy(groupCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokensCol)).over(w))
      .withColumn("shard",
        floor((col("_cum") - col(tokensCol)) / lit(budget).cast("double")).cast("long"))
      .drop("_cum")
  }

  /** Single-order-column convenience; the column must be unique within
    * each group (see above).
    */
  def packShards(df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame =
    packShards(df, groupCol, Seq(orderCol), tokensCol, budget)

  /** Concat-then-chunk SEQUENCE packing — the pretraining batch
    * layout: within each group, documents are laid end to end in
    * `orderCols` order and the token stream is cut into fixed
    * `seqLen`-token training sequences; documents SPLIT across
    * sequence boundaries (contrast [[packShards]], which keeps
    * documents whole under a budget). One output row per
    * (document, sequence) fragment:
    *
    *   groupCol, seq_id            — which sequence of the group
    *   <idCols...>                 — the document's carried columns
    *   doc_from, doc_to            — doc-relative token span (incl.)
    *   seq_off                     — where the fragment starts in seq
    *   n_in_seq                    — fragment length in tokens
    *
    * Σ n_in_seq over a document = its token count (nothing dropped,
    * nothing duplicated) and Σ over a sequence ≤ seqLen — both
    * invariants spec-pinned. Zero-token documents yield no rows.
    *
    * Scale shape: one per-GROUP window prefix-sum (groups bound the
    * partition, as with packShards) + a per-row explode bounded by
    * ⌈doc/seqLen⌉ fragments; all arithmetic is codegen column
    * programs. Deterministic for a total `orderCols` order, so every
    * retry and layout packs byte-identically.
    */
  def packSequences(df: DataFrame, groupCol: String, orderCols: Seq[String],
      tokensCol: String, seqLen: Long): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1 token, got $seqLen")
    val w = Window.partitionBy(groupCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val C = lit(seqLen)
    df.filter(col(tokensCol) > 0)
      .withColumn("_start", (sum(col(tokensCol)).over(w) - col(tokensCol)).cast("long"))
      .withColumn("_last", col("_start") + col(tokensCol).cast("long") - 1)
      // integer `div`, not floor(x / C): double division loses exactness
      // past 2^53 total tokens per group, which a 100 TB corpus can reach
      .withColumn("seq_id", explode(sequence(
        expr(s"_start div $seqLen"), expr(s"_last div $seqLen"))))
      .withColumn("_sfrom", greatest(col("_start"), col("seq_id") * C))
      .withColumn("_sto",
        least(col("_start") + col(tokensCol), (col("seq_id") + 1) * C) - 1)
      .withColumn("doc_from", (col("_sfrom") - col("_start")).cast("long"))
      .withColumn("doc_to", (col("_sto") - col("_start")).cast("long"))
      .withColumn("seq_off", (col("_sfrom") - col("seq_id") * C).cast("long"))
      .withColumn("n_in_seq", (col("_sto") - col("_sfrom") + 1).cast("long"))
      .drop("_start", "_last", "_sfrom", "_sto")
  }

  /** Distinct word-`n`-gram shingle hashes of `textCol` (16-hex-char
    * md5 prefixes — 64 bits, collision-negligible at corpus scale and
    * far narrower than raw shingle strings in the shuffle). Documents
    * shorter than `n` words have no shingles.
    */
  def shingleHashes(textCol: Column, n: Int): Column =
    array_distinct(shingleSeq(textCol, n))

  /** POSITIONAL word-`n`-gram shingle hashes — one entry per gram
    * position, duplicates kept (winnowing needs the positional
    * sequence; [[shingleHashes]] is its distinct set).
    */
  def shingleSeq(textCol: Column, n: Int): Column = {
    val words = split(trim(textCol), " ")
    val grams = transform(sequence(lit(0), size(words) - n),
      i => substring(md5(array_join(slice(words, i + 1, lit(n)), " ")), 1, 16))
    // sequence(0, neg) counts DOWN in Spark — guard short docs explicitly
    when(size(words) >= n, grams).otherwise(array())
  }

  /** Eval-set decontamination: training documents sharing at least
    * `minHits` distinct `n`-gram shingles with any eval document.
    * Returns (id, n_hits) for flagged documents.
    *
    * Scale shape: both sides explode to (shingle-hash) keys and meet
    * in a hash-partitioned equi-join — the eval side is typically tiny
    * (Spark will auto-broadcast it under the threshold) but nothing
    * REQUIRES it to fit in memory; the same plan handles
    * corpus-vs-corpus decontamination. The per-doc distinct + count is
    * a partial-aggregated groupBy on the doc id.
    */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 5, minHits: Int = 2): DataFrame = {
    val evalSh = eval
      .select(explode(shingleHashes(col(textCol), n)).as("sh")).distinct()
    val trainSh = train
      .select(col(idCol), explode(shingleHashes(col(textCol), n)).as("sh"))
    trainSh.join(evalSh, Seq("sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits")) // shingles are pre-distinct per doc
      .filter(col("n_hits") >= minHits)
  }

  /** Cross-document repeated-passage census — exact substring
    * duplication at token n-gram granularity (the signal behind
    * suffix-array training-data dedup, Lee et al. 2022,
    * arXiv:2107.06499, re-expressed relationally): every token
    * n-gram that occurs in at least `minDocs` DISTINCT documents,
    * with its document frequency and total occurrence count
    * (within-document repeats included). Returns
    * (ngram, n_docs, n_occurrences), most-shared first.
    *
    * Scale shape: per-row n-gram explode (bounded by document
    * length), then ONE hash aggregation keyed on the n-gram with
    * map-side partial aggregation — corpus-linear, no driver-side
    * vocabulary, no join. Downstream removal composes as a semi-join
    * of documents against the flagged grams.
    */
  def repeatedPassages(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int = 2): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val words = split(trim(col(textCol)), " ")
    val grams = transform(sequence(lit(0), size(words) - n),
      i => array_join(slice(words, i + 1, lit(n)), " "))
    df.filter(col(textCol).isNotNull && size(words) >= n)
      .select(col(idCol).as("_id"), explode(grams).as("ngram"))
      .groupBy("ngram")
      .agg(
        countDistinct(col("_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("ngram"))
  }

  /** Context-length capping: truncate `textCol` to its first
    * `maxTokens` whitespace tokens, adding `<textCol>_trunc` and
    * `n_tokens_kept`. A pure column program (split/slice/join — no
    * UDF), so it rides the scan at any scale.
    */
  def truncateToBudget(df: DataFrame, textCol: String, maxTokens: Int): DataFrame = {
    val words = split(trim(col(textCol)), " ")
    df.withColumn("n_tokens_kept", least(size(words), lit(maxTokens)))
      .withColumn(s"${textCol}_trunc",
        array_join(slice(words, 1, maxTokens), " "))
  }

  /** Sliding-window document chunking — the pre-embedding step that
    * turns long documents into overlapping fixed-size windows (chunk
    * i covers chars [i·stride, i·stride + size), stride = size −
    * overlap; the final partial window is kept). Output adds
    * `chunk_idx`, `chunk_start` (0-based char offset) and `chunk`
    * next to the input columns, one row per window.
    *
    * Window generation STOPS at the first window that reaches the
    * document end (last index = ⌈(len − size)/stride⌉): a further
    * trailing window would be fully contained in its predecessor
    * (any stride < len ≤ size document would otherwise emit its tail
    * twice into the embedding/dedup pipeline).
    *
    * Scale shape: a pure codegen column program — sequence + explode
    * bounded by ⌈len/stride⌉ per document, no shuffle, no UDF; the
    * downstream embed/dedup stages see a narrow exploded relation.
    */
  def chunkDocuments(df: DataFrame, textCol: String, size: Int,
      overlap: Int): DataFrame = {
    require(size > 0, s"size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap (size $size)")
    val stride = size - overlap
    val nChunks = greatest(
      (ceil((length(col(textCol)) - size).cast("double") / stride) + 1).cast("int"),
      lit(1))
    df.filter(col(textCol).isNotNull && length(col(textCol)) >= 1)
      .withColumn("_ci", explode(sequence(lit(0), nChunks - 1)))
      .withColumn("chunk_start", col("_ci") * stride)
      .select(df.columns.map(col).toSeq :+
        col("_ci").as("chunk_idx") :+
        col("chunk_start") :+
        col(textCol).substr(col("chunk_start") + 1, lit(size)).as("chunk"): _*)
  }

  /** Built-in redaction patterns (Java-regex and RE2 compatible — no
    * lookaround, so Spark and DuckDB agree on every match).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
  val LongDigitsPattern = "\\b[0-9]{6,}\\b"

  /** Replace every match of each pattern (applied in order) with
    * `replacement`. A pure regexp_replace chain: codegen'd, no UDF.
    */
  def redact(textCol: Column, patterns: Seq[String],
      replacement: String = "<PII>"): Column =
    patterns.foldLeft(textCol)((c, p) => regexp_replace(c, p, replacement))

  /** Match count of `pattern` in `textCol` (0 when no match). */
  def matchCount(textCol: Column, pattern: String): Column =
    size(regexp_extract_all(textCol, lit(pattern), lit(0)))

  /** Deterministic weighted domain mixing: the standard training-mix
    * transform (e.g. "wiki ×2.5, web ×0.3"). A weight w = k + f
    * repeats each row k times and emits one further copy iff the row's
    * content-hash bucket falls below f — so expectation is exactly w
    * per row, the realized mix is layout/retry-stable, and repeated
    * runs emit identical epochs. Output rows carry `epoch`
    * ∈ [0, copies) so downstream shuffling can keep epochs apart.
    *
    * Scale shape: a per-row weight lookup (CASE chain), one explode
    * bounded by ⌈w⌉ — no shuffle, no state; rows with weight 0 (or a
    * losing fractional draw at w < 1) are filtered before the explode,
    * so down-weighting is pushdown-shaped like stratifiedSample.
    */
  /** Temperature-based source mixing (the T5/mT5 α-sampling scheme,
    * arXiv:1910.10683 §3.3.1 / arXiv:2010.11934 §3): source s with
    * corpus share p_s is drawn with probability ∝ p_s^α, flattening
    * the source distribution toward uniform as α → 0 (α = 1 keeps the
    * natural mix). Materializes a ~`targetTotal`-row mixed corpus:
    * per-doc copy weight w_s = targetTotal·p_s^α / (Σ_t p_t^α) / n_s,
    * realized as ⌊w⌋ guaranteed copies + one md5-hash-fractional copy
    * (same machinery as [[weightedMix]] — deterministic, layout-free,
    * oracle-reproducible). Output gains the `epoch` copy index.
    *
    * Scale shape: the weight relation is ONE row per source (a keyed
    * count agg + a 1-row normalizer riding the plan) and broadcasts;
    * the corpus side is a scan + filter + bounded explode — no
    * shuffle of the corpus itself, no driver state.
    */
  def temperatureMix(df: DataFrame, idCol: String, groupCol: String,
      alpha: Double, targetTotal: Long): DataFrame = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    require(targetTotal > 0, s"targetTotal must be positive, got $targetTotal")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("_n"))
      .withColumn("_pa", pow(col("_n").cast("double"), lit(alpha)))
    val z = counts.agg(sum("_pa").as("_z"))
    val rates = counts.crossJoin(broadcast(z))
      .withColumn("_w",
        lit(targetTotal.toDouble) * col("_pa") / col("_z") / col("_n"))
      .select(col(groupCol), col("_w"))
    val frac = col("_w") - floor(col("_w"))
    val copies = (floor(col("_w")) +
      when(hashBucket(concat_ws(":",
          col(groupCol), col(idCol).cast("string"), lit("tmix")))
        < frac * BucketSpace, 1).otherwise(0)).cast("int")
    df.join(broadcast(rates), Seq(groupCol))
      .withColumn("_copies", copies)
      .filter(col("_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0), col("_copies") - 1)))
      .drop("_copies", "_w")
  }

  def weightedMix(df: DataFrame, idCol: String, groupCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0), "negative mix weight")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    val copies = (floor(w) +
      when(hashBucket(concat_ws(":", col(groupCol), col(idCol).cast("string"), lit("mix")))
        < (w - floor(w)) * BucketSpace, 1).otherwise(0)).cast("int")
    df.withColumn("_copies", copies)
      .filter(col("_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0), col("_copies") - 1)))
      .drop("_copies")
  }

  /** Curriculum staging: assign every row an exact NTILE bucket over
    * (score, id) order — easy-to-hard training stages — WITHOUT a
    * corpus-wide window. A plain `ntile` is a single-partition window
    * (the whole corpus through one task); here the exact global rank
    * is derived as histogram offset + within-score row_number:
    *
    *   rank(row) = (# rows with strictly smaller score)
    *             + row_number within its score group (by id)
    *
    * The histogram/offset relation is DISTINCT-SCORE-sized (scores are
    * discretized by construction — token counts, quality deciles), the
    * within-score window partitions by score, and the ntile boundary
    * arithmetic (first n mod b buckets get one extra row — the SQL
    * standard distribution, so a plain-ntile oracle matches exactly)
    * needs only the total count scalar. Appends `stage` (1-based) and
    * `_rank`; order epochs by (stage, [[hashBucket]] shuffle, id) for
    * a reproducible easy-first schedule.
    */
  def curriculumStages(df: DataFrame, idCol: String, scoreCol: String,
      stages: Int): DataFrame = {
    require(stages >= 1, s"stages must be >= 1, got $stages")
    // distinct-score-sized; pinned because it feeds the offset window
    // AND the total-count scalar (two consumers, one corpus scan)
    val hist = df.groupBy(scoreCol).agg(count(lit(1)).as("_cnt"))
      .localCheckpoint(true)
    // global offset via the range-partitioned two-pass scan — a
    // continuous score makes the histogram corpus-sized, so the
    // previous single-partition window over it was the one
    // non-parallel step left in this operator (null scores order
    // first in both the range partitioner and the per-partition
    // window, preserving the nulls-rank-first contract)
    val base = PrefixSum.rangeExclusive(hist, scoreCol,
      descending = false, Seq("_cnt" -> "_base"))
      .select(col(scoreCol).as("_bscore"), col("_base"))
    // coalesce: an EMPTY corpus sums to null — return the (empty)
    // frame instead of NPE-ing on the scalar
    val n = hist.agg(coalesce(sum("_cnt"), lit(0L))).head().getLong(0)
    val q = n / stages
    val r = n % stages
    val inScore = Window.partitionBy(scoreCol).orderBy(col(idCol))
    // NULL-SAFE score join: a null score is a real histogram group
    // (Spark window order puts nulls FIRST, so they rank first) — SQL
    // equality would silently drop those rows AND leave their count
    // baked into every other score's offset
    val ranked = df.join(base, col(scoreCol) <=> col("_bscore"))
      .drop("_bscore")
      .withColumn("_rank",
        col("_base") + row_number().over(inScore).cast("long"))
    // CaseWhen evaluates only the taken branch, so the div-by-q arm is
    // never touched when q = 0 (fewer rows than stages)
    ranked.withColumn("stage",
      (when(col("_rank") <= lit(r * (q + 1)),
        expr(s"(_rank - 1) div ${q + 1}"))
        .otherwise(lit(r) + expr(s"(_rank - 1 - ${r * (q + 1)}) div $q"))
        + 1).cast("int"))
  }

  /** Corpus release auditing: classify every id across two snapshots as
    * added / removed / changed / unchanged by content hash — the diff a
    * dataset release pipeline publishes (and gates on) before swapping
    * `latest/`. ONE full-outer hash join on the id; content hashes are
    * computed scan-side over the JSON serialization of the content
    * columns (`ignoreNullFields=false`) — JSON framing is injective,
    * so (null, "a") / ("a", null) / ("", "a") / values containing any
    * would-be separator all hash apart, and the join carries two
    * narrow (id, hash) relations, never the payloads.
    */
  def snapshotDiff(prev: DataFrame, next: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "contentCols must be non-empty")
    def hashed(df: DataFrame, as: String) = df.select(col(idCol),
      md5(to_json(struct(contentCols.map(col): _*),
        Map("ignoreNullFields" -> "false"))).as(as))
    hashed(prev, "_hp").join(hashed(next, "_hn"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_hp").isNull, "added")
          .when(col("_hn").isNull, "removed")
          .when(col("_hp") =!= col("_hn"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** CCNet-style boilerplate stripping (Wenzek et al. 2020): hash each
    * structural unit ("line" — here a non-overlapping `lineTokens`-token
    * chunk, since the corpus carries no newlines) and remove every unit
    * whose hash occurs in ≥ `minDocs` DISTINCT documents. This is the
    * frequency-threshold complement to exact-substring dedup
    * ([[graft.operators.Dedup]]): substring dedup cuts any repeated
    * passage wherever it repeats; boilerplate stripping targets
    * nav/header/footer text by DOCUMENT frequency, keeping legitimate
    * within-document repetition intact.
    *
    * Returns one row per input document: (`idCol`, `outCol` = text
    * rebuilt from the kept lines in order, single-space joined,
    * `n_lines`, `n_removed` flagged-line occurrences dropped).
    * Documents whose every line is boilerplate come back with an empty
    * `outCol` (removal policy is the caller's — filter or keep).
    *
    * Scale shape: the line relation is corpus-token-sized but shuffles
    * exactly TWICE — once on the 64-bit line key for the
    * distinct-document-frequency aggregate (map-side partial
    * count-distinct via the (key, id) pre-group), once back onto the
    * document id for reassembly. The flagged-key set is the join's
    * build side; boilerplate vocabularies are small by construction
    * (high-df lines), so Spark auto-broadcasts it under AQE and the
    * probe never widens. No UDFs — the chunk/hash/rebuild pipeline is
    * all codegen'd `transform`/`slice`/`array_join`.
    */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
      lineTokens: Int = 8, minDocs: Int = 3,
      outCol: String = "text_clean"): DataFrame = {
    require(lineTokens > 0, s"lineTokens must be positive, got $lineTokens")
    require(minDocs > 1, s"minDocs must be > 1, got $minDocs")
    val L = lineTokens
    val toks = filter(graft.core.Text.whitespaceTokens(col(textCol)),
      t => length(t) > 0)
    // empty docs: sequence(0, -1) would DESCEND in Spark, so guard
    val lined = df
      .withColumn("_w", toks)
      .withColumn("_nl", expr(s"(size(_w) + $L - 1) div $L"))
      .withColumn("_lines", when(col("_nl") > 0,
        expr(s"""transform(sequence(0, _nl - 1), i -> struct(
                |  i as li,
                |  array_join(slice(_w, i * $L + 1, $L), ' ') as txt))"""
          .stripMargin))
        .otherwise(expr("array()")))
    // the line relation carries _nl so the doc-level census needs NO
    // second tokenize pass; flag-mark + in-aggregate filter (instead
    // of an anti join + separate doc scan) keeps all-removed docs'
    // line counts. Net: the corpus is tokenized twice (flagged build +
    // probe — the unavoidable self-join shape; stage `lines` to
    // parquet upstream to make it once), not three times.
    val lines = lined
      .select(col(idCol), col("_nl"), explode(col("_lines")).as("_l"))
      .select(col(idCol), col("_nl"), col("_l.li").as("_li"),
        col("_l.txt").as("_txt"),
        substring(md5(col("_l.txt")), 1, 16).as("_key"))
    val flagged = lines.groupBy("_key")
      .agg(countDistinct(col(idCol)).as("_df"))
      .filter(col("_df") >= minDocs)
      .select(col("_key"), lit(true).as("_cut"))
    val rebuilt = lines.join(flagged, Seq("_key"), "left")
      .withColumn("_keep", col("_cut").isNull)
      .groupBy(idCol).agg(
        expr("array_join(transform(filter(array_sort(collect_list(struct(_li, _txt, _keep))), s -> s._keep), s -> s._txt), ' ')")
          .as(outCol),
        first("_nl").cast("long").as("n_lines"),
        sum(when(col("_keep"), 0L).otherwise(1L)).as("n_removed"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col(outCol), lit("")).as(outCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }
}
