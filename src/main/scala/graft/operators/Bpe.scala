package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning over a distributed corpus —
  * the tokenizer-training step of an LLM data pipeline (Sennrich et
  * al. 2016). The reference has no tokenizer; at 100 TB the classic
  * in-memory trainers (single-host hash maps over the word list) stop
  * fitting, so the word-TYPE table — orders of magnitude smaller than
  * the corpus but still potentially billions of rows — stays a
  * DataFrame throughout.
  *
  * Shape per merge round: ONE distributed weighted pair-count agg over
  * the vocab table + a 1-row argmax to the driver (the chosen pair —
  * the only driver state is the merge list itself), then a codegen'd
  * array fold rewrites each word's token array in place (no shuffle —
  * the rewrite is a map). Lineage is truncated every round with
  * `localCheckpoint`, so plan depth stays O(1) instead of O(rounds).
  *
  * Ties break (count desc, pair asc) — deterministic across runs and
  * partitionings, which is what makes the merge sequence testable.
  */
object Bpe {

  /** Word-type frequency table: (`w` string, `freq` long). Exposed so
    * callers can reuse/persist it across trainings. Tokenization is
    * the engine-wide convention (single-space split of trimmed text —
    * every text gate and its oracle use the same); pre-normalize other
    * whitespace upstream if the corpus carries it.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), " ")).as("w"))
      .where(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Weighted adjacent-pair counts over the current token arrays:
    * (`a`, `b`, `cnt`). The gate query oracles round 0 of this
    * (character pairs), where the SQL mirror is direct.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .where(size(col("toks")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS a, toks[i + 1] AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").as("cnt"))

  /** The greedy left-to-right pair fold: fuse each adjacent (a, b) in
    * a token array — "aaa" under (a,a) becomes [aa, a], matching the
    * sequential trainers. ONE definition shared by training and
    * application so the two can never desynchronize.
    */
  private def mergeFold(a: String, b: String): Column =
    aggregate(col("toks"),
      array().cast("array<string>"),
      (acc, t) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && t === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(t))))

  /** Learn `nMerges` BPE merge rules from the corpus. Returns the
    * merge sequence in order; stops early if no adjacent pair remains.
    */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int): Seq[(String, String)] = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    var vocab = wordTable(docs, textCol)
      .select(split(col("w"), "").as("toks"), col("freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < nMerges && !done) {
      val best = pairCounts(vocab)
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        val prev = vocab
        vocab = vocab.withColumn("toks", mergeFold(a, b)).localCheckpoint(true)
        prev.unpersist()
      }
      round += 1
    }
    vocab.unpersist()
    merges.result()
  }

  /** Tokenize words with a learned merge list (applies rules in
    * order — same greedy fold the trainer used). Lineage is truncated
    * every 64 rules: a production merge list is 10⁴–10⁵ entries and an
    * unbounded expression chain would blow plan compilation long
    * before execution.
    */
  def applyMerges(vocab: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.zipWithIndex.foldLeft(vocab) { case (df, ((a, b), i)) =>
      val next = df.withColumn("toks", mergeFold(a, b))
      if ((i + 1) % 64 == 0) next.localCheckpoint(true) else next
    }

  /** Production tokenizer application: ONE native-expression pass that
    * repeatedly fuses the lowest-RANK pair present per row — provably
    * the same output as `applyMerges` (BpeSpec proves it on learned
    * merges) but independent of the merge-list length in plan shape:
    * a 10⁵-rule tokenizer is one projection over the corpus, not 10⁵
    * column rewrites. The rank table rides the plan (vocab-bounded).
    */
  def encode(vocab: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    // learned lists never repeat a rule (a fully-fused pair's count is
    // zero forever); a caller-supplied duplicate would re-rank the
    // pair and silently diverge from the replay semantics
    require(merges.distinct.size == merges.size,
      "merge list must not repeat a rule")
    vocab.withColumn("toks",
      graft.functions.BpeEncodeExpression.encode(col("toks"), merges))
  }
}
