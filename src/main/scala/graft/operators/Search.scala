package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval over a document corpus: TF-IDF weighting, BM25
  * ranking, and reciprocal-rank fusion for hybrid (lexical ⊕ vector)
  * retrieval — the other half of a training-data search stack next to
  * the ANN operators (Ann/IvfIndex).
  *
  * Scale shape: everything is explode → groupBy → equi-join on `term`
  * or the doc id, i.e. hash-partitioned relational ops that scale with
  * the corpus. Corpus-level statistics (N, avgdl) are 1-row aggregates
  * cross-joined back in (Spark broadcasts the single row); per-term
  * document frequencies stay a RELATION joined on term — never driver
  * state, so a web-scale vocabulary is fine.
  */
object Search {

  /** whitespace tokenization, consistent with TextOps/DuckDB mirrors. */
  private def terms(textCol: Column): Column = split(trim(textCol), " ")

  /** (id, term, tf): term frequencies per document. */
  def termFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(terms(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** TF-IDF weights: tfidf = tf · ln(N / df). Returns
    * (id, term, tf, df, tfidf) — one row per posting, the inverted-
    * index relation with weights attached.
    */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    // tf is unique per (id, term), so count(*) per term IS the df
    val dfByTerm = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    tf.join(dfByTerm, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .select(idCol, "term", "tf", "df", "tfidf")
  }

  /** Okapi BM25 scores of every document against a bag of query terms.
    *
    * score(D,Q) = Σ_{t∈Q} idf(t) · tf(t,D)·(k1+1) /
    *              (tf(t,D) + k1·(1 − b + b·|D|/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * The query-term filter lands directly on the exploded postings, so
    * only |Q| terms' postings ever reach the join — document frequency
    * is computed over exactly those. Returns (id, bm25) for documents
    * matching ≥ 1 query term.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty BM25 query")
    val words = docs.select(col(idCol), terms(col(textCol)).as("_ws"))
    val lens = words.select(col(idCol), size(col("_ws")).as("dl"))
    val tf = words.select(col(idCol), explode(col("_ws")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfByTerm = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    tf.join(dfByTerm, "term")
      .join(lens, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(sum("w").as("bm25"))
  }

  /** More-like-this: rank documents by cosine similarity to a QUERY
    * DOCUMENT in TF-IDF space — sim(q,d) = Σ_t w_q(t)·w_d(t) /
    * (‖w_q‖·‖w_d‖) over shared terms. One posting self-join on term:
    * the query side is a single document's postings (tiny), the corpus
    * side stays partitioned; norms come from a per-doc aggregate of
    * the same weighted relation. The query doc itself is excluded.
    */
  def moreLikeThis(docs: DataFrame, idCol: String, textCol: String,
      queryId: Any): DataFrame = {
    // the weighted relation feeds four consumers (query terms, query
    // norm, corpus norms, the dot join) — persist it for the operator's
    // lifetime and materialize the (top-list-sized) result eagerly so
    // the corpus-sized cache can be released, same pattern as
    // Dedup.verifiedPairs
    val weighted = tfIdf(docs, idCol, textCol).persist()
    try {
      val norms = weighted.groupBy(col(idCol))
        .agg(sqrt(sum(col("tfidf") * col("tfidf"))).as("_norm"))
      val q = weighted.filter(col(idCol) === lit(queryId))
        .select(col("term"), col("tfidf").as("_wq"))
      val qNorm = norms.filter(col(idCol) === lit(queryId))
        .select(col("_norm").as("_qnorm"))
      val out = weighted.filter(col(idCol) =!= lit(queryId))
        .join(q, "term") // query side is one doc's terms — auto-broadcast
        .groupBy(col(idCol))
        .agg(sum(col("tfidf") * col("_wq")).as("_dot"))
        .join(norms, idCol)
        .crossJoin(broadcast(qNorm))
        .withColumn("sim", col("_dot") / (col("_norm") * col("_qnorm")))
        .select(col(idCol), col("sim"))
      Caching.handOff(out)
    } finally weighted.unpersist(blocking = false)
  }

  /** Reciprocal-rank fusion: rrf(d) = Σ_lists 1/(k + rank_list(d)).
    * Each input carries (idCol, "rank") with rank starting at 1; ids
    * absent from a list simply contribute nothing (standard RRF). The
    * union + groupBy is one shuffle over rank-list-sized data —
    * independent of corpus size when the inputs are top-N lists.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "no rankings to fuse")
    rankings
      .map(_.select(col(idCol),
        (lit(1.0) / (lit(k) + col("rank"))).as("_c")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum("_c").as("rrf"), count(lit(1)).as("n_lists"))
  }
}
