package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for embedding compression + fast approximate
  * scoring — the in-cell companion to IVF (`Ann`/`IvfIndex`): IVF
  * prunes WHICH vectors to score, PQ makes scoring each one cheap and
  * the stored corpus small (m bytes instead of dim floats per vector —
  * 32× at dim=64/m=8).
  *
  * The codebook (m subspaces × k codewords × dim/m floats = dim·k
  * floats total) is the ONLY driver-side state — it is bounded by the
  * geometry, never by the corpus; training samples the corpus and
  * encode/score are per-row maps against the broadcast codebook, so
  * every stage scales with executors.
  *
  * Asymmetric distance computation (ADC): a query precomputes its
  * inner product with every codeword (m·k values), and a candidate's
  * approximate inner product is m table lookups on its code — no
  * float math against the original vector, which never needs to be
  * read at all. Exact per-vector norms are kept at encode time (one
  * float) so approximate COSINE is ip̂ / (‖q‖·‖v‖) with the true norms.
  */
object Pq {

  /** codebook(sub)(code) = centroid subvector of length dim/m. */
  type Codebook = Array[Array[Array[Double]]]

  /** Train per-subspace codebooks with seeded k-means over (a sample
    * of) the corpus. k ≤ 256 keeps one code per byte.
    */
  def train(df: DataFrame, vecCol: String, dim: Int, m: Int, k: Int,
      seed: Long = 11L, sampleFraction: Double = 1.0): Codebook = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(k <= 256, "k > 256 no longer fits one byte per code")
    import org.apache.spark.ml.functions.array_to_vector
    val sub = dim / m
    val sampled = if (sampleFraction < 1.0) df.sample(sampleFraction, seed) else df
    // one narrow pass materializes all m subvector columns, then m
    // bounded k-means fits (each sees only dim/m-wide data)
    val subCols = (0 until m).map(i =>
      slice(col(vecCol), i * sub + 1, sub).as(s"_s$i"))
    val subs = sampled.select(subCols: _*).persist()
    try {
      (0 until m).map { i =>
        val model = new org.apache.spark.ml.clustering.KMeans()
          .setK(k).setSeed(seed + i).setMaxIter(20)
          .fit(subs.select(array_to_vector(col(s"_s$i")).as("features")))
        model.clusterCenters.map(_.toArray)
      }.toArray
    } finally { subs.unpersist(blocking = false); () }
  }

  /** Adds `code` (array<tinyint>-like int array, m entries) and
    * `vnorm` (the exact L2 norm, for cosine reconstruction).
    */
  def encode(df: DataFrame, vecCol: String, codebook: Codebook): DataFrame =
    df.withColumn("code",
        graft.functions.CentroidExpressions.pqEncode(col(vecCol), codebook))
      .withColumn("vnorm", Ann.norm(col(vecCol)))

  /** Approximate cosine top-k of `query` over an ENCODED corpus via
    * ADC — reads only (id, code, vnorm); never touches the vectors.
    */
  def topK(encoded: DataFrame, idCol: String, query: Seq[Double],
      k: Int, codebook: Codebook): DataFrame = {
    val m = codebook.length
    val sub = codebook(0)(0).length
    // query × codeword inner-product table: m·|codes| doubles, computed
    // once on the driver and broadcast inside the scoring closure
    val table = Array.tabulate(m, codebook(0).length) { (i, c) =>
      var s = 0.0
      var j = 0
      while (j < sub) { s += query(i * sub + j) * codebook(i)(c)(j); j += 1 }
      s
    }
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    // native codegen ADC (graft.functions.AdcScoreExpression) — same
    // left-to-right summation as the former UDF, no per-row boxing;
    // the table flattens row-major: (subspace i, codeword c) at i·k+c
    val adcCol = graft.functions.VectorExpressions.adcScore(
      col("code"), table.flatten, codebook(0).length)
    encoded
      .withColumn("cos_approx",
        round(adcCol / (lit(qNorm) * col("vnorm")), 4))
      .orderBy(desc("cos_approx"), asc(idCol))
      .limit(k)
  }
}
