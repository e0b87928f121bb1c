package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest neighbor over an embedding column.
  *
  * IVF (inverted file) layout: C coarse centroids partition the
  * corpus into cells; a query scores only the cells whose centroids
  * rank in its top `nprobe` — at nprobe = C the search is exhaustive
  * (exact brute-force baseline), at nprobe ≪ C only a fraction of the
  * corpus is scanned. The cell assignment is a narrow per-row map
  * against broadcast centroids; the cell column doubles as the
  * partition key at scale, turning a probe into partition pruning.
  *
  * Vector math is higher-order array functions (zip_with/aggregate) —
  * codegen'd, no UDF in the scoring path.
  */
object Ann {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Native single-pass codegen expression (dot + both norms in one
    * loop over the arrays) — bit-identical to the HOF spelling
    * `dot(a,b)/(norm(a)*norm(b))` but without the zip/transform
    * intermediates; this is the inner loop of every brute-force /
    * verify / rerank path.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.arrayCosine(a, b)

  /** Weighted element-wise mean pooling of vectors per group — the
    * chunk→document aggregation of an embedding pipeline (pool chunk
    * embeddings, weighted e.g. by chunk length, back to one vector
    * per document; compose with `Curation.chunkDocuments` upstream
    * and any ANN/dedup operator downstream). Null vectors contribute
    * nothing; a group with only null vectors yields no row; a null
    * ELEMENT inside a vector is excluded from that position's mean
    * entirely (numerator AND denominator — counting its weight in the
    * denominator alone would silently bias the position toward 0).
    *
    * Scale shape: posexplode → ONE hash aggregation keyed
    * (group, position) → per-group array rebuild; never collects, and
    * the shuffled relation is (groups × dim) rows of scalars.
    */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String,
      weight: Column = lit(1.0)): DataFrame =
    df.select(col(groupCol), weight.cast("double").as("_w"),
        posexplode(col(vecCol)).as(Seq("_p", "_x")))
      .filter(col("_x").isNotNull)
      .groupBy(groupCol, "_p")
      .agg((sum(col("_x") * col("_w")) / sum(col("_w"))).as("_mx"))
      .groupBy(groupCol)
      .agg(transform(array_sort(collect_list(struct(col("_p"), col("_mx")))),
        s => s.getField("_mx")).as("pooled"))

  /** Deterministic coarse centroids: the first C vectors by id (a
    * cheap stand-in when clustering quality doesn't matter; the IVF
    * mechanics are identical).
    */
  def centroids(df: DataFrame, vecCol: String, idCol: String, c: Int): Array[Seq[Double]] =
    df.orderBy(col(idCol)).limit(c).select(col(vecCol))
      .collect().map(_.getSeq[Double](0))

  /** Proper coarse quantizer: seeded k-means over (a sample of) the
    * corpus — better-balanced cells ⇒ better recall per probe. This is
    * the variant to use at scale; `centroids` exists for deterministic
    * fixtures.
    */
  def kmeansCentroids(df: DataFrame, vecCol: String, k: Int, seed: Long = 7L,
      sampleFraction: Double = 1.0): Array[Seq[Double]] = {
    import org.apache.spark.ml.functions.array_to_vector
    val sampled = if (sampleFraction < 1.0) df.sample(sampleFraction, seed) else df
    val vecs = sampled.select(array_to_vector(col(vecCol)).as("features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed).setMaxIter(20)
      // cells are assigned and probed by cosine (withCell/topK), so
      // the quantizer must optimize the same metric
      .setDistanceMeasure("cosine")
      .fit(vecs)
    model.clusterCenters.map(_.toArray.toSeq)
  }

  /** Adds a `cell` column: index of the nearest centroid — a native
    * codegen expression (NearestCellExpression) carrying the centroids
    * as plan data, so the corpus-wide assignment pass stays inside
    * WholeStageCodegen with no per-row Seq boxing.
    */
  def withCell(df: DataFrame, vecCol: String, cents: Array[Seq[Double]]): DataFrame =
    df.withColumn("cell",
      graft.functions.CentroidExpressions.nearestCell(col(vecCol), cents))

  /** The `nprobe` cell indices whose centroids are cosine-nearest to
    * the query (driver-side: C centroids, not corpus-sized).
    */
  def nearestCells(query: Seq[Double], cents: Array[Seq[Double]], nprobe: Int): Seq[Int] =
    cents.zipWithIndex.map { case (cent, i) =>
      val qn = math.sqrt(query.map(x => x * x).sum)
      val cn = math.sqrt(cent.map(x => x * x).sum)
      (i, query.zip(cent).map { case (a, b) => a * b }.sum / (qn * cn + 1e-12))
    }.sortBy(-_._2).take(nprobe).map(_._1).toSeq

  /** k-NN JOIN — the batch production shape: every row of `queries`
    * finds its top-k cosine neighbors in `corpus` at once (vs `topK`'s
    * one driver-side vector). nprobe == centroids.length ⇒ exact.
    *
    * Scale shape: queries explode to (query, probed-cell) — nprobe
    * rows each — and meet the cell-assigned corpus in ONE
    * hash-partitioned equi-join on `cell`; scored candidates then
    * rank per query in a partitioned window. Work is
    * Σ_query Σ_probed-cell |cell| — the IVF contract — and both
    * shuffles are keyed (cell, then query id): nothing is ever
    * broadcast or collected, so query set and corpus may BOTH be
    * corpus-sized. With an `IvfIndex`-materialized corpus the cell
    * join becomes a partition-pruned read instead of a fresh
    * assignment pass.
    */
  def topKJoin(queries: DataFrame, corpus: DataFrame, vecCol: String,
      idCol: String, qIdCol: String, k: Int,
      cents: Array[Seq[Double]], nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(qIdCol).as("query_id"), col(vecCol).as("_qv"))
      .withColumn("cell", explode(
        graft.functions.CentroidExpressions.nearestCells(col("_qv"), cents, nprobe)))
    val joined = q.join(withCell(corpus, vecCol, cents), Seq("cell"))
      .withColumn("cos", round(cosine(col("_qv"), col(vecCol)), 4))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc(idCol))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", idCol, "cos", "rank")
  }

  /** Top-k cosine neighbors of `query` scanning only the `nprobe`
    * cells nearest to it. nprobe == centroids.length ⇒ exact.
    */
  def topK(df: DataFrame, vecCol: String, idCol: String, query: Seq[Double],
      k: Int, cents: Array[Seq[Double]], nprobe: Int): DataFrame = {
    val probed = nearestCells(query, cents, nprobe)

    val withCells = withCell(df, vecCol, cents)
      .filter(col("cell").isin(probed: _*))
    val qCol = array(query.map(lit): _*)
    withCells
      .withColumn("cos", round(cosine(col(vecCol), qCol), 4))
      .orderBy(desc("cos"), asc(idCol))
      .limit(k)
  }
}
