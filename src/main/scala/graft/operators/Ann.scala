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

  /** Proper coarse quantizer: seeded spherical k-means (cosine — the
    * metric cells are assigned and probed by) over a SAMPLE-BOUNDED
    * training set. This is the variant to use at scale; `centroids`
    * exists for deterministic fixtures.
    *
    * Why driver-local Lloyd's and not a distributed fit: quantizer
    * training is a 128·k-vector task (the FAISS operating practice —
    * past ~10²–10³ vectors per centroid the cells stop moving), so at
    * ANY corpus size the training set is driver-bounded by
    * construction, like the centroid/boundary collects everywhere
    * else in the engine. A distributed fit pays ~20 scheduler
    * round-trips per build for work that is milliseconds of local
    * arithmetic at gate scale and ~1 s (parallel streams) at the
    * 512-cell stress scale; the corpus-wide work — the assignment
    * pass — stays distributed (withCell's codegen expression).
    * Deterministic: the sample is re-sorted into a content order
    * (collect order is partition-layout-dependent), init is a seeded
    * shuffle, ties break by lowest centroid index.
    */
  def kmeansCentroids(df: DataFrame, vecCol: String, k: Int, seed: Long = 7L,
      sampleFraction: Double = 1.0, maxIter: Int = 20): Array[Seq[Double]] = {
    require(k >= 1, s"k must be >= 1: $k")
    val sampled = if (sampleFraction < 1.0) df.sample(sampleFraction, seed) else df
    val pool = sampled.select(col(vecCol)).filter(col(vecCol).isNotNull)
    val n = pool.count()
    require(n > 0, "kmeansCentroids: no non-null vectors")
    val cap = 128 * k
    val fetch =
      if (n <= cap) pool
      // 1.3 oversample: Bernoulli sampling undershoots; truncate below
      else pool.sample(math.min(1.0, cap * 1.3 / n), seed)
    val raw = fetch.collect().map(_.getSeq[Double](0).toArray)
    val pts = raw.sortWith(lexLess).take(math.min(cap, raw.length)).map(normUnit)
    val dim = pts.head.length
    // farthest-point init (deterministic k-means++ flavor): a seeded
    // pick for the first center, then greedily the point with the
    // LARGEST min-cosine-distance to the chosen set (ties by sample
    // order). Spread-out seeds keep Lloyd's out of the
    // split-one-cluster/merge-two local optimum a naive random init
    // lands in on well-separated data.
    val rnd = new java.util.Random(seed)
    val first = rnd.nextInt(pts.length)
    val chosen = scala.collection.mutable.ArrayBuffer[Array[Double]](pts(first))
    val minDist = Array.fill(pts.length)(Double.PositiveInfinity)
    while (chosen.length < k) {
      val last = chosen.last
      var best = -1; var bestD = Double.NegativeInfinity
      var p = 0
      while (p < pts.length) {
        var d = 0.0; var e = 0
        val v = pts(p)
        while (e < dim) { d += v(e) * last(e); e += 1 }
        val dist = 1.0 - d
        if (dist < minDist(p)) minDist(p) = dist
        if (minDist(p) > bestD) { bestD = minDist(p); best = p }
        p += 1
      }
      chosen += pts(best)
    }
    var cents = chosen.toArray
    val assign = new Array[Int](pts.length)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val cur = cents
      // assignment: the O(sample · k · dim) hot loop, parallel
      java.util.stream.IntStream.range(0, pts.length).parallel().forEach { p =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < cur.length) {
          var d = 0.0; var e = 0
          val v = pts(p); val ct = cur(c)
          while (e < dim) { d += v(e) * ct(e); e += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        assign(p) = best
      }
      // recompute: sequential O(sample · dim); empty cluster keeps its
      // centroid (deterministic, matches the frozen-quantizer spirit)
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      var p = 0
      while (p < pts.length) {
        val c = assign(p); counts(c) += 1
        val v = pts(p); val s = sums(c)
        var e = 0
        while (e < dim) { s(e) += v(e); e += 1 }
        p += 1
      }
      val next = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c) else normUnit(sums(c)))
      moved = next.indices.exists(c => !java.util.Arrays.equals(next(c), cents(c)))
      cents = next
      iter += 1
    }
    cents.map(_.toSeq)
  }

  private def normUnit(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val m = math.sqrt(s)
    if (m == 0.0) v.clone() else v.map(_ / m)
  }

  /** Deterministic lexicographic order on vectors (shorter first on
    * shared prefix) — the content sort that makes the collected
    * training sample independent of partition layout.
    */
  private def lexLess(a: Array[Double], b: Array[Double]): Boolean = {
    val len = math.min(a.length, b.length)
    var i = 0
    while (i < len) {
      if (a(i) < b(i)) return true
      if (a(i) > b(i)) return false
      i += 1
    }
    a.length < b.length
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
