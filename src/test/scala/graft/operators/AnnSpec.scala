package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AnnSpec extends AnyFunSuite with SparkTestBase {

  private def clustered(nClusters: Int, perCluster: Int, dim: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian() * 5)
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield ((c * perCluster + i).toLong,
      centers(c).map(_ + rnd.nextGaussian() * 0.1).toSeq)
    (rows.toDF("vec_id", "v"), centers)
  }

  test("meanPool: weighted element-wise mean per group; null vectors contribute nothing") {
    import spark.implicits._
    val df = Seq(
      ("d1", 1.0, Seq(1.0, 0.0)),
      ("d1", 3.0, Seq(0.0, 2.0)), // weighted: (1*1+0*3)/4, (0*1+2*3)/4 = (0.25, 1.5)
      ("d2", 2.0, Seq(4.0, 6.0)),
      ("d2", 2.0, null: Seq[Double])) // null vector ignored entirely
      .toDF("doc", "w", "v")
    val pooled = Ann.meanPool(df, "doc", "v", weight = col("w"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    assert(pooled("d1") == List(0.25, 1.5))
    assert(pooled("d2") == List(4.0, 6.0))

    // unweighted default = plain element-wise mean
    val plain = Ann.meanPool(df.filter(col("doc") === "d1"), "doc", "v")
      .collect().head.getSeq[Double](1).toList
    assert(plain == List(0.5, 1.0))
  }

  test("kmeans centroids recover the cluster structure; low-nprobe search finds in-cell neighbors") {
    val dim = 16
    val (df, _) = clustered(nClusters = 4, perCluster = 50, dim = dim)
    val cents = Ann.kmeansCentroids(df, "v", k = 4, seed = 3L)
    assert(cents.length == 4)

    // each cell should hold roughly one cluster (50 ± slack)
    val cells = Ann.withCell(df, "v", cents)
      .groupBy("cell").count().collect().map(_.getLong(1))
    assert(cells.length == 4)
    assert(cells.forall(c => c > 30 && c < 70), cells.toSeq.toString)

    // query = member of cluster 0; nprobe=1 must return its own
    // cluster's members (top-k all from vec_id < 50)
    val query = df.filter(col("vec_id") === 0).select("v")
      .collect().head.getSeq[Double](0)
    val top = Ann.topK(df.filter(col("vec_id") =!= 0), "v", "vec_id",
      query, k = 10, cents, nprobe = 1)
      .select("vec_id").collect().map(_.getLong(0))
    assert(top.length == 10)
    assert(top.forall(_ < 50), s"nprobe=1 neighbors must come from the query's cluster: ${top.toSeq}")
  }

  test("nprobe = C equals brute force exactly") {
    val (df, _) = clustered(nClusters = 3, perCluster = 30, dim = 8)
    val query = df.filter(col("vec_id") === 5).select("v").collect().head.getSeq[Double](0)
    val corpus = df.filter(col("vec_id") =!= 5)
    val cents = Ann.kmeansCentroids(corpus, "v", k = 3, seed = 3L)
    val ivf = Ann.topK(corpus, "v", "vec_id", query, 15, cents, nprobe = 3)
      .select("vec_id", "cos").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val qCol = array(query.map(lit): _*)
    val brute = corpus
      .withColumn("cos", round(Ann.cosine(col("v"), qCol), 4))
      .orderBy(desc("cos"), asc("vec_id")).limit(15)
      .select("vec_id", "cos").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == brute)
  }

  test("recall@10 >= 0.9 at nprobe=2 with the k-means quantizer") {
    // quality guard against quantizer regressions: on a clustered
    // corpus, probing 2 of 8 cells must recover (nearly) all of the
    // exhaustive top-10 — the query's own cell holds its cluster and
    // the second probe covers boundary spill
    val (df, _) = clustered(nClusters = 8, perCluster = 30, dim = 16)
    val cents = Ann.kmeansCentroids(df, "v", k = 8, seed = 3L)
    val queryIds = (0 until 8).map(c => (c * 30 + 7).toLong) // one per cluster
    val recalls = queryIds.map { qid =>
      val qv = df.filter(col("vec_id") === qid).select("v")
        .collect().head.getSeq[Double](0)
      val corpus = df.filter(col("vec_id") =!= qid)
      val approx = Ann.topK(corpus, "v", "vec_id", qv, 10, cents, nprobe = 2)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = Ann.topK(corpus, "v", "vec_id", qv, 10, cents, nprobe = 8)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      approx.intersect(exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 at nprobe=2 was $mean (${recalls.toList})")
  }

  test("topKJoin: exact at nprobe = C; nprobe = 1 stays within the query's cell") {
    val (df, _) = clustered(nClusters = 3, perCluster = 30, dim = 8)
    val queries = df.filter(col("vec_id") < 3)
    val corpus = df.filter(col("vec_id") >= 3)
    val cents = Ann.kmeansCentroids(corpus, "v", k = 3, seed = 3L)

    val knn = Ann.topKJoin(queries, corpus, "v", "vec_id", "vec_id", 5, cents, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(knn.length == 15) // 3 queries × top-5
    // per query, equals the single-vector exact search
    for (qid <- 0L until 3L) {
      val qv = df.filter(col("vec_id") === qid).select("v").collect().head.getSeq[Double](0)
      val single = Ann.topK(corpus, "v", "vec_id", qv, 5, cents, nprobe = 3)
        .select("vec_id", "cos").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val mine = knn.filter(_._1 == qid).sortBy(_._4).map(r => (r._2, r._3)).toSeq
      assert(mine == single, s"query $qid")
    }
    // nprobe = 1: all neighbors of a clustered query share its cluster
    val near = Ann.topKJoin(queries, corpus, "v", "vec_id", "vec_id", 5, cents, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(near.forall { case (_, n) => n < 30 },
      s"cluster-0 queries must probe only their own cell: ${near.toSeq}")
  }

  test("meanPool excludes null ELEMENTS from both numerator and denominator") {
    import spark.implicits._
    // two equal-weight vectors; position 0 has a null in the second —
    // the pooled value must be the mean of the PRESENT values (1.0),
    // not numerator-only skipping (0.5)
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 10.0)),
      (1L, Seq[java.lang.Double](null, 30.0))).toDF("g", "v")
    val pooled = Ann.meanPool(df, "g", "v").select("pooled")
      .collect().head.getSeq[Double](0)
    assert(pooled == Seq(1.0, 20.0), pooled)
  }
}
