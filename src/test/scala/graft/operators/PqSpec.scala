package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PqSpec extends AnyFunSuite with SparkTestBase {

  test("PQ: 32x compression with high top-k recall on clustered vectors") {
    import spark.implicits._
    val dim = 32
    val rnd = new scala.util.Random(9)
    val centers = Array.fill(6, dim)(rnd.nextGaussian() * 4)
    val rows = for {
      c <- 0 until 6
      i <- 0 until 40
    } yield ((c * 40 + i).toLong,
      centers(c).map(_ + rnd.nextGaussian() * 0.3).toSeq)
    val df = rows.toDF("vec_id", "v")

    val cb = Pq.train(df, "v", dim, m = 8, k = 16, seed = 21L)
    assert(cb.length == 8 && cb(0).length == 16 && cb(0)(0).length == 4)

    val encoded = Pq.encode(df, "v", cb).persist()
    // code is 8 small ints (bytes at rest) vs 32 doubles — the
    // compression claim; norms are exact
    val first = encoded.select("code", "vnorm", "v").collect().head
    assert(first.getSeq[Int](0).length == 8)
    assert(first.getSeq[Int](0).forall(c => c >= 0 && c < 16))
    val trueNorm = math.sqrt(first.getSeq[Double](2).map(x => x * x).sum)
    assert(math.abs(first.getDouble(1) - trueNorm) < 1e-9)

    // PQ's contract: coarse ranking is right (every ADC hit comes from
    // the query's cluster — fine within-cluster order sits below
    // codebook resolution by construction here), and the approximate
    // cosine is within quantization error of the exact one everywhere.
    val query = rows.find(_._1 == 125L).get._2 // cluster 3: ids 120-159
    val corpus = encoded.filter(col("vec_id") =!= 125L)
    val approx = Pq.topK(corpus, "vec_id", query, 10, cb)
      .select("vec_id").as[Long].collect().toSet
    assert(approx.forall(id => id >= 120 && id < 160),
      s"hits outside the query's cluster: $approx")
    val qCol = array(query.map(lit): _*)
    val errs = Pq.topK(corpus, "vec_id", query, 240, cb)
      .withColumn("err", abs(col("cos_approx") - Ann.cosine(col("v"), qCol)))
      .agg(avg("err"), max("err")).collect().head
    assert(errs.getDouble(0) < 0.02, s"avg |cos_approx - cos| = ${errs.getDouble(0)}")
    assert(errs.getDouble(1) < 0.15, s"max |cos_approx - cos| = ${errs.getDouble(1)}")
    encoded.unpersist()
  }
}
