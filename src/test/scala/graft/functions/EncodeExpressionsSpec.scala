package graft.functions

import scala.util.Random

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core.StringTable
import graft.encoding.Encoding

/** The native encode expressions must be bit-identical to the UDFs
  * they replaced (`makeVectorEncoder`, `nonZeroPoissonWeight`, the
  * probability v(1) extract), and the encode-stage plans must be
  * UDF-free.
  */
class EncodeExpressionsSpec extends AnyFunSuite with SparkTestBase {

  private val rnd = new Random(42)
  private val seed = 97L

  private val featureNames = Seq("item.$value", "context.a", "context.b.c", "t", "s1", "s2")
  private val tables: Map[String, Seq[Long]] = Map(
    "s1" -> StringTable.buildHashTable(Seq("red", "green", "blue"), seed),
    "s2" -> StringTable.buildHashTable(Seq("x"), seed),
    // a table for a NUMERIC-shadowed feature: encode must prefer nums
    "context.a" -> StringTable.buildHashTable(Seq("shadow"), seed))

  private def randomRow(): (Map[String, Double], Map[String, String], Double) = {
    val nums = Seq(
      "item.$value" -> (rnd.nextDouble() * 10 - 5),
      "context.a" -> (if (rnd.nextBoolean()) Double.NaN else rnd.nextDouble()),
      "t" -> 1.7e9,
      "unknown.num" -> 1.0)
      .filter(_ => rnd.nextBoolean()).toMap
    val strs = Seq(
      "s1" -> Seq("red", "green", "blue", "UNSEEN-" + rnd.nextInt(5))(rnd.nextInt(4)),
      "s2" -> "x",
      "context.a" -> "shadow", // shadowed when context.a is numeric too
      "context.b.c" -> "no-table-feature",
      "unknown.str" -> "zzz")
      .filter(_ => rnd.nextBoolean()).toMap
    val noise = if (rnd.nextBoolean()) 0.0 else rnd.nextDouble()
    (nums, strs, noise)
  }

  test("featureVector is bit-identical to makeVectorEncoder") {
    import spark.implicits._
    val rows = (0 until 300).map(_ => randomRow())
    val df = rows.toDF("nums", "strs", "noise")
    val out = df.withColumn("features",
        EncodeExpressions.featureVector(col("nums"), col("strs"), col("noise"),
          featureNames, tables, seed))
      .select("features").collect().map(_.getAs[Vector](0))
    val ref = Encoding.makeVectorEncoder(featureNames, tables, seed)
    rows.zip(out).zipWithIndex.foreach { case (((nums, strs, noise), actual), i) =>
      val expected = ref(nums, strs, noise)
      // exact comparison: doubleToLongBits catches any last-ulp drift
      val a = actual.toArray.map(java.lang.Double.doubleToLongBits)
      val e = expected.toArray.map(java.lang.Double.doubleToLongBits)
      assert(a.sameElements(e), s"row $i: $actual != $expected nums=$nums strs=$strs noise=$noise")
    }
  }

  test("nonZeroPoisson matches nonZeroPoissonWeight over the unit interval") {
    import spark.implicits._
    val us = (0 until 10000).map(_ => rnd.nextDouble()) ++
      Seq(0.0, 0.367879, 0.6321, 0.95, 0.999999, 0.99999999999)
    val out = us.toDF("u")
      .withColumn("k", Encoding.nonZeroPoisson(col("u")))
      .select("u", "k").as[(Double, Double)].collect()
    out.foreach { case (u, k) =>
      assert(k == Encoding.nonZeroPoissonWeight(u), s"u=$u")
    }
    // the zero-rejected mean: E[k] = 1/(1-1/e)
    val mean = out.map(_._2).sum / out.length
    assert(math.abs(mean - 1.0 / Encoding.NonZeroPoissonProbability) < 0.02)
  }

  test("vectorElement reads dense and sparse vectors like v(i)") {
    import spark.implicits._
    import org.apache.spark.ml.linalg.Vectors
    val vecs = Seq(
      Vectors.dense(1.0, 2.5, -3.0),
      Vectors.sparse(4, Array(1, 3), Array(7.0, 8.0)),
      Vectors.sparse(4, Array(0), Array(9.0)))
    val out = vecs.map(Tuple1(_)).toDF("v")
      .withColumn("e1", EncodeExpressions.vectorElement(col("v"), 1))
      .select("e1").as[Double].collect()
    assert(out.toSeq == vecs.map(_.apply(1)))
  }

  test("encode-stage plans are UDF-free") {
    import spark.implicits._
    // repartition forces a real exchange+project stage — a purely
    // local relation folds the projection into LocalTableScan
    val df = Seq((Map("t" -> 1.0), Map("s1" -> "red"), 0.5))
      .toDF("nums", "strs", "noise").repartition(2)
    val enc = Encoding.withFeatureVector(df, featureNames, tables, seed,
      Some(col("noise")))
    enc.collect() // finalize the adaptive plan so codegen spans are visible
    val encPlan = enc.queryExecution.executedPlan.toString
    assert(!encPlan.contains("ScalaUDF"), encPlan)
    // the `*(n)` operator prefix is the WholeStageCodegen span marker
    assert(encPlan.contains("*(1) Project"), encPlan)
    val poisPlan = df.select(Encoding.nonZeroPoisson(lit(0.3)))
      .queryExecution.executedPlan.toString
    assert(!poisPlan.contains("ScalaUDF"), poisPlan)
  }
}
