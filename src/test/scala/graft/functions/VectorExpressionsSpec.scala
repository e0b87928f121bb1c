package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class VectorExpressionsSpec extends AnyFunSuite with SparkTestBase {

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    def nrm(v: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot(a, b) / (nrm(a) * nrm(b))
  }

  test("native cosine is bit-identical to the HOF spelling on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextDouble() * 2 - 1), Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b").repartition(4)
    val cmp = df.select(
        graft.functions.VectorExpressions.arrayCosine(col("a"), col("b")).as("native"),
        hofCosine(col("a"), col("b")).as("hof"))
      .collect()
    cmp.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
  }

  test("null semantics mirror the HOF version: null input, length mismatch, null element") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(1.0), Some(2.0)))),
      (2L, None, Some(Seq(Some(1.0), Some(2.0)))),                     // null input
      (3L, Some(Seq(Some(1.0))), Some(Seq(Some(1.0), Some(2.0)))),     // length mismatch
      (4L, Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))) // null element
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
        graft.functions.VectorExpressions.arrayCosine(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(2L).isEmpty && out(3L).isEmpty && out(4L).isEmpty)
    assert(math.abs(out(1L).get - 1.0) < 1e-12)
    // the plan stays inside whole-stage codegen (no UDF, no fallback);
    // repartition first or the local relation collapses to a
    // LocalTableScan evaluated at plan time
    val framed = df.repartition(2)
      .select(graft.functions.VectorExpressions.arrayCosine(col("a"), col("b")))
    framed.collect() // AQE finalizes the physical plan only on execution
    val plan = framed.queryExecution.executedPlan.toString
    // the "*(n)" stage prefix is AQE's compact WholeStageCodegen marker
    assert(plan.contains("*(1) Project [array_cosine"), plan)
  }

  test("adc_score: valid lookup, and invalid codes/null elements yield null") {
    import spark.implicits._
    val table = Array(2.0, 3.0, 5.0, 7.0) // 2 subspaces x 2 codewords
    val df = Seq(
      (1L, Some(Seq(Some(0), Some(1)))),  // 2.0 + 7.0
      (2L, Some(Seq(Some(0), Some(5)))),  // code out of range
      (3L, Some(Seq(Some(0), None))),     // null element
      (4L, Some(Seq(Some(-1), Some(0))))  // negative code
    ).toDF("id", "code")
    val out = df.select(col("id"),
        graft.functions.VectorExpressions.adcScore(col("code"), table, 2).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map(1L -> Some(9.0), 2L -> None, 3L -> None, 4L -> None))
  }

  test("type check rejects non-double arrays") {
    import spark.implicits._
    val bad = Seq((Seq(1, 2), Seq(1, 2))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(graft.functions.VectorExpressions.arrayCosine(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"), e.getMessage)
  }
}
