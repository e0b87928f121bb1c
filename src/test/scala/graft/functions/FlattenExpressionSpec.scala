package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.encoding.Encoding

/** The native flatten expression must be drop-in bit-identical to the
  * previous UDF path, i.e. to `Encoding.flattenPair`, on every shape
  * the reference flattener handles (feature_flattener.py:22-63).
  */
class FlattenExpressionSpec extends AnyFunSuite with SparkTestBase {

  private val corpus: Seq[(String, String)] = Seq(
    ("""{"a":1,"b":{"c":2.5,"d":"x"}}""", """{"device":"iphone"}"""),
    ("""{"arr":[1,"two",true,null,{"k":3}]}""", """{"n":{"deep":{"er":1e-7}}}"""),
    ("""{"empty_obj":{},"empty_arr":[],"nul":null}""", """{}"""),
    ("\"bare-string\"", "42"),                      // primitives at the root
    ("true", "[1,2,3]"),
    ("""{"dup":1,"dup":2}""", """{"uni":"héllo→🎉"}"""), // dup keys, unicode
    ("not json at all", """{"ok":1}"""),             // one side unparseable
    ("", "   "),                                     // empty / whitespace
    (null, """{"only":"context"}"""),                // null item
    ("""{"only":"item"}""", null),                   // null context
    (null, null),
    ("""{"big":1e308,"neg":-0.0,"int":9007199254740993}""", """{"b1":true,"b0":false}"""),
    ("""{"a.b":1,"a":{"b":2}}""", """{"x":[[1,2],[3]]}""")) // path collision, nested arrays

  private def evalDirect(item: String, context: String): (Map[String, Double], Map[String, String]) = {
    val e = FlattenJsonExpression(
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(item)),
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(context)))
    val row = e.eval(InternalRow.empty).asInstanceOf[InternalRow]
    val nums = row.getMap(0).asInstanceOf[ArrayBasedMapData]
    val strs = row.getMap(1).asInstanceOf[ArrayBasedMapData]
    val numsOut = (0 until nums.numElements()).map { i =>
      nums.keyArray.asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .get(i, org.apache.spark.sql.types.StringType).toString ->
        nums.valueArray.asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
          .getDouble(i)
    }.toMap
    val strsOut = (0 until strs.numElements()).map { i =>
      strs.keyArray.asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .get(i, org.apache.spark.sql.types.StringType).toString ->
        strs.valueArray.asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
          .get(i, org.apache.spark.sql.types.StringType).toString
    }.toMap
    (numsOut, strsOut)
  }

  test("interpreted eval is identical to Encoding.flattenPair over the corpus") {
    corpus.foreach { case (item, context) =>
      val (expNums, expStrs) = Encoding.flattenPair(item, context)
      val (gotNums, gotStrs) = evalDirect(item, context)
      assert(gotStrs == expStrs, s"strs for ($item, $context)")
      assert(gotNums.keySet == expNums.keySet, s"num keys for ($item, $context)")
      gotNums.foreach { case (k, v) =>
        assert(java.lang.Double.doubleToLongBits(v) ==
          java.lang.Double.doubleToLongBits(expNums(k)),
          s"num $k for ($item, $context): $v vs ${expNums(k)}")
      }
    }
  }

  test("codegen path through a DataFrame matches flattenPair, incl. null inputs") {
    import spark.implicits._
    val df = corpus.zipWithIndex
      .map { case ((i, c), idx) => (idx, Option(i), Option(c)) }
      .toDF("id", "item", "context")
      .repartition(2) // force a real codegen stage, not LocalTableScan
    val out = Encoding.withFlatFeatures(df, "item", "context")
      .select(col("id"), col("nums"), col("strs"))
      .collect()
      .map(r => r.getInt(0) ->
        ((r.getMap[String, Double](1), r.getMap[String, String](2))))
      .toMap
    corpus.zipWithIndex.foreach { case ((item, context), idx) =>
      val (expNums, expStrs) = Encoding.flattenPair(item, context)
      val (gotNums, gotStrs) = out(idx)
      assert(gotStrs.toMap == expStrs, s"strs for row $idx")
      assert(gotNums.keySet == expNums.keySet, s"num keys for row $idx")
      gotNums.foreach { case (k, v) =>
        assert(java.lang.Double.doubleToLongBits(v) ==
          java.lang.Double.doubleToLongBits(expNums(k)), s"num $k row $idx")
      }
    }
  }

  test("result struct is never null and the plan stays inside whole-stage codegen") {
    import spark.implicits._
    val df = Seq((1, Option.empty[String], Option.empty[String]))
      .toDF("id", "item", "context").repartition(2)
    val flat = df.select(
      FlattenJsonExpression.flatten(col("item"), col("context")).as("f"))
    flat.collect() // AQE finalizes the physical plan only on execution
    val plan = flat.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [flatten_features"), plan)
    assert(!plan.contains("UDF"), plan)
    val row = flat.collect()(0)
    assert(!row.isNullAt(0))
    val f = row.getStruct(0)
    assert(f.getMap[String, Double](0).isEmpty && f.getMap[String, String](1).isEmpty)
  }

  test("withFlatFeatures schema is maps keyed by dot paths with item/context roots") {
    import spark.implicits._
    val df = Seq(("""{"brand":"b1","price":9.5}""", """{"os":"ios","v":2}"""))
      .toDF("item", "context")
    val r = Encoding.withFlatFeatures(df, "item", "context").collect()(0)
    val nums = r.getMap[String, Double](r.fieldIndex("nums")).toMap
    val strs = r.getMap[String, String](r.fieldIndex("strs")).toMap
    assert(nums == Map("item.price" -> 9.5, "context.v" -> 2.0))
    assert(strs == Map("item.brand" -> "b1", "context.os" -> "ios"))
  }
}
