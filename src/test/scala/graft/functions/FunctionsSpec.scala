package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core.{Ksuid, XxHash3}

class FunctionsSpec extends AnyFunSuite with SparkTestBase {

  test("xxh3_64 native expression matches the core implementation and codegens") {
    Functions.register(spark)
    import spark.implicits._
    val df = Seq(("hello", 0L), ("hello", 42L), ("", 0L), ("héllo wörld", 7L))
      .toDF("s", "seed").createOrReplaceTempView("t")
    val rows = spark.sql("SELECT s, seed, xxh3_64(s, seed) AS h, xxh3_64(s) AS h0 FROM t")
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == XxHash3.hash(r.getString(0), r.getLong(1)))
      assert(r.getLong(3) == XxHash3.hash(r.getString(0), 0L))
    }
    // over a real scan the expression stays inside whole-stage codegen
    graft.queries.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("li")
    val q = spark.sql("SELECT xxh3_64(l_returnflag, l_orderkey) AS h FROM li")
    // "*(1) Project [xxh3_64(...)]" — the star marks WholeStageCodegen
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [xxh3_64("), plan)
    val h = q.limit(1).collect().head.getLong(0) // executes the generated code
    val src = spark.sql("SELECT l_returnflag, l_orderkey FROM li LIMIT 1").collect().head
    assert(XxHash3.hash(src.getString(0), src.getLong(1)) == h)
  }

  test("ksuid + json functions usable from SQL") {
    Functions.register(spark)
    val id = Ksuid.deterministic(1660000000L, 5L)
    val rows = spark.sql(
      s"""SELECT ksuid_timestamp('$id') AS ts,
         |       is_valid_ksuid('$id', 1700000000) AS ok,
         |       is_valid_ksuid('$id', 1600000000) AS future,
         |       to_sorted_json('{"b":1,"a":{"d":2,"c":3}}') AS cj,
         |       wrap_primitive_json('5') AS wp,
         |       flatten_json('{"x":{"y":1},"s":"v"}', 'item') AS fl
         |""".stripMargin).collect().head
    assert(rows.getLong(0) == 1660000000L)
    assert(rows.getBoolean(1))
    assert(!rows.getBoolean(2)) // id is in the "future" relative to 2020
    assert(rows.getString(3) == """{"a":{"c":3,"d":2},"b":1}""")
    assert(rows.getString(4) == """{"$value":5}""")
    assert(rows.getMap[String, String](5).toMap ==
      Map("item.x.y" -> "1.0", "item.s" -> "v"))
  }
}
