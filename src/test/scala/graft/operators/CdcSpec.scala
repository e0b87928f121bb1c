package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CdcSpec extends AnyFunSuite with SparkTestBase {

  test("applyChangelog: last-write-wins upsert/delete/insert/keep") {
    import spark.implicits._
    val base = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("k", "v", "s")
    // per key, later (ts, cid) wins: key 1 upserted then deleted; key 2
    // deleted then re-upserted; key 4 inserted (absent from base);
    // key 3 untouched
    val changes = Seq(
      (1L, 1L, 1L, false, 11L, "x"),
      (1L, 2L, 1L, true, 0L, ""),
      (2L, 1L, 1L, true, 0L, ""),
      (2L, 1L, 2L, false, 22L, "y"),
      (4L, 9L, 1L, false, 44L, "z"))
      .toDF("k", "ts", "cid", "del", "v", "s")
    val got = Cdc.applyChangelog(base, changes,
      keyCols = Seq("k"), ordCols = Seq("ts", "cid"),
      opCol = "del", payloadCols = Seq("v", "s"))
      .collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("v"), r.getAs[String]("s"), r.getAs[String]("_src"))))
      .toMap
    assert(got == Map(
      2L -> ((22L, "y", "upsert")),
      3L -> ((30L, "c", "base")),
      4L -> ((44L, "z", "upsert"))))
  }

  test("applyChangelog: rejects empty key/order/payload specs") {
    import spark.implicits._
    val df = Seq((1L, 1L, false, 1L)).toDF("k", "ts", "del", "v")
    intercept[IllegalArgumentException](
      Cdc.applyChangelog(df, df, Seq.empty, Seq("ts"), "del", Seq("v")))
    intercept[IllegalArgumentException](
      Cdc.applyChangelog(df, df, Seq("k"), Seq.empty, "del", Seq("v")))
    intercept[IllegalArgumentException](
      Cdc.applyChangelog(df, df, Seq("k"), Seq("ts"), "del", Seq.empty))
  }

  test("applyChangelog: re-applying an already-applied changelog is idempotent") {
    import spark.implicits._
    val base = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "v", "s")
    val changes = Seq((1L, 1L, 1L, false, 11L, "x"))
      .toDF("k", "ts", "cid", "del", "v", "s")
    val once = Cdc.applyChangelog(base, changes,
      Seq("k"), Seq("ts", "cid"), "del", Seq("v", "s"))
    val twice = Cdc.applyChangelog(once.drop("_src"), changes,
      Seq("k"), Seq("ts", "cid"), "del", Seq("v", "s"))
    val a = once.orderBy("k").select("k", "v", "s").collect().toSeq
    val b = twice.orderBy("k").select("k", "v", "s").collect().toSeq
    assert(a == b)
  }
}
