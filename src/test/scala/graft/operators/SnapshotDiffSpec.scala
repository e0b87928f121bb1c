package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SnapshotDiffSpec extends AnyFunSuite with SparkTestBase {

  private def diff(prev: Seq[(Long, String)], next: Seq[(Long, String)],
      cols: Seq[String] = Seq("text")): Map[Long, String] = {
    import spark.implicits._
    Curation.snapshotDiff(prev.toDF("doc_id", "text"),
        next.toDF("doc_id", "text"), "doc_id", cols)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("classifies added / removed / changed / unchanged") {
    val got = diff(
      prev = Seq(1L -> "a", 2L -> "b", 3L -> "c"),
      next = Seq(2L -> "b", 3L -> "c2", 4L -> "d"))
    assert(got === Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("null content and sentinel separators never collide") {
    import spark.implicits._
    // (null,"a") vs ("a",null) vs ("","a") vs ("a","") must all hash
    // apart — the \u0001 separator and \u0000 null sentinel do that
    val prev = Seq((1L, null.asInstanceOf[String], "a"), (2L, "a", null.asInstanceOf[String]),
      (3L, "", "a"), (4L, "a", "")).toDF("doc_id", "c1", "c2")
    val next = Seq((1L, "a", null.asInstanceOf[String]), (2L, "", "a"),
      (3L, "a", ""), (4L, null.asInstanceOf[String], "a")).toDF("doc_id", "c1", "c2")
    val got = Curation.snapshotDiff(prev, next, "doc_id", Seq("c1", "c2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.values.forall(_ == "changed"), got)
    // and identical null-carrying rows are unchanged
    val same = Curation.snapshotDiff(prev, prev, "doc_id", Seq("c1", "c2"))
      .collect().map(r => r.getString(1)).toSet
    assert(same === Set("unchanged"))
  }

  test("disjoint snapshots and guards") {
    val got = diff(prev = Seq(1L -> "x"), next = Seq(2L -> "y"))
    assert(got === Map(1L -> "removed", 2L -> "added"))
    import spark.implicits._
    intercept[IllegalArgumentException](
      Curation.snapshotDiff(Seq((1L, "a")).toDF("doc_id", "text"),
        Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", Nil))
  }
}
