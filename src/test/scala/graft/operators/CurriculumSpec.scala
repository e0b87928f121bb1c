package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CurriculumSpec extends AnyFunSuite with SparkTestBase {

  private def plainNtile(df: org.apache.spark.sql.DataFrame,
      stages: Int): Map[Long, (Long, Int)] = {
    val w = Window.orderBy(col("score"), col("doc_id"))
    df.withColumn("_rank", row_number().over(w).cast("long"))
      .withColumn("stage", ntile(stages).over(w))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("_rank"), r.getAs[Int]("stage")))).toMap
  }

  private def distributed(df: org.apache.spark.sql.DataFrame,
      stages: Int): Map[Long, (Long, Int)] =
    Curation.curriculumStages(df, "doc_id", "score", stages)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("_rank"), r.getAs[Int]("stage")))).toMap

  test("randomized differential: equals the plain ntile window exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    for (trial <- 1 to 4) {
      val n = 1 + rnd.nextInt(200)
      val stages = 1 + rnd.nextInt(7)
      // few distinct scores -> heavy ties, the case the within-score
      // row_number + histogram offset must get right
      val docs = (1L to n.toLong).map(i => (i, rnd.nextInt(6).toLong))
        .toDF("doc_id", "score")
      assert(distributed(docs.repartition(5), stages) === plainNtile(docs, stages),
        s"trial $trial (n=$n stages=$stages)")
    }
  }

  test("null scores rank first and are never dropped (plain-window parity)") {
    import spark.implicits._
    val docs = Seq((1L, Some(5L)), (2L, Option.empty[Long]), (3L, Some(1L)),
      (4L, Option.empty[Long]), (5L, Some(5L))).toDF("doc_id", "score")
    val d = distributed(docs, 2)
    assert(d === plainNtile(docs, 2))
    assert(d.size === 5, "null-score rows must survive")
    assert(Set(d(2L)._1, d(4L)._1) === Set(1L, 2L), "nulls occupy the first ranks")
  }

  test("empty input returns an empty frame, not an error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "score")
    assert(Curation.curriculumStages(empty, "doc_id", "score", 4).count() === 0L)
  }

  test("edge cases: fewer rows than stages, one stage, guards") {
    import spark.implicits._
    val tiny = Seq((1L, 9L), (2L, 3L)).toDF("doc_id", "score")
    assert(distributed(tiny, 5) === plainNtile(tiny, 5))
    assert(distributed(tiny, 1) === plainNtile(tiny, 1))
    intercept[IllegalArgumentException](
      Curation.curriculumStages(tiny, "doc_id", "score", 0))
  }
}
