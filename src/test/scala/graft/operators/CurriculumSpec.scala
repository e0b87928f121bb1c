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

  test("edge cases: fewer rows than stages, one stage, guards") {
    import spark.implicits._
    val tiny = Seq((1L, 9L), (2L, 3L)).toDF("doc_id", "score")
    assert(distributed(tiny, 5) === plainNtile(tiny, 5))
    assert(distributed(tiny, 1) === plainNtile(tiny, 1))
    intercept[IllegalArgumentException](
      Curation.curriculumStages(tiny, "doc_id", "score", 0))
  }
}
