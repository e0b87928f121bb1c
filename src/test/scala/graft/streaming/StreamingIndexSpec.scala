package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.IvfIndex

class StreamingIndexSpec extends AnyFunSuite with SparkTestBase {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("label", IntegerType),
    StructField("v", ArrayType(DoubleType))))

  private def vecs(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map { i =>
      (i, (i % 3).toInt, Seq.tabulate(6)(j => math.sin(i * 7.0 + j) + 2.0))
    }.toDF("vec_id", "label", "v")
  }

  test("micro-batched stream appends equal the one-shot batch append") {
    val work = Files.createTempDirectory("sidx").toString
    val base = vecs(1L to 40L)
    val delta = vecs(41L to 80L)
    val streamed = IvfIndex.build(base, "v", "vec_id", s"$work/stream_idx",
      numCells = 4, seed = 3L)
    delta.repartition(2).write.mode("overwrite").json(s"$work/drop")
    StreamingIndex.appendStream(spark, s"$work/drop", s"$work/ckpt",
      streamed, "v", schema).awaitTermination()

    val batch = IvfIndex.build(base, "v", "vec_id", s"$work/batch_idx",
      numCells = 4, seed = 3L)
    IvfIndex.append(batch, delta, "v")

    val q = Seq.tabulate(6)(j => math.sin(5 * 7.0 + j) + 2.0)
    def top(idx: IvfIndex.Index) =
      IvfIndex.topK(spark, idx, "v", "vec_id", q, 10, nprobe = 4)
        .select("vec_id", "cos").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(streamed) === top(batch))
    // every delta row landed exactly once
    assert(spark.read.parquet(s"$work/stream_idx/cells").count() === 80L)
  }

  test("an empty drop folder appends nothing and leaves the index intact") {
    val work = Files.createTempDirectory("sidx2").toString
    val base = vecs(1L to 20L)
    val idx = IvfIndex.build(base, "v", "vec_id", s"$work/idx",
      numCells = 2, seed = 3L)
    Files.createDirectories(java.nio.file.Paths.get(s"$work/drop"))
    StreamingIndex.appendStream(spark, s"$work/drop", s"$work/ckpt",
      idx, "v", schema).awaitTermination()
    assert(spark.read.parquet(s"$work/idx/cells").count() === 20L)
  }
}
