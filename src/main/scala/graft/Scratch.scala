package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness — not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 100000).selectExpr("sum(id * 2)").collect()
    val d = "/root/testdata/sf0.1"
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "nd_prof").toString
    val docs = graft.queries.Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).filter(col("text").isNotNull)
    t("fixture json write") {
      docs.repartition(4).write.mode("overwrite").json(s"$work/drop")
    }
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    t("flagStream total") {
      graft.streaming.StreamingNearDup.flagStream(
        spark, s"$work/drop", s"$work/nd", s"$work/ckpt")
        .awaitTermination()
    }
    spark.conf.set("spark.sql.shuffle.partitions", old)
    t("readback") {
      println("flags=" + spark.read.parquet(s"$work/nd/flags")
        .select("doc_id").distinct().count() +
        " fps=" + spark.read.parquet(s"$work/nd/fps").count())
    }
    // per-batch decomposition: rerun batches by hand
    val work2 = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "nd_prof2").toString
    val parts = docs.repartition(4).persist()
    parts.count()
    val batches = (0 until 4).map(i =>
      parts.filter(pmod(col("doc_id"), lit(4)) === i).persist())
    batches.foreach(_.count())
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    batches.zipWithIndex.foreach { case (b, i) =>
      t(s"processBatch $i") {
        graft.streaming.StreamingNearDup.processBatch(
          spark, b, s"$work2/fps", s"$work2/flags", i.toLong, 5, 4, 2)
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", old)
    spark.stop()
  }
}
