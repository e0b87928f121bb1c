package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Optimization-round measurement aid (guide §1): phase split of one
  * streaming-parity gate pass — fixture build, stream start,
  * micro-batch drain, state read-back — to locate the microbatch
  * floor's actual composition (VERDICT r13 Next #4).
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 100000).selectExpr("sum(id * 2)").collect()
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[stream] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    import graft.streaming.StreamingRollup
    import graft.operators.CountMin
    val fx = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "prof_cms").toString
    t("fixture") {
      spark.read.parquet(s"$sfDir/lineitem.parquet").select("l_partkey")
        .repartition(32).write.mode("overwrite").parquet(s"$fx/drop")
    }
    (1 to 3).foreach { pass =>
      val work = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "prof_cms_run").toString
      graft.core.ConfScope.withShufflePartitions(spark, 4)(
        graft.core.ConfScope.withAqeOff(spark) {
          val q = t(s"p$pass start") {
            StreamingRollup.rollupStream(spark, s"$fx/drop", s"$work/state",
              s"$work/ckpt",
              StructType(Seq(StructField("l_partkey", LongType))),
              maxFilesPerTrigger = 16, format = "parquet")(
              b => CountMin.build(b, "l_partkey", depth = 4, width = 256))
          }
          t(s"p$pass drain")(q.awaitTermination())
          q.recentProgress.foreach(p =>
            System.err.println(s"[stream]   batch ${p.batchId}: ${p.durationMs}"))
        })
      t(s"p$pass readback") {
        StreamingRollup.merged(spark, s"$work/state",
          Seq("seed", "bucket"), Seq("cnt")).count()
      }
      graft.pipeline.GateArtifacts.deleteTree(java.nio.file.Paths.get(work))
    }
    spark.stop()
  }
}
