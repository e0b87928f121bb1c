package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiles duplicateClusters in isolation over the materialized pair
  * graph (guide §1): per-round costs via SPARK_GRAFT_CC_TIMINGS=1.
  */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROFILE_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val out = java.nio.file.Files.createTempDirectory("prof_cc").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism)
    val signed = Dedup.withSignature(docs, "text").persist()
    val pairs = timed("pairs build+write") {
      val p = Dedup.verifiedPairsSigned(signed, "doc_id", 0.9)
      p.write.mode("overwrite").parquet(s"$out/pairs")
      p.unpersist(blocking = false)
      spark.read.parquet(s"$out/pairs")
    }
    timed("edge stats") {
      System.err.println(s"  n_pairs=${pairs.count()} files=" +
        new java.io.File(s"$out/pairs").listFiles().count(_.getName.endsWith(".parquet")))
    }
    timed("duplicateClusters total")(
      Dedup.duplicateClusters(pairs)
        .write.mode("overwrite").parquet(s"$out/clusters"))
    graft.pipeline.GateArtifacts.deleteTree(java.nio.file.Paths.get(out))
    spark.stop()
  }
}
