package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profile of the q_dedup_capped gate internals (guide §1). */
object ProfileCapped {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    // same artifacts the gate reads
    val out = java.nio.file.Files.createTempDirectory("prof_capped").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism)
    val signed0 = Dedup.withSignature(docs, "text")
    signed0.write.mode("overwrite").parquet(s"$out/signed")
    val signed = spark.read.parquet(s"$out/signed")

    val census = Dedup.bandBucketCensus(signed, "doc_id")
    val maxFanin = timed("census maxFanin")(
      census.agg(max("fanin")).head().getLong(0))
    val cap = math.max(8L, maxFanin / 2)
    System.err.println(s"  maxFanin=$maxFanin cap=$cap")
    val cands = Dedup.cappedCandidatePairs(signed, "doc_id", cap).persist()
    timed("cappedCandidatePairs")(System.err.println(s"  n=${cands.count()}"))
    val verified = Dedup.exactVerify(signed, cands, "doc_id", 0.9).persist()
    timed("exactVerify")(System.err.println(s"  n=${verified.count()}"))
    val capped = timed("duplicateClusters")(
      graft.operators.Caching.handOff(Dedup.duplicateClusters(verified)))
    timed("refinement joins") {
      val uncapped = capped // stand-in relation of same size for join cost
      val joined = capped.select(col("id"), col("cluster").as("_cc"))
        .join(uncapped.select(col("id"), col("cluster").as("_uc")), Seq("id"))
      val spanning = joined.groupBy("_cc")
        .agg(countDistinct("_uc").as("_k")).filter(col("_k") > 1).count()
      System.err.println(s"  spanning=$spanning nCap=${capped.count()}")
    }
    graft.pipeline.GateArtifacts.deleteTree(java.nio.file.Paths.get(out))
    spark.stop()
  }
}
