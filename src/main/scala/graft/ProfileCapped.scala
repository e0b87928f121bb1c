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
    // internal decomposition of the capped candidate build
    locally {
      import org.apache.spark.sql.expressions.Window
      val exploded = signed
        .select(col("doc_id"), explode(Dedup.bandKeys).as("bk"))
        .select(col("doc_id"), col("bk.band"), col("bk.bucket"))
      timed("  exploded count")(System.err.println(s"  n=${exploded.count()}"))
      val w = Window.partitionBy(col("band"), col("bucket"))
      val sized = exploded
        .withColumn("_sz", count(lit(1)).over(w))
        .withColumn("_ctr", min(col("doc_id")).over(w))
      timed("  window sized")(sized.write.format("noop").mode("overwrite").save())
      val small = sized.filter(col("_sz") <= cap).drop("_sz", "_ctr")
      val a = small.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
      val b = small.select(col("doc_id").as("id_b"), col("band"), col("bucket"))
      val smallPairs = a.join(b, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      timed("  smallPairs pre-distinct")(
        System.err.println(s"  n=${smallPairs.count()}"))
      timed("  smallPairs distinct")(
        System.err.println(s"  n=${smallPairs.distinct().count()}"))
    }
    // the composed chain the gate actually executes once per pass
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/capped_chain_plan.txt"),
      Dedup.exactVerify(signed,
          Dedup.cappedCandidatePairs(signed, "doc_id", cap), "doc_id", 0.9)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    val cands = Dedup.cappedCandidatePairs(signed, "doc_id", cap).persist()
    timed("cappedCandidatePairs")(System.err.println(s"  n=${cands.count()}"))
    val verified = Dedup.exactVerify(signed, cands, "doc_id", 0.9).persist()
    timed("exactVerify")(System.err.println(s"  n=${verified.count()}"))
    // experiment: exact verify WITHOUT the est pre-filter (wset joins
    // + intersect directly over all candidates)
    locally {
      val direct = cands
        .join(signed.select(col("doc_id").as("id_a"), col("wset").as("set_a")), Seq("id_a"))
        .join(signed.select(col("doc_id").as("id_b"), col("wset").as("set_b")), Seq("id_b"))
        .withColumn("n_common", size(array_intersect(col("set_a"), col("set_b"))))
        .withColumn("jac", col("n_common").cast("double") /
          (size(col("set_a")) + size(col("set_b")) - col("n_common")))
        .filter(col("jac") >= 0.9)
      timed("directVerify (no est)")(System.err.println(s"  n=${direct.count()}"))
    }
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
