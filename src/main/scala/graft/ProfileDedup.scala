package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Optimization-round phase profiler for the dedup pair-graph setup
  * (the bench's setup_dedup_pairs item): times each phase of the
  * LSH → verify → cluster materialization separately with labeled
  * jobs, so the optimization targets measured phases instead of
  * guesses (guide §1). Results to stderr; noop-style count actions.
  */
object ProfileDedup {
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
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val out = java.nio.file.Files.createTempDirectory("prof_pairs").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism)
    val signed = Dedup.withSignature(docs, "text").persist()
    timed("sign+persist")(signed.count())
    timed("write signed parquet")(
      signed.write.mode("overwrite").parquet(s"$out/signed"))

    val cands = Dedup.candidatePairs(signed, "doc_id")
    val candsP = cands.persist()
    timed("candidatePairs(distinct)")(
      System.err.println(s"  n_cands = ${candsP.count()}"))

    // stage 1 of verifyStaged, replicated for profiling
    val est = size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
      b => b)).cast("double") / Dedup.NumHashes
    val survivors = candsP
      .join(signed.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(signed.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .filter(est >= 0.9 - 0.25)
      .select("id_a", "id_b")
    val survP = survivors.persist()
    timed("verify stage1 (sig est)")(
      System.err.println(s"  n_survivors = ${survP.count()}"))

    val exact = survP
      .join(signed.select(col("doc_id").as("id_a"), col("wset").as("set_a")), Seq("id_a"))
      .join(signed.select(col("doc_id").as("id_b"), col("wset").as("set_b")), Seq("id_b"))
      .withColumn("n_common", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jac", col("n_common").cast("double") /
        (size(col("set_a")) + size(col("set_b")) - col("n_common")))
      .filter(col("jac") >= 0.9)
      .select("id_a", "id_b", "jac")
    timed("verify stage2 (exact+write)")(
      exact.write.mode("overwrite").parquet(s"$out/pairs"))

    val pairs = spark.read.parquet(s"$out/pairs")
    System.err.println(s"  n_pairs = ${pairs.count()}")
    timed("duplicateClusters+write")(
      Dedup.duplicateClusters(pairs)
        .write.mode("overwrite").parquet(s"$out/clusters"))

    // band-bucket fanin census (skew diagnosis)
    val census = Dedup.bandBucketCensus(signed, "doc_id")
    timed("bucket census")(census.orderBy(desc("fanin")).limit(10).collect()
      .foreach(r => System.err.println(s"  band=${r.get(0)} fanin=${r.get(2)}")))

    graft.pipeline.GateArtifacts.deleteTree(java.nio.file.Paths.get(out))
    spark.stop()
  }
}
