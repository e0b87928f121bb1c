package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-phase profile of Dedup.candidatePairs (guide §1): where do the
  * band join + distinct seconds go, and what does the plan look like.
  */
object ProfileCands {
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
      System.err.println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val signed = Dedup.withSignature(docs, "text").persist()
    timed("sign")(signed.count())

    val exploded = signed
      .select(col("doc_id"), explode(Dedup.bandKeys).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bucket"))
    val a = exploded.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
    val b = exploded.select(col("doc_id").as("id_b"), col("band"), col("bucket"))
    val joined = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")

    timed("explode only")(noop(exploded))
    val n = timed("join+filter count")(
      joined.groupBy().count().head().getLong(0))
    System.err.println(s"  pre-distinct pairs = $n")
    timed("join+filter noop")(noop(joined))
    timed("join+filter+distinct noop")(noop(joined.distinct()))
    System.err.println(joined.distinct().queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
