package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.Tables

/** One-off profiling aid: phase timings of the dedup-clusters path. */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("profile-clusters")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")

    val signed = t("withSignature+persist") {
      val s = Dedup.withSignature(docs, "text").persist()
      s.count(); s
    }
    val cands = t("candidatePairs") {
      val c = Dedup.candidatePairs(signed, "doc_id").persist()
      println(s"[profile]   candidates = ${c.count()}")
      c
    }
    val pairs = t("exactVerify") {
      val p = Dedup.exactVerify(signed, cands, "doc_id", 0.9).persist()
      println(s"[profile]   pairs = ${p.count()}")
      p
    }
    t("duplicateClusters") {
      val labels = Dedup.duplicateClusters(pairs)
      println(s"[profile]   labeled = ${labels.count()}")
    }
    spark.stop()
  }
}
