package graft

import org.apache.spark.sql.SparkSession

/** Times the bench's actual setup tasks in isolation (guide §1):
  * exactly what Bench.scala runs under setup_dedup_pairs etc.
  */
object ProfileSetup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val which = sys.env.getOrElse("PROFILE_WHICH", "dedup")
    if (which.contains("dedup"))
      timed("warmDerived(dedup)")(graft.queries.ExtOps.warmDerived(spark, sfDir))
    if (which.contains("rdr"))
      timed("warmDerived(rdr)")(graft.pipeline.RdrPipeline.warmDerived(spark, sfDir))
    if (which.contains("zone"))
      timed("warmDerived(zone)")(graft.queries.SearchOps.warmDerived(spark, sfDir))
    spark.stop()
  }
}
