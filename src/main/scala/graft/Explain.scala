package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: prints `explain("formatted")` for representative gate
  * queries so scan pruning / pushdown / codegen / join strategies can
  * be reviewed per round (see PLANS.md for the annotated snapshots).
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_scan_filter", "q_agg_pricing", "q_broadcast_dims",
        "q_join_agg", "q_reward_merge", "q_dedup_minhash", "q_knn_cosine")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n=== $name ===")
          fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
