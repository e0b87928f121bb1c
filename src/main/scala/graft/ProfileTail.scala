package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement aid (guide §1): for representative
  * sub-2 s "tail" gates, split each bench pass into
  *   build   — gate function call (DataFrame construction + any
  *             in-gate eager actions),
  *   plan    — analysis + optimization + physical planning + codegen
  *             of the RETURNED frame (forcing executedPlan),
  *   execute — the count() the bench times, minus the above.
  * Three passes per gate; prints per-pass rows. This answers VERDICT
  * r13 Next #10: is the long tail planning-bound or execution-bound?
  *
  * Usage: runMain graft.ProfileTail [gate1,gate2,...]
  */
object ProfileTail {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val gates = args.headOption.map(_.split(',').toSeq).getOrElse(Seq(
      "q_agg_pricing", "q_window_lag", "q_topk_brands", "q_token_f1",
      "q_retention", "q_cohen_kappa", "q_histogram", "q_semi_join"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 100000).selectExpr("sum(id * 2)").collect() // warmup
    def t[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    gates.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown gate $name"))
      (1 to 3).foreach { pass =>
        val (df, tBuild) = t(graft.core.GateContext.runningGate(name)(fn(spark, sfDir)))
        val (_, tPlan) = t(df.queryExecution.executedPlan)
        val (_, tExec) = t(graft.core.GateContext.runningGate(name)(df.count()))
        System.err.println(f"[tail] $name%-24s pass$pass build=$tBuild%6.3f plan=$tPlan%6.3f exec=$tExec%6.3f")
        spark.catalog.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}
