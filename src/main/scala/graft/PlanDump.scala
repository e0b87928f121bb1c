package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement aid: dump `.explain("formatted")`
  * for selected gate queries to files (the plan evidence the round's
  * judge checks optimization claims against — plans/rNN/<gate>_<tag>.txt).
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <gate1,gate2,...>
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  *
  * Building a gate's DataFrame may run the gate's own in-query actions
  * (some gates assert invariants eagerly); the dumped plan is the plan
  * of the RETURNED frame — the one the bench times with count().
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <tag> <gates,comma,separated>")
    val Array(outDir, tag, gateCsv) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = SparkEntry.queries
    gateCsv.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      val fn = qs.getOrElse(name, sys.error(s"unknown gate: $name"))
      val df = graft.core.GateContext.runningGate(name)(fn(spark, sfDir))
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
      System.err.println(s"[plandump] wrote $outDir/${name}_$tag.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
