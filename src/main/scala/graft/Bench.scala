package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one-time JVM warmup (codegen compiler, parquet reader, shuffle
    // machinery) so the alphabetically-first query doesn't absorb
    // ~3-4 s of classloading that belongs to no query
    spark.range(0, 100000).selectExpr("sum(id * 2)").collect()
    // guard the parquet warmup: a partially generated sfDir must fail
    // per-query (loudly, with the -1 marker), not abort the whole run
    if (new java.io.File(s"$sfDir/region.parquet").exists())
      spark.read.parquet(s"$sfDir/region.parquet").count()

    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run (profiling aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    // deterministic name order: run-to-run timings stay comparable
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // shared-box load can inflate a single pass by >10×; queries whose
    // first pass exceeds this get one re-run and report min-of-2, so
    // recorded numbers track the plan, not the neighbors (per-query
    // work under a minute of retries keeps the suite bounded)
    val rerunThreshold = sys.env.getOrElse("SPARK_GRAFT_RERUN_SEC", "10").toDouble
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // a failure must be LOUD and visible in the JSON (-1 marker):
      // swallowing it would record a crashing query as a ~0s success
      // and report the regression as a bench speedup
      val dt =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            -1.0
        }
      // isolate queries: operators may persist intermediates that only
      // their own job needs — leftover blocks would evict/slow later
      // queries in this single shared JVM. Spark's ContextCleaner only
      // reclaims shuffle/broadcast state on GC, so force one.
      spark.catalog.clearCache()
      System.gc()
      dt
    }
    val results = selected.map { case (name, fn) =>
      val first = once(name, fn)
      val dt =
        if (first >= rerunThreshold) {
          val second = once(name, fn)
          if (second < 0) first else math.min(first, second)
        } else first
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
