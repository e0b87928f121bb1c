package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects native xxh3_64 at session build") {
    // Build a session of our own with the extension applied — the
    // point is injection at session construction, no imperative
    // Functions.register call. The JVM-wide SparkContext is shared
    // with other suites, so swap the default session out and back
    // rather than stop() anything.
    val old = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val got = s.sql("SELECT xxh3_64('hello'), xxh3_64('hello', 42)")
        .collect().head
      assert(got.getLong(0) == graft.core.XxHash3.hash("hello", 0L))
      assert(got.getLong(1) == graft.core.XxHash3.hash("hello", 42L))
      // native expression: the executed plan must stay UDF-free
      val plan = s.sql("SELECT xxh3_64(CAST(id AS STRING)) FROM range(10)")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("UDF"), plan)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      old.foreach { o =>
        SparkSession.setDefaultSession(o)
        SparkSession.setActiveSession(o)
      }
    }
  }
}
