package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Layout, ZoneMap}

/** The transparent data-skipping rule end-to-end through a real
  * extensions-built session: a sidecar-carrying table's filtered scan
  * reads fewer FILES with identical results; unmentioned (late) files
  * stay visible; the kill switch and non-eligible shapes are no-ops.
  */
class ZoneSkipRuleSpec extends AnyFunSuite {

  private def scanFileCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location.inputFiles.length
    }.sum

  test("sidecar shrinks a filtered scan's file list; results identical; guards hold") {
    // swap the default session rather than stopping the shared context
    // (the GraftExtensionsSpec convention)
    val old = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import s.implicits._
      val work = Files.createTempDirectory("zone_skip_rule").toString
      val dir = s"$work/t"
      val rnd = new scala.util.Random(11)
      val rows = (0 until 6000)
        .map(i => (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
      Layout.zOrder(rows.toDF("id", "a", "b"), "a", "b", 12,
          ranges = Some((0.0, 100.0, 0.0, 100.0)))
        .write.mode("overwrite").parquet(dir)

      def q() = s.read.parquet(dir).filter($"a" <= lit(10.0) && $"b" <= lit(10.0))
      val wantCount = q().count()
      val wantSum = q().agg(sum("id")).as[Long].head()
      val fullFiles = scanFileCount(q())
      assert(fullFiles === 12, "no sidecar yet: every file scans")

      // harvest + sidecar -> the SAME query scans fewer files,
      // identical answer
      ZoneMap.writeSidecar(s, dir, ZoneMap.build(s, dir, Seq("a", "b")))
      val prunedFiles = scanFileCount(q())
      assert(prunedFiles < fullFiles,
        s"sidecar must shrink the file list (got $prunedFiles/$fullFiles)")
      assert(q().count() === wantCount)
      assert(q().agg(sum("id")).as[Long].head() === wantSum)

      // a file the sidecar does not mention stays visible (late data)
      (0 until 50).map(i => ((100000 + i).toLong, 1.0, 1.0))
        .toDF("id", "a", "b").coalesce(1)
        .write.mode("append").parquet(dir)
      assert(q().count() === wantCount + 50,
        "rows in a file missing from the sidecar must not be skipped")

      // refresh the sidecar over the grown table: still exact
      ZoneMap.writeSidecar(s, dir, ZoneMap.build(s, dir, Seq("a", "b")))
      assert(q().count() === wantCount + 50)

      // disjunctions/casts contribute nothing - no pruning, no error
      val orQ = s.read.parquet(dir).filter($"a" <= 10.0 || $"b" <= 10.0)
      assert(scanFileCount(orQ) === scanFileCount(s.read.parquet(dir)))

      // kill switch restores the full listing
      s.conf.set("spark.graft.zonemap.skip", "false")
      assert(scanFileCount(q()) === scanFileCount(s.read.parquet(dir)))
      s.conf.set("spark.graft.zonemap.skip", "true")
      assert(scanFileCount(q()) < scanFileCount(s.read.parquet(dir)))

      // contradiction prunes everything and still answers exactly
      val none = s.read.parquet(dir).filter($"a" >= lit(200.0))
      assert(none.count() === 0L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      old.foreach(SparkSession.setDefaultSession)
      old.foreach(SparkSession.setActiveSession)
    }
  }

  test("range extraction: conjunctions tighten, orientations flip, others ignored") {
    import org.apache.spark.sql.catalyst.dsl.expressions._
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val a = AttributeReference("a", DoubleType)()
    val k = AttributeReference("k", StringType)()
    val got = ZoneSkipRule.extractRanges(
      And(And(GreaterThanOrEqual(a, Literal(2.0)), LessThan(a, Literal(9.0))),
        And(GreaterThan(Literal(5.0), a), // 5 > a => a <= 5
          EqualTo(k, Literal.create("x", StringType)))))
    assert(got.toSet === Set(
      ZoneMap.NumRange("a", Some(2.0), Some(5.0)),
      ZoneMap.StrRange("k", Some("x"), Some("x"))))
    // disjunction and IS NULL are not necessary conditions: nothing
    val none = ZoneSkipRule.extractRanges(
      Or(GreaterThan(a, Literal(1.0)), IsNull(a)))
    assert(none.isEmpty)
    // int64 beyond 2^53 widens outward
    val big = ZoneSkipRule.extractRanges(
      GreaterThanOrEqual(AttributeReference("n", LongType)(),
        Literal((1L << 60) + 1L)))
    val lo = big.collect { case ZoneMap.NumRange(_, Some(l), _) => l }.head
    assert(lo < ((1L << 60) + 1L).toDouble)
  }
}
