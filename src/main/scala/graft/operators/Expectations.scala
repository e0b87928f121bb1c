package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations evaluated in ONE aggregation
  * pass over the input (the Deequ/`dbt test` capability re-expressed
  * Spark-first): every constraint contributes a conditional-count (or
  * distinct-count) expression to a single `agg(...)`, so auditing N
  * constraints over 100 TB costs one scan + one 1-row exchange — never
  * N scans. The single wide row then unpivots to one row per
  * expectation via `stack` (a pure projection, no second shuffle).
  *
  * Metrics ship as integral parts-per-million (`metric_x1e6 =
  * (ok · 10⁶) div n`) so results are bit-identical across engines and
  * safe to hash-compare; `passed` is `metric ≥ threshold`.
  *
  * Exact `Unique` constraints compile to `count(DISTINCT col)`. Spark
  * plans multiple distinct aggregates in one Aggregate via Expand —
  * still a single scan and shuffle, but the shuffled row count
  * multiplies by (distinct-column count + 1). That is the honest gate
  * mode; at corpus scale pass `exact = false` and uniqueness drops to
  * `approx_count_distinct` (HLL, no Expand, mergeable) with the same
  * output schema.
  */
object Expectations {

  /** One declarative constraint: `name` labels the output row, `ok`
    * counts satisfying rows (None for uniqueness, which is computed
    * from a distinct count instead), `thresholdX1e6` is the minimum
    * passing metric in parts-per-million.
    */
  sealed trait Expectation {
    def name: String
    def thresholdX1e6: Long
  }

  /** Fraction of rows where `col` is non-null. */
  final case class Complete(name: String, column: String,
      thresholdX1e6: Long = 1000000L) extends Expectation

  /** Distinct values of `col` over total rows (1.0 = a key). */
  final case class Unique(name: String, column: String,
      thresholdX1e6: Long = 1000000L) extends Expectation

  /** Fraction of rows satisfying an arbitrary boolean column
    * expression (null counts as unsatisfied, like a SQL WHERE).
    */
  final case class Satisfies(name: String, predicate: Column,
      thresholdX1e6: Long) extends Expectation

  /** Audit `df` against `expectations`: returns one row per
    * expectation with columns (expectation STRING, metric_x1e6 LONG,
    * threshold_x1e6 LONG, passed BOOLEAN), in input order. An empty
    * input yields null metrics and `passed = false` (no data is not
    * passing data).
    */
  def audit(df: DataFrame, expectations: Seq[Expectation],
      exact: Boolean = true): DataFrame = {
    validate(expectations)
    val aggs = counterAggs(expectations, exact)
    project(df.agg(aggs.head, aggs.tail: _*), expectations)
  }

  /** Shared structural guards (also applied by the streaming auditor
    * before it starts accumulating).
    */
  def validate(expectations: Seq[Expectation]): Unit = {
    require(expectations.nonEmpty, "audit needs at least one expectation")
    val names = expectations.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate expectation names: ${names.diff(names.distinct).mkString(", ")}")
    // names are spliced into a SQL stack() literal in project()
    names.foreach(n => require(n.matches("[A-Za-z0-9_.:-]+"),
      s"expectation name must be [A-Za-z0-9_.:-]+, got '$n'"))
  }

  /** The per-constraint counter aggregates (`_n` first, then `_m<i>` in
    * expectation order). Complete/Satisfies counters are plain
    * conditional sums — MERGEABLE longs, which is what lets the
    * streaming auditor accumulate them across micro-batches; Unique is
    * the one non-mergeable counter (the streaming path derives it from
    * an incremental seen-values ledger instead).
    */
  def counterAggs(expectations: Seq[Expectation],
      exact: Boolean): Seq[Column] =
    count(lit(1)).as("_n") +: expectations.zipWithIndex.map {
      case (e, i) =>
        val c = e match {
          case Complete(_, column, _) =>
            sum(when(col(column).isNotNull, 1L).otherwise(0L))
          case Unique(_, column, _) =>
            if (exact) count_distinct(col(column))
            else approx_count_distinct(column)
          case Satisfies(_, predicate, _) =>
            sum(when(predicate, 1L).otherwise(0L))
        }
        c.cast("long").as(s"_m$i")
    }

  /** Unpivot a 1-row counters frame (`_n`, `_m0..`) into the audit
    * result via stack: 4 output cells per expectation (name, ppm
    * metric, threshold, passed) — a projection, not a join. The ×10⁶
    * product is widened to DECIMAL(38,0) BEFORE multiplying (house
    * rule): a long would overflow past ~9.2e12 rows, which a narrow
    * table at 100 TB can exceed. Public so the streaming auditor's
    * accumulated counters project through the IDENTICAL arithmetic.
    */
  def project(wide: DataFrame,
      expectations: Seq[Expectation]): DataFrame = {
    val cells = expectations.zipWithIndex.map { case (e, i) =>
      val ppm = s"CASE WHEN _n = 0 THEN NULL" +
        s" ELSE CAST((CAST(coalesce(_m$i, 0L) AS DECIMAL(38,0)) * 1000000)" +
        s" div _n AS BIGINT) END"
      Seq(
        s"'${e.name}'",
        ppm,
        s"${e.thresholdX1e6}L",
        s"coalesce(($ppm) >= ${e.thresholdX1e6}L, false)")
    }
    wide.select(expr(
      s"stack(${expectations.size}, ${cells.flatten.mkString(", ")})" +
        " as (expectation, metric_x1e6, threshold_x1e6, passed)"))
  }
}
