package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (Deequ/Great-Expectations
  * style) — the validation pass a training-data pipeline runs before
  * ingesting a batch. The reference validates per record at parse time
  * (firehose decode drops invalid rows); this is the complementary
  * RELATION-level contract: null-ness, key uniqueness, value domains,
  * referential integrity.
  *
  * Scale shape: every row-local rule compiles into ONE shared
  * aggregation pass over the input (a sum of violation indicators per
  * rule — map-side partials, one row to the driver per partition).
  * Each uniqueness rule is one hash agg on its own keys; each
  * foreign-key rule is one distinct + left join + agg (no collect:
  * the reference side may be corpus-sized). The verdict relation is a
  * union of 1-row frames — bytes.
  */
object Quality {

  sealed trait Rule
  /** `column` must never be null. */
  final case class NotNull(column: String) extends Rule
  /** Non-null values of `column` must be in `allowed` (nulls are
    * NotNull's business). */
  final case class InSet(column: String, allowed: Seq[String]) extends Rule
  /** Non-null values of `column` must lie in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule
  /** Non-null values of `column` must match `regex` in FULL (the
    * pattern is wrapped `^(?:…)$` — `rlike`'s substring semantics
    * would silently pass values merely containing a match). */
  final case class Matches(column: String, regex: String) extends Rule
  /** `columns` combinations must be unique; violations = excess rows
    * beyond the first of each duplicate group. */
  final case class Unique(columns: Seq[String]) extends Rule
  /** Rows with non-null `columns` must have a match in
    * `ref(refColumns)` (nulls are skipped, as in SQL FKs). */
  final case class ForeignKey(columns: Seq[String], ref: DataFrame,
      refColumns: Seq[String]) extends Rule

  // labels carry the rule's PARAMETERS: two rules on the same column
  // (e.g. InSet("grade", A) and InSet("grade", A,B)) must produce
  // distinguishable verdict rows — a consumer keying on the label
  // would otherwise silently lose one
  private def label(r: Rule): String = r match {
    case NotNull(c)       => s"not_null($c)"
    case InSet(c, allowed) => s"in_set($c:{${allowed.mkString(",")}})"
    case InRange(c, l, h) => s"in_range($c,$l,$h)"
    case Matches(c, regex) => s"matches($c:$regex)"
    case Unique(cs)       => s"unique(${cs.mkString("+")})"
    case ForeignKey(cs, _, rs) => s"fk(${cs.mkString("+")}->${rs.mkString("+")})"
  }

  /** Evaluate all rules; returns one row per rule:
    * (`rule` string, `violations` long, `checked` long, `pass` bool).
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")

    val rowLocal: Seq[(String, Column)] = rules.collect {
      case r @ NotNull(c) => label(r) -> col(c).isNull
      case r @ InSet(c, allowed) =>
        label(r) -> (col(c).isNotNull && !col(c).isin(allowed: _*))
      case r @ InRange(c, lo, hi) =>
        label(r) -> (col(c).isNotNull && (col(c) < lo || col(c) > hi))
      case r @ Matches(c, re) =>
        label(r) -> (col(c).isNotNull && !col(c).rlike(s"^(?:$re)$$"))
    }
    val rowFrame: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = count(lit(1)).as("_checked") +:
          rowLocal.zipWithIndex.map { case ((_, viol), i) =>
            // coalesce: sum over ZERO rows is null — an empty batch
            // must pass trivially (0 violations), not yield a null
            // verdict
            coalesce(sum(when(viol, 1L).otherwise(0L)), lit(0L)).as(s"_v$i")
          }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val rows = array(rowLocal.zipWithIndex.map { case ((name, _), i) =>
          struct(lit(name).as("rule"), col(s"_v$i").as("violations"),
            col("_checked").as("checked"))
        }: _*)
        Some(one.select(explode(rows).as("r"))
          .select(col("r.rule"), col("r.violations"), col("r.checked")))
      }

    val perRule: Seq[DataFrame] = rules.collect {
      case r @ Unique(cs) =>
        df.groupBy(cs.map(col).toIndexedSeq: _*)
          .agg(count(lit(1)).as("_c"))
          .agg(
            coalesce(sum(when(col("_c") > 1, col("_c") - 1)), lit(0L))
              .as("violations"),
            coalesce(sum(col("_c")), lit(0L)).as("checked"))
          .select(lit(label(r)).as("rule"), col("violations"), col("checked"))
      case r @ ForeignKey(cs, ref, rcs) =>
        require(cs.size == rcs.size,
          s"fk arity mismatch: ${cs.size} columns vs ${rcs.size} ref columns")
        val nn = df
          .where(cs.map(c => col(c).isNotNull).reduce(_ && _))
          .select(cs.map(col).toIndexedSeq: _*)
        val refKeys = ref.select(rcs.map(col).toIndexedSeq: _*)
          .toDF(cs: _*).distinct().withColumn("_hit", lit(1))
        nn.join(refKeys, cs, "left")
          .agg(
            coalesce(sum(when(col("_hit").isNull, 1L).otherwise(0L)), lit(0L))
              .as("violations"),
            count(lit(1)).as("checked"))
          .select(lit(label(r)).as("rule"), col("violations"), col("checked"))
    }

    (rowFrame.toSeq ++ perRule)
      .reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
  }
}
