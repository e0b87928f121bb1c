package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.ZoneMap
import graft.operators.ZoneMap.{NumRange, StrRange, ZoneEntry, ZonePred}

/** TRANSPARENT zone-map data skipping as an injected optimizer rule
  * (`spark.sql.extensions=graft.GraftExtensions`): a plain
  * `spark.read.parquet(dir).filter(...)` over a table whose directory
  * carries a `_zone_map.json` sidecar (the [[ZoneMap.writeSidecar]] /
  * `ZoneMapJob` product) scans ONLY the files whose zones can satisfy
  * the filter — the explicit [[ZoneMap.prunedRead]] entry point,
  * promoted to every query in every session without touching query
  * code. Parquet row-group skipping still happens inside the files
  * that survive; this rule removes the files (their footer reads,
  * their task scheduling, their listing at 100 TB) BEFORE the scan.
  *
  * Soundness rules, kept deliberately narrow:
  *   - only necessary conditions are extracted from the filter: a
  *     top-level conjunction's simple comparisons between a BARE
  *     attribute and a literal (`a <= 5`, `10 < a`, `a = 7`,
  *     `a BETWEEN x AND y` — which is such a conjunction). Casts,
  *     disjunctions, functions, IS NULL: ignored (no pruning from
  *     them), never unsound. Strict bounds relax to inclusive ones.
  *   - the filter itself is LEFT IN PLACE — pruning only shrinks the
  *     scan's file list (the superset contract);
  *   - files the sidecar does not mention are kept (late-arrived data
  *     after the last zone-map build stays visible);
  *   - only unpartitioned single-root scans are touched: a partition-
  *     columned relation gets its pruning from partition values, and
  *     rebuilding its index from file-level roots would drop them;
  *   - int64 query literals beyond 2^53 widen one ulp outward before
  *     the double comparison, mirroring the build-side widening.
  *
  * Fixed-point safe: the replaced relation's index lists the kept
  * FILES as its roots (size > 1, or its listing equals the kept set),
  * so a second visit recomputes the same kept set and rewrites
  * nothing. Sidecar reads are (path, mtime)-cached; a re-build is
  * picked up on its next plan.
  *
  * Kill switch: `spark.graft.zonemap.skip=false`.
  */
case class ZoneSkipRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = spark.conf
      .getOption("spark.graft.zonemap.skip").forall(_.toBoolean)
    if (!enabled) return plan
    plan.transformUp {
      case f @ Filter(cond, lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _))
          if fs.partitionSchema.isEmpty && fs.location.rootPaths.size == 1 =>
        pruned(cond, lr, fs).map(r => f.copy(child = r)).getOrElse(f)
    }
  }

  private def pruned(cond: Expression, lr: LogicalRelation,
      fs: HadoopFsRelation): Option[LogicalRelation] = {
    val root = fs.location.rootPaths.head
    val entries = ZoneSkipRule.cachedSidecar(
      root, spark.sparkContext.hadoopConfiguration)
    if (entries.isEmpty) return None
    val preds = ZoneSkipRule.extractRanges(cond)
    if (preds.isEmpty) return None
    val byFile: Map[String, Map[String, ZoneEntry]] = entries.get
      .groupBy(e => ZoneSkipRule.normalize(e.file))
      .map { case (f, es) => f -> es.map(e => e.col -> e).toMap }
    val files = fs.location.inputFiles
    val kept = files.filter { f =>
      byFile.get(ZoneSkipRule.normalize(f))
        .forall(ZoneMap.keepFile(_, preds)) // unmentioned file: keep
    }
    if (kept.length == files.length) return None
    val newIndex = new InMemoryFileIndex(
      spark, kept.toIndexedSeq.map(new Path(_)), fs.options, None)
    Some(lr.copy(relation = fs.copy(location = newIndex)(spark)))
  }
}

object ZoneSkipRule {

  /** Scheme-independent file identity: the manifest records paths as
    * the harvester listed them, the scan may render them with an
    * explicit scheme/authority — compare URI paths.
    */
  private[plans] def normalize(file: String): String =
    new Path(file).toUri.getPath

  private val cache = new ConcurrentHashMap[String, (Long, Option[Seq[ZoneEntry]])]()

  /** (path, mtime)-keyed sidecar lookup, the StatsBroadcastRule
    * convention: rewritten sidecars refresh, absence costs one
    * getFileStatus probe per plan.
    */
  private[plans] def cachedSidecar(root: Path,
      conf: org.apache.hadoop.conf.Configuration): Option[Seq[ZoneEntry]] = {
    val p = new Path(root, ZoneMap.SidecarFile)
    val fs = p.getFileSystem(conf)
    val mtime =
      try fs.getFileStatus(p).getModificationTime
      catch { case _: java.io.FileNotFoundException => return None }
    val key = p.toString
    val hit = cache.get(key)
    if (hit != null && hit._1 == mtime) return hit._2
    val fresh = ZoneMap.readSidecarPath(p, conf)
    cache.put(key, (mtime, fresh))
    fresh
  }

  /** Necessary range conditions from a filter: top-level conjuncts of
    * the form attr ⋈ literal (either orientation). Everything else
    * contributes nothing (sound — pruning only uses necessary
    * conditions). Multiple bounds on one column intersect.
    */
  private[plans] def extractRanges(cond: Expression): Seq[ZonePred] = {
    final case class Acc(loN: Option[Double], hiN: Option[Double],
        loS: Option[String], hiS: Option[String])
    val acc = scala.collection.mutable.LinkedHashMap[String, Acc]()
    def tightenN(col: String, lo: Option[Double], hi: Option[Double]): Unit = {
      val a = acc.getOrElse(col, Acc(None, None, None, None))
      acc(col) = a.copy(
        loN = (a.loN.toSeq ++ lo.toSeq).reduceOption((x: Double, y: Double) => math.max(x, y)),
        hiN = (a.hiN.toSeq ++ hi.toSeq).reduceOption((x: Double, y: Double) => math.min(x, y)))
    }
    def tightenS(col: String, lo: Option[String], hi: Option[String]): Unit = {
      val a = acc.getOrElse(col, Acc(None, None, None, None))
      acc(col) = a.copy(
        // intersect in UTF-8 byte order — the order keepFile compares in
        loS = (a.loS.toSeq ++ lo.toSeq).reduceOption((x: String, y: String) =>
          if (ZoneMap.utf8Compare(x, y) >= 0) x else y),
        hiS = (a.hiS.toSeq ++ hi.toSeq).reduceOption((x: String, y: String) =>
          if (ZoneMap.utf8Compare(x, y) <= 0) x else y))
    }
    // literal → safe double bound: int64 beyond 2^53 widens OUTWARD
    // (lo down, hi up) so double rounding can never fake a miss
    def num(l: Literal, isLo: Boolean): Option[Double] = l.value match {
      case null => None
      case v: java.lang.Long =>
        val d = v.toDouble
        if (math.abs(v) > (1L << 53))
          Some(if (isLo) Math.nextDown(d) else Math.nextUp(d))
        else Some(d)
      case v: java.lang.Integer => Some(v.toDouble)
      case v: java.lang.Short => Some(v.toDouble)
      case v: java.lang.Byte => Some(v.toDouble)
      case v: java.lang.Double => Some(v.doubleValue)
      case v: java.lang.Float => Some(v.toDouble)
      case v: org.apache.spark.sql.types.Decimal =>
        val d = v.toDouble // may round either way: widen outward
        Some(if (isLo) Math.nextDown(d) else Math.nextUp(d))
      case _ => None
    }
    def str(l: Literal): Option[String] = l.value match {
      case s: UTF8String => Some(s.toString)
      case _ => None
    }
    def visit(a: Expression, l: Literal, lowerOfA: Boolean, upperOfA: Boolean): Unit =
      a match {
        case ar: AttributeReference =>
          l.dataType match {
            case StringType =>
              tightenS(ar.name,
                if (lowerOfA) str(l) else None,
                if (upperOfA) str(l) else None)
            case _: NumericType =>
              tightenN(ar.name,
                if (lowerOfA) num(l, isLo = true) else None,
                if (upperOfA) num(l, isLo = false) else None)
            case _ => ()
          }
        case _ => ()
      }
    def walk(e: Expression): Unit = e match {
      case And(x, y) => walk(x); walk(y)
      case GreaterThanOrEqual(a, l: Literal) => visit(a, l, lowerOfA = true, upperOfA = false)
      case GreaterThan(a, l: Literal) => visit(a, l, lowerOfA = true, upperOfA = false)
      case LessThanOrEqual(a, l: Literal) => visit(a, l, lowerOfA = false, upperOfA = true)
      case LessThan(a, l: Literal) => visit(a, l, lowerOfA = false, upperOfA = true)
      case EqualTo(a, l: Literal) => visit(a, l, lowerOfA = true, upperOfA = true)
      case GreaterThanOrEqual(l: Literal, a) => visit(a, l, lowerOfA = false, upperOfA = true)
      case GreaterThan(l: Literal, a) => visit(a, l, lowerOfA = false, upperOfA = true)
      case LessThanOrEqual(l: Literal, a) => visit(a, l, lowerOfA = true, upperOfA = false)
      case LessThan(l: Literal, a) => visit(a, l, lowerOfA = true, upperOfA = false)
      case EqualTo(l: Literal, a) => visit(a, l, lowerOfA = true, upperOfA = true)
      case _ => ()
    }
    walk(cond)
    acc.toSeq.flatMap { case (c, a) =>
      val n = if (a.loN.isDefined || a.hiN.isDefined)
        Some(NumRange(c, a.loN, a.hiN)) else None
      val s = if (a.loS.isDefined || a.hiS.isDefined)
        Some(StrRange(c, a.loS, a.hiS)) else None
      n.toSeq ++ s.toSeq
    }
  }
}
