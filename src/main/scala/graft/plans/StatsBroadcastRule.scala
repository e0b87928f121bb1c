package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.operators.Cbo

/** The session-wide form of [[Cbo.statsJoin]]: an injected optimizer
  * rule (`spark.sql.extensions=graft.GraftExtensions`) that fills a
  * Join side's MISSING hint with BROADCAST when the side is a scan —
  * possibly under projects/filters/aliases — of a table whose
  * `_table_stats.json` sidecar (the AnalyzeJob product) reports
  * measured bytes within the budget.
  *
  * Why a rule and not per-call statsJoin: the static planner sizes a
  * relation by FILE bytes, so a wide table whose join-relevant
  * projection is two thin columns — or a snappy-compressed text
  * table — reads as too big to broadcast and pays a full shuffle of
  * the OTHER side before AQE can repair anything. A catalog that
  * ANALYZEs its tables gets the measured decision on every join in
  * every session, without touching query code.
  *
  * Semantics kept deliberately narrow:
  *   - only FILLS ABSENT hints — an explicit user hint always wins;
  *   - only column-pruning/filtering operators are looked through
  *     (Project/Filter/SubqueryAlias): anything else (aggregates,
  *     joins, generators) changes cardinality in ways the sidecar
  *     does not describe;
  *   - a filter can only SHRINK the side, and a projection of the
  *     measured columns is bounded by the measured bytes, so the
  *     sidecar bytes stay a sound upper bound for the build side;
  *   - runs in the operator-optimization fixed point: idempotent by
  *     construction (hint already present → untouched).
  *
  * Budget: `spark.graft.cbo.broadcastBytes` (default
  * [[Cbo.DefaultBroadcastBytes]]); set ≤ 0 to disable the rule.
  * Sidecar reads are cached by (path, mtime) — a re-ANALYZE is picked
  * up, an unchanged sidecar costs one FS read per session.
  */
case class StatsBroadcastRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val budget = spark.conf
      .getOption("spark.graft.cbo.broadcastBytes")
      .map(_.toLong).getOrElse(Cbo.DefaultBroadcastBytes)
    if (budget <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, _, _, hint)
          if hint.leftHint.isEmpty || hint.rightHint.isEmpty =>
        val lh = hint.leftHint.orElse(broadcastHint(left, budget))
        val rh = hint.rightHint.orElse(broadcastHint(right, budget))
        if ((lh eq hint.leftHint) && (rh eq hint.rightHint)) j
        else j.copy(hint = JoinHint(lh, rh))
    }
  }

  private def broadcastHint(side: LogicalPlan, budget: Long): Option[HintInfo] =
    measuredBytes(side).filter(_ <= budget)
      .map(_ => HintInfo(strategy = Some(BROADCAST)))

  /** Measured bytes of the side when it is a sidecar-carrying scan
    * under cardinality-preserving-or-shrinking operators only.
    */
  private def measuredBytes(side: LogicalPlan): Option[Long] = side match {
    case Project(_, child) => measuredBytes(child)
    case Filter(_, child) => measuredBytes(child)
    case SubqueryAlias(_, child) => measuredBytes(child)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths match {
            case Seq(root) => StatsBroadcastRule.cachedStats(
              root, spark.sparkContext.hadoopConfiguration).map(_.bytes)
            case _ => None // multi-root scans have no single sidecar
          }
        case _ => None
      }
    case _ => None
  }
}

object StatsBroadcastRule {
  private val cache = new ConcurrentHashMap[String, (Long, Option[Long])]()

  /** (path, sidecar mtime)-keyed lookup: stale entries refresh when
    * the sidecar is rewritten; absent sidecars cache as None under
    * mtime −1 (re-checked only when a run writes one — the getFileStatus
    * probe itself is what we key on, so absence is re-probed per plan,
    * which is one NameNode call, not a file read).
    */
  private[plans] def cachedStats(root: Path,
      conf: org.apache.hadoop.conf.Configuration): Option[Cbo.TableStats] = {
    val p = new Path(root, Cbo.StatsFile)
    val fs = p.getFileSystem(conf)
    val mtime =
      try fs.getFileStatus(p).getModificationTime
      catch { case _: java.io.FileNotFoundException => return None }
    val key = p.toString
    val hit = cache.get(key)
    if (hit != null && hit._1 == mtime) return hit._2.map(b =>
      Cbo.TableStats(-1L, b, Map.empty)) // bytes are all the rule needs
    val fresh = Cbo.readStatsPath(p, conf)
    cache.put(key, (mtime, fresh.map(_.bytes)))
    fresh
  }
}
