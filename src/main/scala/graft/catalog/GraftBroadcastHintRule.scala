package graft.catalog

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}

/** Optimizer rule feeding the index's OWN size knowledge into join
  * planning: when a join side is (filters/projects over) a single graft
  * catalog scan whose POST-PRUNING byte size
  * ([[GraftScan.estimateStatistics]] — summed `file_size` of the located
  * candidate files, one bounded index-table aggregate) fits under
  * `spark.sql.autoBroadcastJoinThreshold`, set the join's broadcast hint
  * for that side.
  *
  * Why a hint rule and not plain `SupportsReportStatistics`: the graft
  * scan is a `V1Scan` (SURVEY §7.1 — the read delegates to the normal
  * Spark read path), and Spark's pushdown wraps every V1 scan in a
  * `V1ScanWrapper` that does NOT forward the statistics mixin, so
  * `DataSourceV2ScanRelation.computeStats` falls back to
  * `spark.sql.defaultSizeInBytes` (Long.MaxValue) and a pruned graft
  * table could never plan as a join's broadcast side — every such join
  * sort-merged until AQE maybe rescued it at runtime. This rule reads
  * the same statistics the wrapper hides and hands them to
  * JoinSelection through the hint channel it already honors. Explicit
  * user hints are never overridden; sides whose join type cannot build
  * a broadcast side are JoinSelection's problem (an inapplicable hint
  * is ignored). The located file set is computed once per scan and
  * reused by the execution read ([[GraftScan.locatedFiles]]). */
object GraftBroadcastHintRule extends Rule[LogicalPlan] with Logging {

  private val applying = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (applying.get()) return plan
    plan.transformUp {
      case j @ Join(left, right, _, _, hint) =>
        val lh = hint.leftHint.orElse(sideHint(left))
        val rh = hint.rightHint.orElse(sideHint(right))
        if (lh == hint.leftHint && rh == hint.rightHint) j
        else j.copy(hint = JoinHint(lh, rh))
    }
  }

  /** The side's graft scan, looked through row-preserving-or-shrinking
    * nodes only (filters and projects can't grow the broadcast build). */
  private def scanOf(p: LogicalPlan): Option[GraftScan] = p match {
    case Project(_, child) => scanOf(child)
    case Filter(_, child)  => scanOf(child)
    case s: DataSourceV2ScanRelation => s.scan match {
      case V1ScanWrapper(g: GraftScan, _, _) => Some(g)
      case g: GraftScan                      => Some(g)
      case _                                 => None
    }
    case _ => None
  }

  private def sideHint(side: LogicalPlan): Option[HintInfo] = {
    val spark = SparkSession.active
    if (!graft.GraftConf.reportStatistics(spark)) return None
    val threshold =
      org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    if (threshold <= 0) return None
    scanOf(side).flatMap { g =>
      // estimating runs bounded index-table jobs during optimization —
      // guard against this rule re-entering through their own plans
      applying.set(true)
      try {
        val size = g.estimateStatistics().sizeInBytes()
        if (size.isPresent && size.getAsLong <= threshold) {
          logInfo(s"graft broadcast hint: ${g.meta.name} pruned to " +
            s"${size.getAsLong} bytes (threshold $threshold)")
          Some(HintInfo(strategy = Some(BROADCAST)))
        } else None
      } finally applying.set(false)
    }
  }
}
