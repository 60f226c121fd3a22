package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.GraftIcebergV2Table

/** Catalyst optimizer rule: answer `count(*)` over an Iceberg table from
  * manifest statistics — zero data I/O.
  *
  * The reference exposes the raw material (`total-records` in snapshot
  * summaries, per-file record counts) but never optimizes with it
  * (README.md:95-96); Iceberg-java does this inside its scan. Here it is a
  * proper `Rule[LogicalPlan]`: a global ungrouped `count(*)` (alone or with
  * other count(*)s) over an un-filtered `graft-iceberg` relation collapses to
  * a pre-computed `LocalRelation` row.
  *
  * Register with:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => CountFromIcebergStats)
}

object CountFromIcebergStats extends Rule[LogicalPlan] {

  private def isCountStar(e: AggregateExpression): Boolean = e.aggregateFunction match {
    case Count(Seq(Literal(1, _))) => !e.isDistinct && e.filter.isEmpty
    case Count(Nil) => !e.isDistinct && e.filter.isEmpty
    case _ => false
  }

  /** Strip row-count-preserving Projects between the Aggregate and the scan
    * (the column-pruning rule inserts one). */
  @scala.annotation.tailrec
  private def unwrap(plan: LogicalPlan): LogicalPlan = plan match {
    case p: org.apache.spark.sql.catalyst.plans.logical.Project => unwrap(p.child)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.forall {
          case Alias(ae: AggregateExpression, _) => isCountStar(ae)
          case ae: AggregateExpression => isCountStar(ae)
          case _ => false
        } =>
      unwrap(child) match {
        // runs before V2ScanRelationPushDown, so the DSv2 relation is intact
        case rel: DataSourceV2Relation =>
          rel.table match {
            case t: GraftIcebergV2Table =>
              t.table.countFromStats() match {
                case Some(n) =>
                  val row = InternalRow.fromSeq(aggExprs.map(_ => n))
                  LocalRelation(agg.output.map(_.toAttribute), Seq(row))
                case None => agg
              }
            case _ => agg
          }
        case _ => agg
      }
  }
}
