package graft.sinks.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analyzer rule (injected by `graft.GraftSparkExtensions`) that makes
  * SQL `UPDATE` and `MERGE INTO` work on sink-catalog tables DESPITE
  * the strict write contract.
  *
  * Why it exists: the tables declare `ACCEPT_ANY_SCHEMA` so plain
  * writes are validated strictly by the builder instead of silently
  * null-padded by Spark's by-name output resolution. But the analyzer
  * reads that capability as `skipSchemaResolution` and then (a) returns
  * MERGE commands with their references unresolved and (b) refuses to
  * align UPDATE assignments — so the row-level rewrite
  * (`RewriteUpdateTable` / `RewriteMergeIntoTable`, which requires
  * `aligned`) can never fire.
  *
  * The fix is surgical: ONLY when the relation sits in the target
  * position of an UPDATE or MERGE, swap its table for a copy without
  * `ACCEPT_ANY_SCHEMA` ([[CdcSinkTable.dmlCopy]]). Resolution,
  * alignment and the delta rewrite then proceed through Spark's own
  * rules; every other plan shape — `writeTo`, `INSERT INTO`, plain
  * reads — still sees the strict-contract table. DELETE needs no swap
  * (its rewrite neither aligns assignments nor resolves against the
  * target schema).
  *
  * Without the extensions installed, UPDATE/MERGE on these tables fail
  * with Spark's standard analysis errors (spec-pinned) — same trade the
  * reference ecosystem makes for engine-side SQL surface (e.g. Iceberg
  * required its SparkSessionExtensions for MERGE support).
  */
class GraftDmlResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Swap the table of a sink-catalog relation under `plan` (through
    * any SubqueryAlias chain) for its DML copy; leave everything else
    * untouched.
    */
  private def swapped(plan: LogicalPlan): LogicalPlan = plan match {
    case a: SubqueryAlias =>
      val child = swapped(a.child)
      if (child eq a.child) a else a.copy(child = child)
    case r: DataSourceV2Relation => r.table match {
      case t: CdcSinkTable if t.acceptsAnySchema => r.copy(table = t.dmlCopy)
      case _ => r
    }
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case u: UpdateTable =>
        val t = swapped(u.table)
        if (t eq u.table) u else u.copy(table = t)
      case m: MergeIntoTable =>
        val t = swapped(m.targetTable)
        if (t eq m.targetTable) m else m.copy(targetTable = t)
    }
}
