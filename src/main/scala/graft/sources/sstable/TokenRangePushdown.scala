package graft.sources.sstable

import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, GreaterThanOrEqual, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.LongType

import graft.functions.CassandraMurmur3Token

/** Catalyst optimizer rule: ring-slice pushdown for the SSTable source.
  *
  * A user writing `WHERE cassandra_token(key) BETWEEN a AND b` over a
  * murmur3-partitioned SSTable read describes exactly the slice the
  * source's `tokenMin`/`tokenMax` options prune at PLAN time (the
  * Summary/Index seek + per-split skip, MaScan.planSplits) — but a
  * plain Filter leaves the scan reading every partition and testing
  * tokens row by row. This rule closes that gap: token-range conjuncts
  * over the scan's `key` column are folded into the relation's reader
  * options, so the Index.db seek prunes whole file regions instead.
  * The Filter itself is left in place — the pushed bounds are purely
  * an optimization, and keeping the residual predicate preserves
  * correctness no matter how a source version treats the options.
  *
  * Guards: the relation must be an SSTable table whose `partitioner`
  * option is EXPLICITLY murmur3 — when the option is absent the source
  * falls back to each file's own Statistics.db partitioner, which this
  * rule cannot see, and pushing murmur3-notation bounds under a
  * different ring order would prune the wrong rows — and must not
  * already carry a slice (a user-given `-T` shard boundary is never
  * silently narrowed). Only `>=`, `<=`, `=` conjuncts fold (strict
  * bounds stay residual-only: ±1 on a Long boundary is not worth the
  * overflow arm).
  *
  * Registered by [[graft.GraftExtensions]] (injectOptimizerRule), so a
  * `spark.sql.extensions=graft.GraftExtensions` session gets the
  * pushdown for free; sessions without extensions can opt in via
  * `spark.experimental.extraOptimizations`.
  */
object TokenRangePushdown extends Rule[LogicalPlan] with PredicateHelper {

  private object TokenOfKey {
    def unapply(e: Expression): Option[Attribute] = e match {
      case CassandraMurmur3Token(a: Attribute) => Some(a)
      case _ => None
    }
  }
  private object LongLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
  }

  /** (lower, upper) bound contributed by one conjunct, if any. */
  private def boundOf(e: Expression, isKey: Attribute => Boolean)
      : Option[(Long, Long)] = e match {
    case GreaterThanOrEqual(TokenOfKey(a), LongLit(v)) if isKey(a) =>
      Some((v, Long.MaxValue))
    case LessThanOrEqual(TokenOfKey(a), LongLit(v)) if isKey(a) =>
      Some((Long.MinValue, v))
    case GreaterThanOrEqual(LongLit(v), TokenOfKey(a)) if isKey(a) =>
      Some((Long.MinValue, v))
    case LessThanOrEqual(LongLit(v), TokenOfKey(a)) if isKey(a) =>
      Some((v, Long.MaxValue))
    case EqualTo(TokenOfKey(a), LongLit(v)) if isKey(a) => Some((v, v))
    case EqualTo(LongLit(v), TokenOfKey(a)) if isKey(a) => Some((v, v))
    case _ => None
  }

  private def pushable(props: Map[String, String]): Boolean =
    props.get("partitioner").contains("murmur3") &&
      !props.contains("tokenMin") && !props.contains("tokenMax") &&
      !props.contains("resumeKey")

  private def sliceFrom(cond: Expression, output: Seq[Attribute])
      : Option[Map[String, String]] = {
    val keyAttr = output.filter(_.name == "key").toSet[Attribute]
    val bounds = splitConjunctivePredicates(cond)
      .flatMap(boundOf(_, keyAttr.contains))
    if (bounds.isEmpty) None
    else {
      val lo = bounds.map(_._1).max
      val hi = bounds.map(_._2).min
      val slice: Map[String, String] =
        (if (lo > Long.MinValue) Map("tokenMin" -> lo.toString)
         else Map.empty[String, String]) ++
        (if (hi < Long.MaxValue) Map("tokenMax" -> hi.toString)
         else Map.empty[String, String])
      if (slice.isEmpty) None else Some(slice)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Before V2 scan planning (e.g. a rule batch ahead of the early
    // pushdown): rewrite the relation's table options.
    case f @ Filter(cond, rel @ DataSourceV2Relation(table: MaTable, _, _, _, _, _))
        if pushable(table.props) =>
      sliceFrom(cond, rel.output).fold(f: LogicalPlan) { slice =>
        f.copy(child = rel.copy(table = new MaTable(table.props ++ slice)))
      }
    // After V2ScanRelationPushDown has built the scan (the shape user
    // rules see, since they run at the optimizer's tail): rebuild the
    // scan over the widened options, keeping the pruned schema.
    case f @ Filter(cond,
        sr @ DataSourceV2ScanRelation(rel, scan: MaScan, _, _, _))
        if rel.table.isInstanceOf[MaTable] && pushable(scan.options) =>
      sliceFrom(cond, sr.output).fold(f: LogicalPlan) { slice =>
        val table = rel.table.asInstanceOf[MaTable]
        f.copy(child = sr.copy(
          relation = rel.copy(table = new MaTable(table.props ++ slice)),
          scan = new MaScan(scan.options ++ slice, scan.required)))
      }
  }
}
