package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN as a whole custom operator — the preference-tier-(c) form
  * ("custom LogicalPlan + Rule/Strategy + SparkPlan for whole-operator
  * semantics"): Spark has no as-of join operator (the long-open upstream
  * ask), and while the semantics can be COMPOSED (q64's union-tag +
  * ignore-nulls window), composition carries both inputs through ONE
  * wide sorted pass and materializes window state per row. This operator
  * instead declares the join to the planner: each side keeps its own
  * schema, EnsureRequirements co-partitions both sides on the key and
  * sorts them (key, time) — exactly a sort-merge join's requirements —
  * and the physical node streams the two sorted iterators per partition
  * with O(1) state (the one held right row), no window buffer, no
  * union blow-up of the row width.
  *
  * Semantics: backward INCLUSIVE as-of — for every left row, the right
  * row of the same key with the greatest (time, tiebreak) ≤ (left time,
  * +∞); no match → null right columns (left outer). Keys and times must
  * be LongType (micros/ids); the tiebreak makes the pick total when
  * right times collide.
  *
  * Registered through [[AsOfJoin.ensureRegistered]] (the
  * `experimental.extraStrategies` hook) — [[AsOfJoin.apply]] does it
  * per-session automatically.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTieBreak: Attribute)
  extends BinaryNode {

  require(leftKey.dataType == LongType && rightKey.dataType == LongType &&
    leftTime.dataType == LongType && rightTime.dataType == LongType &&
    rightTieBreak.dataType == LongType,
    "as-of join keys/times/tiebreak must be LongType")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of join: co-partitioned on the key, both sides sorted
  * (key, time[, tiebreak]) by EnsureRequirements, then one linear merge
  * per partition. Per-task state is ONE buffered right row — compare
  * with the window host, whose state is the whole frame machinery. */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTieBreak: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTieBreak, Ascending)))

  // Output rows are 1:1 with the left child's, in the left child's
  // partitions and order — advertise that, or EnsureRequirements
  // re-exchanges and re-sorts for any downstream per-key operator
  // (groupBy on the same key, a second join) over data this node just
  // had clustered and sorted. Same contract SortMergeJoinExec exposes.
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKey = leftKey
    val rKey = rightKey
    val lTime = leftTime
    val rTime = rightTime
    val out = output
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lproj = UnsafeProjection.create(Seq(lKey, lTime), leftOut)
      val rproj = UnsafeProjection.create(Seq(rKey, rTime), rightOut)
      // bind against the NULLABLE view of the right side: the joined row
      // carries nulls for unmatched left rows, and binding to the
      // original non-nullable attributes would elide the null checks
      // (reading 0 instead of null)
      val outProj = UnsafeProjection.create(out,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)
      val rb = ri.buffered
      // the single piece of merge state: the best-so-far right row for
      // the key currently being scanned
      var heldKey = 0L
      var held: InternalRow = null
      // cached projection of rb.head, invalidated only when the right
      // iterator advances: a key run of many left rows against a right
      // head already past the key would otherwise re-project the same
      // unchanged row once per left row
      var headValid = false
      var headNull = false
      var headK = 0L
      var headT = 0L
      li.map { l =>
        val lkt = lproj(l)
        // standard join semantics: a NULL key or time never matches.
        // Without the explicit check the unsafe projection would read a
        // null long as 0 and silently join under key 0 — while the sort
        // put the row in the NULLS FIRST position, so read value and
        // sort position would disagree.
        if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
          outProj(joiner(l, nullRight))
        } else {
          val lk = lkt.getLong(0)
          val lt = lkt.getLong(1)
          var advancing = true
          while (advancing && rb.hasNext) {
            if (!headValid) {
              val rkt = rproj(rb.head)
              headNull = rkt.isNullAt(0) || rkt.isNullAt(1)
              if (!headNull) { headK = rkt.getLong(0); headT = rkt.getLong(1) }
              headValid = true
            }
            if (headNull) {
              rb.next(); headValid = false // null-keyed rows (sorted first) never match
            } else if (headK < lk) {
              rb.next(); headValid = false // right row of an already-passed key: discard
              // (a stale `held` is harmless: the heldKey == lk guard)
            } else if (headK == lk && headT <= lt) {
              held = rb.next().copy() // newest qualifying row wins
              headValid = false
              heldKey = lk
            } else {
              advancing = false
            }
          }
          val r = if (held != null && heldKey == lk) held else nullRight
          outProj(joiner(l, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule (the `Rule[LogicalPlan]` leg of the custom-operator
  * registration): Catalyst's own PushDownPredicates cannot see through
  * an unknown node, so without this rule a `filter` applied after an
  * as-of join scans and sorts BOTH full inputs first. Left-side
  * conjuncts are safe to push — every left row's match is independent
  * of other left rows — and once below the operator they keep sinking
  * to the parquet scan (PushedFilters). Right-side predicates must NOT
  * be pushed: dropping right rows changes which row is "latest" for
  * the survivors (they filter the OUTPUT's matched columns, a
  * different question than filtering the input). */
object AsOfJoinFilterPushdown
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(p => p.references.subsetOf(j.left.outputSet) && p.deterministic)
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsOfJoin {

  def ensureRegistered(spark: SparkSession): Unit = {
    GraftColumnBridge.addStrategy(spark, AsOfJoinStrategy)
    GraftColumnBridge.addOptimization(spark, AsOfJoinFilterPushdown)
  }

  /** Backward-inclusive as-of join of `left` with `right` (left outer):
    * per left row, the right row of the same key with the greatest
    * (time, tiebreak) ≤ (left time, +∞). Column names must be disjoint
    * across the two sides (as with stream-stream joins). */
  def apply(spark: SparkSession, left: DataFrame, right: DataFrame,
            leftOn: String, rightOn: String,
            leftTimeCol: String, rightTimeCol: String,
            rightTieBreakCol: String): DataFrame = {
    ensureRegistered(spark)
    val lp = GraftColumnBridge.analyzedPlan(left)
    val rp = GraftColumnBridge.analyzedPlan(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${p.output.map(_.name).mkString(",")}"))
    GraftColumnBridge.ofRows(spark, AsOfJoinPlan(lp, rp,
      attr(lp, leftOn), attr(rp, rightOn),
      attr(lp, leftTimeCol), attr(rp, rightTimeCol),
      attr(rp, rightTieBreakCol)))
  }
}
