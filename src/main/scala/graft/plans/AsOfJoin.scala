package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** AS-OF join as a FIRST-CLASS plan node — preference tier (c) of the
  * builder brief (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
  * the whole-operator extension mechanism), alongside the composed
  * union+window form in [[graft.ops.AsOf]] which stays as the
  * no-extension fallback.
  *
  * Semantics (matching DuckDB's native `ASOF LEFT JOIN`, the oracle):
  * every left row joined to the single right row with the greatest
  * `rightTime <= leftTime` among rows with equal keys — inclusive on
  * equality — or right-side NULLs when no such row exists. NULL keys and
  * NULL times never match (SQL join semantics).
  *
  * Why a custom operator is the right 100 TB shape: the composed form
  * pays a union (schema-widening both sides with null payload columns)
  * plus a carry-forward window over the unioned stream; this node asks
  * the planner for exactly what the algorithm needs — hash co-partition
  * both children on the key, sort each by (key, time) — and then merges
  * the two sorted per-partition streams with one O(|L|+|R|) forward
  * pointer, the sort-merge-join discipline minus the equi-match fanout.
  * No union, no widened shuffle payload, no window state: each side
  * shuffles ONCE in its own (narrower) schema and the right side's
  * payload is touched only at emit. EnsureRequirements inserts the
  * exchanges/sorts (and elides them when a child is already partitioned
  * or sorted correctly — e.g. a bucketed table joins exchange-free,
  * which no window-over-union formulation can exploit).
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] to [[AsOfJoinExec]]; injected via
  * `experimental.extraStrategies` ([[graft.functions.GraftFunctions
  * .register]]) or `injectPlannerStrategy`
  * ([[graft.functions.GraftExtensions]]).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: requires both children hash-clustered on the key
  * and sorted by (key, time); merges the sorted streams per partition
  * with a single forward-only right pointer carrying the latest
  * at-or-before right row per key. Left rows stream straight through —
  * state is ONE buffered right row, so memory is O(1) per partition
  * regardless of key skew (compare: the window form holds a frame
  * pointer per key group in the sort buffer).
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends SparkPlan {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def children: Seq[SparkPlan] = Seq(left, right)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): AsOfJoinExec =
    copy(left = newChildren(0), right = newChildren(1))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val (lkE, ltE, rkE, rtE) = (leftKey, leftTime, rightKey, rightTime)
    val lRdd = left.execute()
    val rRdd = right.execute()
    // zipPartitions throws an opaque error on mismatched counts; fail with
    // the contract instead (EnsureRequirements guarantees this normally —
    // a direct construction or a requirement change would surface here)
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsOfJoinExec children must be co-partitioned: " +
        s"${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions} partitions")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lk = BindReferences.bindReference(lkE, leftOut)
      val lt = BindReferences.bindReference(ltE, leftOut)
      val rk = BindReferences.bindReference(rkE, rightOut)
      val rt = BindReferences.bindReference(rtE, rightOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(lkE.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(ltE.dataType)
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      // the latest consumed right row whose (key, time) was <= some seen
      // left (key, time); rows are COPIED out of the scan's reused buffer
      var curMatch: InternalRow = null
      var curMatchKey: Any = null
      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKeyVal = lk.eval(l)
          val lTimeVal = lt.eval(l)
          if (lKeyVal == null || lTimeVal == null) {
            resultProj(joined(l, nullRight))
          } else {
            // advance the right pointer: discard null/behind keys, absorb
            // at-or-before rows of the current key (later ones win — the
            // stream is time-sorted within the key)
            var scan = true
            while (scan && rBuf.hasNext) {
              val h = rBuf.head
              val hk = rk.eval(h)
              if (hk == null) { rBuf.next(); () }
              else {
                val c = keyOrd.compare(hk, lKeyVal)
                if (c < 0) { rBuf.next(); () }
                else if (c == 0) {
                  val ht = rt.eval(h)
                  if (ht == null) { rBuf.next(); () }
                  else if (timeOrd.compare(ht, lTimeVal) <= 0) {
                    curMatch = h.copy()
                    curMatchKey = rk.eval(curMatch)
                    rBuf.next(); ()
                  } else scan = false
                } else scan = false
              }
            }
            val hit = curMatch != null && curMatchKey != null &&
              keyOrd.compare(curMatchKey, lKeyVal) == 0
            resultProj(joined(l, if (hit) curMatch else nullRight))
          }
        }
      }
    }
  }
}

/** DataFrame-level entry: `asofJoin(events, orders, "user_id", "key",
  * "ts", "t")`. Children must expose DISJOINT column names (the node
  * carries both outputs verbatim, like a join with no USING clause).
  */
object AsOfJoinApi {
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    // honor the session's resolution mode — Spark resolves column names
    // case-insensitively by default, and this API should not be stricter
    val caseSensitive = left.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    def canon(n: String) = if (caseSensitive) n else n.toLowerCase
    def attr(plan: LogicalPlan, name: String) =
      plan.output.find(a => canon(a.name) == canon(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    require(lPlan.output.map(a => canon(a.name)).toSet
      .intersect(rPlan.output.map(a => canon(a.name)).toSet).isEmpty,
      "asofJoin children must have disjoint column names")
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    // the exec compares values through ONE interpreted ordering built
    // from the LEFT side's types — mismatched sides would sort fine on
    // their own types and then ClassCastException inside the merge, so
    // reject them at construction instead
    require(lk.dataType == rk.dataType,
      s"asofJoin key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"asofJoin time types differ: ${lt.dataType} vs ${rt.dataType}")
    // the merge orders keys/times through interpreted orderings — an
    // unorderable type (e.g. map) would pass construction and only fail
    // inside TypeUtils.getInterpretedOrdering on executors
    import org.apache.spark.sql.catalyst.expressions.RowOrdering
    require(RowOrdering.isOrderable(lk.dataType),
      s"asofJoin key type ${lk.dataType} is not orderable")
    require(RowOrdering.isOrderable(lt.dataType),
      s"asofJoin time type ${lt.dataType} is not orderable")
    GraftPlanBridge.ofRows(left.sparkSession,
      AsOfJoin(lPlan, rPlan, lk, rk, lt, rt))
  }
}
