package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Range (band) join as a FIRST-CLASS plan node — the [[AsOfJoin]]
  * playbook applied to the other interval shape: inner-join every left
  * row to the right rows with an EQUAL key whose time lies within
  * `±tolerance` of the left time.
  *
  * The composed fallback ([[graft.ops.RangeJoin.eventPairsWithin]])
  * bucketizes time and equi-joins on (key, bucket) with a 3× probe-side
  * fan-out — correct and shuffle-friendly, but it replays every probe row
  * three times through the exchange and re-filters the exact predicate.
  * This node asks the planner for exactly what the band-merge algorithm
  * needs — both children hash-clustered on the key, sorted by
  * (key, time) — and then runs the textbook sliding-window merge per
  * partition: one forward pass over each side, right rows entering a
  * deque when they come within `tolerance` ahead of the current left time
  * and leaving when they fall `tolerance` behind. No fan-out, no
  * re-filter; state is the right rows inside one 2·tolerance band
  * (bounded by time density, not key size). EnsureRequirements inserts
  * the exchanges/sorts and ELIDES them when a child is already
  * partitioned or sorted right — e.g. pre-bucketed inputs join
  * exchange-free, which the bucket-fan-out formulation cannot exploit.
  *
  * Time columns are exact integer microseconds (LongType, enforced at
  * the API) — the same integer-time discipline as the composed form and
  * the `epoch_us` DuckDB oracle.
  */
case class RangeJoinPlan(left: LogicalPlan, right: LogicalPlan,
                         leftKey: Expression, rightKey: Expression,
                         leftTime: Expression, rightTime: Expression,
                         toleranceUs: Long)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[RangeJoinPlan]] to [[RangeJoinExec]]; injected alongside
  * [[AsOfJoinStrategy]].
  */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, lk, rk, lt, rt, tol) =>
      RangeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

/** Physical band join: per co-partition, streams the key-and-time-sorted
  * left side once while a deque holds exactly the right rows of the
  * current key within `[leftTime − tol, leftTime + tol]` — rows are
  * admitted from the (equally sorted) right stream as the left time
  * advances and evicted from the head as they age out, so every deque
  * operation is O(1) amortized and memory is one time-band per partition
  * regardless of key skew.
  */
case class RangeJoinExec(left: SparkPlan, right: SparkPlan,
                         leftKey: Expression, rightKey: Expression,
                         leftTime: Expression, rightTime: Expression,
                         toleranceUs: Long)
    extends SparkPlan {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def children: Seq[SparkPlan] = Seq(left, right)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): RangeJoinExec =
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
    val tol = toleranceUs
    val lRdd = left.execute()
    val rRdd = right.execute()
    // zipPartitions throws an opaque error on mismatched counts; fail with
    // the contract instead (EnsureRequirements guarantees this normally)
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"RangeJoinExec children must be co-partitioned: " +
        s"${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions} partitions")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lk = BindReferences.bindReference(lkE, leftOut)
      val lt = BindReferences.bindReference(ltE, leftOut)
      val rk = BindReferences.bindReference(rkE, rightOut)
      val rt = BindReferences.bindReference(rtE, rightOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(lkE.dataType)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      // right rows of the CURRENT left key inside the band, time-ascending
      val window = new scala.collection.mutable.ArrayDeque[(Long, InternalRow)]
      var winKey: Any = null
      new Iterator[InternalRow] {
        private var matches: Iterator[InternalRow] = Iterator.empty
        private def advance(): Boolean = {
          while (!matches.hasNext && lIter.hasNext) {
            val l = lIter.next()
            val kv = lk.eval(l)
            val tv = lt.eval(l)
            if (kv != null && tv != null) { // inner join: null never matches
              val t0 = tv.asInstanceOf[Long]
              if (winKey == null || keyOrd.compare(winKey, kv) != 0) {
                window.clear()
                winKey = kv
              }
              while (window.nonEmpty && window.head._1 < t0 - tol)
                window.removeHead()
              // admit right rows: discard null/behind keys; for the current
              // key absorb times ≤ t0 + tol (stale ones — possible because
              // left time advanced past them — drop on arrival)
              var scan = true
              while (scan && rBuf.hasNext) {
                val h = rBuf.head
                val hk = rk.eval(h)
                if (hk == null) { rBuf.next(); () }
                else {
                  val c = keyOrd.compare(hk, kv)
                  if (c < 0) { rBuf.next(); () }
                  else if (c == 0) {
                    val ht = rt.eval(h)
                    if (ht == null) { rBuf.next(); () }
                    else {
                      val t1 = ht.asInstanceOf[Long]
                      if (t1 <= t0 + tol) {
                        if (t1 >= t0 - tol) window.append((t1, h.copy()))
                        rBuf.next(); ()
                      } else scan = false
                    }
                  } else scan = false
                }
              }
              if (window.nonEmpty) {
                val lCopy = l.copy()
                matches = window.iterator.map { case (_, r) =>
                  proj(joined(lCopy, r))
                }
              }
            }
          }
          matches.hasNext
        }
        override def hasNext: Boolean = advance()
        override def next(): InternalRow = { advance(); matches.next() }
      }
    }
  }
}

/** DataFrame-level entry: `rangeJoin(a, b, "user_id", "uid_b", "us_a",
  * "us_b", tolUs)`. Children must expose DISJOINT column names; time
  * columns must be LongType (integer microseconds); keys must be
  * orderable and of equal type on both sides.
  */
object RangeJoinApi {
  def rangeJoin(left: DataFrame, right: DataFrame,
                leftKey: String, rightKey: String,
                leftTime: String, rightTime: String,
                toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, s"tolerance must be ≥ 0, got $toleranceUs")
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    val caseSensitive = left.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    def canon(n: String) = if (caseSensitive) n else n.toLowerCase
    def attr(plan: LogicalPlan, name: String) =
      plan.output.find(a => canon(a.name) == canon(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    require(lPlan.output.map(a => canon(a.name)).toSet
      .intersect(rPlan.output.map(a => canon(a.name)).toSet).isEmpty,
      "rangeJoin children must have disjoint column names")
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    require(lk.dataType == rk.dataType,
      s"rangeJoin key types differ: ${lk.dataType} vs ${rk.dataType}")
    // the exec compares keys through one interpreted ordering — an
    // unorderable type (map) would only fail inside executors otherwise
    require(org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(lk.dataType),
      s"rangeJoin key type ${lk.dataType} is not orderable")
    require(lt.dataType == LongType && rt.dataType == LongType,
      s"rangeJoin time columns must be LongType integer microseconds, " +
        s"got ${lt.dataType} / ${rt.dataType}")
    GraftPlanBridge.ofRows(left.sparkSession,
      RangeJoinPlan(lPlan, rPlan, lk, rk, lt, rt, toleranceUs))
  }
}
