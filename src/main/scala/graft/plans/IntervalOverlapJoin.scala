package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst extension — the full ladder rung (c) of the
  * build contract: a custom [[LogicalPlan]] node, a [[SparkStrategy]],
  * and a [[SparkPlan]] with SMJ-style distribution/ordering contracts,
  * registered through [[GraftExtensions]].
  *
  * The operator: KEYED INTERVAL-OVERLAP JOIN for per-side-disjoint
  * interval sets — the cumulative-quantity regime of
  * [[graft.ops.Allocate.fifoMatch]] (FIFO lot matching), sequence
  * alignment, and versioned-range reconciliation. Both sides arrive
  * hash-clustered on the key and locally sorted by (key, lo); each
  * key's two interval lists then merge with ONE two-pointer pass —
  * O(nL + nR + matches) per key, versus the SortMergeJoin fallback
  * that materializes every same-key row PAIR before the overlap filter
  * (O(nL · nR)). Same exchange count as SMJ (the equi-join
  * co-partitioning); the win is the per-key join kernel, which is what
  * explodes first on a hot key at 100 TB.
  *
  * Contracts: the key is ANY orderable Catalyst type (compared through
  * the type's interpreted ordering — both sides must agree on the
  * type); lo/hi are LongType; intervals may OVERLAP freely
  * within a side (the kernel is a lo-ordered sweep with lazy eviction
  * — O(nL + nR + matches) with the active set bounded by the side's
  * max concurrency; for disjoint-interval sides like the FIFO
  * cumulative axes the active set is a two-pointer in disguise).
  * Empty intervals (hi <= lo) never match.
  */
case class IntervalOverlapJoin(
    left: LogicalPlan, right: LogicalPlan,
    lKey: Attribute, lLo: Attribute, lHi: Attribute,
    rKey: Attribute, rLo: Attribute, rHi: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalOverlapJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one-pattern lowering of the logical node. */
object IntervalOverlapStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: IntervalOverlapJoin =>
      IntervalOverlapJoinExec(j.lKey, j.lLo, j.lHi, j.rKey, j.rLo, j.rHi,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class IntervalOverlapJoinExec(
    lKey: Attribute, lLo: Attribute, lHi: Attribute,
    rKey: Attribute, rLo: Attribute, rHi: Attribute,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // the SMJ contract: co-clustered on the key, locally sorted by
  // (key, lo) — EnsureRequirements inserts exchanges/sorts only where
  // the child plans don't already satisfy this (a window partitioned
  // by the same key upstream means NO new exchange)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(lKey)) :: ClusteredDistribution(Seq(rKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(lKey, Ascending), SortOrder(lLo, Ascending)),
      Seq(SortOrder(rKey, Ascending), SortOrder(rLo, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalOverlapJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    require(lKey.dataType == rKey.dataType,
      s"key types differ: ${lKey.dataType} vs ${rKey.dataType}")
    // interpreted ordering over the key's Catalyst type — the same
    // comparator EnsureRequirements' sorts use, so group boundaries
    // here agree with the child ordering for ANY orderable key type
    val keyOrd: Ordering[Any] =
      org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(lKey.dataType)
    val lk = BindReferences.bindReference(lKey: Expression, left.output)
    val ll = BindReferences.bindReference(lLo: Expression, left.output)
    val lh = BindReferences.bindReference(lHi: Expression, left.output)
    val rk = BindReferences.bindReference(rKey: Expression, right.output)
    val rl = BindReferences.bindReference(rLo: Expression, right.output)
    val rh = BindReferences.bindReference(rHi: Expression, right.output)
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // per-key group reader with one-row lookahead (rows are copied:
      // the scan reuses its UnsafeRow)
      final class Groups(it: Iterator[InternalRow], keyE: Expression,
          loE: Expression, hiE: Expression) {
        private var look: InternalRow =
          if (it.hasNext) it.next().copy() else null
        def hasGroup: Boolean = look != null
        def headKey: Any = keyE.eval(look)
        def skipGroup(): Unit = {
          val k = headKey
          while (look != null && keyOrd.equiv(keyE.eval(look), k))
            look = if (it.hasNext) it.next().copy() else null
        }
        def readGroup(): (Array[InternalRow], Array[Long], Array[Long]) = {
          val k = headKey
          val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          val los = scala.collection.mutable.ArrayBuffer.empty[Long]
          val his = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (look != null && keyOrd.equiv(keyE.eval(look), k)) {
            rows += look
            los += loE.eval(look).asInstanceOf[Long]
            his += hiE.eval(look).asInstanceOf[Long]
            look = if (it.hasNext) it.next().copy() else null
          }
          (rows.toArray, los.toArray, his.toArray)
        }
      }
      val lg = new Groups(lIter, lk, ll, lh)
      val rg = new Groups(rIter, rk, rl, rh)
      val proj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      // Streamed emission (round-7 verdict item #3 / ROADMAP debt #5):
      // the lo-ordered sweep below is suspended MID-WALK between
      // next() calls — one output row per call, never an output
      // buffer. For each left (in lo order) admit rights with
      // rlo < lhi into the active set, drop actives with rhi <= llo,
      // emit the rest — every surviving active overlaps (rlo < lhi ∧
      // rhi > llo). Handles arbitrarily overlapping sides; cost is
      // O(nL + nR + matches) per key with resident memory = the two
      // INPUT groups + the active set (bounded by right-side max
      // concurrency); a key whose MATCH count explodes (the skew
      // regime at 100 TB) no longer materializes its output array.
      // The emitted row reuses the projection buffer, the standard
      // exec-node contract (downstream copies if it buffers).
      new Iterator[InternalRow] {
        private var lrows: Array[InternalRow] = null
        private var llos: Array[Long] = null
        private var lhis: Array[Long] = null
        private var rrows: Array[InternalRow] = null
        private var rlos: Array[Long] = null
        private var rhis: Array[Long] = null
        private val active = scala.collection.mutable.ArrayBuffer.empty[Int]
        private var i = 0     // current left row in the group
        private var j = 0     // next right row to admit
        private var a = 0     // resume slot in the active set
        private var ready: InternalRow = null

        // admit rights for left i, then position the active-set scan
        private def startLeft(): Unit = {
          val llo = llos(i); val lhi = lhis(i)
          while (j < rrows.length && rlos(j) < lhi) {
            if (rhis(j) > llo) active += j
            j += 1
          }
          a = 0
        }

        private def loadGroup(): Boolean = {
          while (lg.hasGroup && rg.hasGroup) {
            val c = keyOrd.compare(lg.headKey, rg.headKey)
            if (c < 0) lg.skipGroup()
            else if (c > 0) rg.skipGroup()
            else {
              val (lr, ll2, lh2) = lg.readGroup()
              val (rr, rl2, rh2) = rg.readGroup()
              lrows = lr; llos = ll2; lhis = lh2
              rrows = rr; rlos = rl2; rhis = rh2
              active.clear(); i = 0; j = 0
              startLeft()
              return true
            }
          }
          false
        }

        private def advance(): Unit = {
          while (ready == null) {
            if (lrows == null && !loadGroup()) return
            val llo = llos(i); val lhi = lhis(i)
            while (a < active.length && ready == null) {
              val rj = active(a)
              if (rhis(rj) <= llo) {
                // lazy eviction: swap-remove, re-examine slot a
                active(a) = active(active.length - 1)
                active.remove(active.length - 1)
              } else {
                if (rlos(rj) < lhi && rhis(rj) > llo)
                  ready = proj(joined(lrows(i), rrows(rj)))
                a += 1
              }
            }
            if (ready == null) {
              i += 1
              if (i < lrows.length) startLeft()
              else lrows = null // group exhausted; load the next key
            }
          }
        }

        override def hasNext: Boolean = { advance(); ready != null }
        override def next(): InternalRow = {
          advance()
          val r = ready; ready = null; r
        }
      }
    }
  }
}

/** DataFrame-level API for the custom node. */
object IntervalOverlapJoin {

  /** Join `left` and `right` on key equality + interval overlap via
    * [[IntervalOverlapJoinExec]]. Output = left columns ++ right
    * columns (names must be disjoint). The right side is re-aliased
    * through a Project so a self-join never carries duplicate
    * expression ids into the custom node.
    */
  def join(left: DataFrame, right: DataFrame,
      lKey: String, lLo: String, lHi: String,
      rKey: String, rLo: String, rHi: String): DataFrame = {
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "column names of the two sides must be disjoint")
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    val rp = Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output}"))
    val node = IntervalOverlapJoin(lp, rp,
      attr(lp, lKey), attr(lp, lLo), attr(lp, lHi),
      attr(rp, rKey), attr(rp, rLo), attr(rp, rHi))
    org.apache.spark.sql.GraftShim.ofRows(left.sparkSession, node)
  }
}
