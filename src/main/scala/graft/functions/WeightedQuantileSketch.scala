package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Bounded-memory WEIGHTED quantile summary — the giant-group escape
  * hatch for [[graft.ops.WeightedStats.weightedQuantiles]] the way
  * `percentile_approx` is for the exact unweighted percentiles
  * ([[Percentiles]]): Spark ships no weighted equivalent, so this is
  * the engine's own mergeable sketch with weights as rank mass.
  *
  * Structure: sorted tuples `(v, gExact, gSpread, d)`:
  *  - `gExact` — weight sitting EXACTLY at `v`;
  *  - `gSpread` — weight of compressed-away smaller neighbors, spread
  *    somewhere in `(v_prev, v]` (run-max invariant: never above `v`);
  *  - `d` — weight that may HIDE at or below `v` inside LATER tuples
  *    (introduced only by merging two summaries whose runs interleave).
  *
  * With `cum(i) = Σ_{j≤i} (gExact_j + gSpread_j)`, the true weight at
  * or below `v_i` lies in `[cum(i), cum(i) + d_i]`, so every operation
  * preserves a per-tuple certificate and the error bound is
  * `max(gSpread + d) ≤ 2·eps·W`:
  *
  *  - INSERT (batched, sorted): fresh values are exact — `gSpread = 0`
  *    — and inherit `d` from the next tuple's `gSpread + d` (its
  *    spread may dip below the landing point; zero when nothing has
  *    been compressed or merged yet, so a small summary answers
  *    exactly — spec-pinned).
  *  - COMPRESS: merge tuple i into its right neighbor while
  *    `g_i + gSpread_{i+1} + d_{i+1} ≤ 2·eps·W` — absorbed mass
  *    becomes the neighbor's `gSpread`; a value heavier than the
  *    budget is never absorbed and stays exactly answerable.
  *  - MERGE (sorted interleave): a tuple taken from side X can have at
  *    most the OTHER side's next tuple's `gSpread + d` hiding at or
  *    below it (that tuple's `gExact` sits strictly above, at its own
  *    larger value) — bump `d` by exactly that. The certificate stays
  *    ADDITIVE across any merge tree: `gSpread' + d' ≤ 2·eps·W_x +
  *    2·eps·W_y = 2·eps·W`, so the bound never compounds with the
  *    number of merges. (A blanket `2·eps·W_other` bump per merge
  *    does compound — measured ~5·eps after a 32-partition reduce;
  *    and bumping with the next tuple's FULL `g` breaks small-group
  *    exactness. Both rejected forms are why the mass split exists.)
  *
  * QUERY for the lower weighted quantile num/den: the first tuple with
  * `cum(i) + d_i ≥ ceil(W·num/den)` — within `2·eps·W` rank mass of
  * the exact crossing ([[graft.ops.WeightedStats]]' `den·cum ≥ num·W`
  * test). State is O(1/eps) tuples per group regardless of group size
  * or weight skew.
  *
  * The EXACT operator remains the conformance default (the oracle
  * hash-compares values); a 100 TB deployment swaps per call site,
  * same as the [[LocScaleBSketch]] / [[Percentiles.percentileSketch]]
  * contract. `PercentilesSpec` pins the rank-error bound on skewed
  * million-row multi-partition builds.
  */
final class WgkBuffer(val eps: Double) {
  /** Parallel arrays sorted by v; see class doc for the semantics. */
  var vs: Array[Long] = Array.emptyLongArray
  var ge: Array[Long] = Array.emptyLongArray
  var gs: Array[Long] = Array.emptyLongArray
  var ds: Array[Long] = Array.emptyLongArray
  var totalW: Long = 0L
  private var headV = new Array[Long](WgkBuffer.HeadSize)
  private var headW = new Array[Long](WgkBuffer.HeadSize)
  private var headN = 0

  /** Absorption budget; zero while the group is tiny — no compression,
    * exact. TWO-TIER (ROADMAP debt #4): every pre-eval compress absorbs
    * only up to `eps·W`, so certificates arrive at any merge — and at
    * the final answer — with at least `eps·W` of headroom under the
    * published `2·eps·W` bound (the additive-merge invariant holds at
    * ANY per-node absorption cap ≤ the cap's own additive sum: local
    * certs ≤ eps·W_x, a merge adds the other side's ≤ eps·W_y, total
    * ≤ eps·W). The FINAL, eval-time compress then absorbs up to the
    * full `2·eps·W`: with ~eps·W headroom per survivor it actually
    * compacts — measured 1996 → 190 tuples at eps=0.005 on the spec's
    * 32-partition million-row build, where the single-tier scheme
    * saturated every certificate at 0.93·budget and could absorb
    * nothing further. Mid-tree summaries are ~1.7× bigger (3340 vs
    * 1996 at the last merge), a shuffle-size price worth the 10×
    * smaller final state; the query error bound is unchanged.
    */
  private def budget(fin: Boolean): Long =
    ((if (fin) 2.0 else 1.0) * eps * totalW).toLong

  def insert(v: Long, w: Long): Unit = {
    if (w <= 0) return // zero/negative weight carries no mass
    headV(headN) = v
    headW(headN) = w
    headN += 1
    totalW += w
    if (headN == WgkBuffer.HeadSize) { flushHead(); compress() }
  }

  /** Eval-time compaction at the full `2·eps·W` absorption budget —
    * call ONLY when no further merge will follow (the final answer);
    * see [[budget]] for the two-tier scheme.
    */
  def finalCompress(): Unit = compress(fin = true)

  /** Sort the pending inserts and interleave them into the tuple array
    * as exact mass, coalescing equal values.
    */
  def flushHead(): Unit = {
    if (headN == 0) return
    val idx = (0 until headN).sortBy(headV(_))
    val nv = new Array[Long](vs.length + headN)
    val ne = new Array[Long](vs.length + headN)
    val ns = new Array[Long](vs.length + headN)
    val nd = new Array[Long](vs.length + headN)
    var i = 0; var h = 0; var out = 0
    while (i < vs.length || h < headN) {
      val takeHead = i >= vs.length ||
        (h < headN && headV(idx(h)) <= vs(i))
      val (v, e, s, d) =
        if (takeHead) {
          // a fresh value is exact AT v, but the next surviving tuple's
          // spread may dip below it — inherit that as hiding bound
          // (zero in a never-compressed never-merged summary)
          val bump = if (i < vs.length) gs(i) + ds(i) else 0L
          val j = idx(h); h += 1; (headV(j), headW(j), 0L, bump)
        }
        else { val r = (vs(i), ge(i), gs(i), ds(i)); i += 1; r }
      if (out > 0 && nv(out - 1) == v) {
        ne(out - 1) += e
        ns(out - 1) += s
        nd(out - 1) = math.max(nd(out - 1), d)
      } else { nv(out) = v; ne(out) = e; ns(out) = s; nd(out) = d; out += 1 }
    }
    vs = java.util.Arrays.copyOf(nv, out)
    ge = java.util.Arrays.copyOf(ne, out)
    gs = java.util.Arrays.copyOf(ns, out)
    ds = java.util.Arrays.copyOf(nd, out)
    headN = 0
  }

  /** Absorb tuples into their right neighbor's spread mass while the
    * neighbor's certificate `gSpread + d` stays within the budget.
    *
    * Starts with the DELTA-AWARE RE-MERGE (ROADMAP debt #4): a backward
    * relaxation of the hiding bounds before absorption. Two always-true
    * facts tighten `d` for free: mass conservation (`Σ(gExact+gSpread)
    * = W`, so nothing can hide above the last tuple — `d_last = 0`) and
    * rank monotonicity (`R(v_i) ≤ R(v_{i+1})`, so `cum(i)+d_i` may be
    * clipped to `cum(i+1)+d_{i+1}`, i.e. `d_i ≤ gExact_{i+1} +
    * gSpread_{i+1} + d_{i+1}`). Insert-inherited `d`s that saturated
    * the budget — the reason the tuple count crept to ~2.5× plain GK's
    * under heavy insert traffic — deflate wherever the suffix is
    * light, and the absorption loop can then actually absorb. O(n),
    * certificates only shrink, so the 2·eps·W bound is untouched.
    */
  def compress(fin: Boolean = false): Unit = {
    flushHead()
    if (vs.length == 0) return
    ds(vs.length - 1) = 0L
    var k = vs.length - 2
    while (k >= 0) {
      val cap = ge(k + 1) + gs(k + 1) + ds(k + 1)
      if (ds(k) > cap) ds(k) = cap
      k -= 1
    }
    if (vs.length <= 1) return
    val b = budget(fin)
    if (b <= 0L) return
    val nv = new Array[Long](vs.length)
    val ne = new Array[Long](vs.length)
    val ns = new Array[Long](vs.length)
    val nd = new Array[Long](vs.length)
    var out = 0
    var i = 0
    while (i < vs.length) {
      var absorbed = 0L
      var e = ge(i)
      var s = gs(i)
      var d = ds(i)
      while (i + 1 < vs.length &&
          absorbed + e + s + gs(i + 1) + ds(i + 1) <= b) {
        absorbed += e + s
        i += 1
        e = ge(i); s = gs(i); d = ds(i)
      }
      nv(out) = vs(i); ne(out) = e; ns(out) = s + absorbed; nd(out) = d
      out += 1
      i += 1
    }
    vs = java.util.Arrays.copyOf(nv, out)
    ge = java.util.Arrays.copyOf(ne, out)
    gs = java.util.Arrays.copyOf(ns, out)
    ds = java.util.Arrays.copyOf(nd, out)
  }

  def mergeIn(other: WgkBuffer): Unit = {
    other.flushHead()
    flushHead()
    if (other.vs.isEmpty) return
    if (vs.isEmpty) {
      vs = other.vs.clone(); ge = other.ge.clone()
      gs = other.gs.clone(); ds = other.ds.clone()
      totalW += other.totalW
      return
    }
    val n = vs.length + other.vs.length
    val nv = new Array[Long](n)
    val ne = new Array[Long](n)
    val ns = new Array[Long](n)
    val nd = new Array[Long](n)
    var i = 0; var j = 0; var out = 0
    def emit(v: Long, e: Long, s: Long, d: Long): Unit = {
      nv(out) = v; ne(out) = e; ns(out) = s; nd(out) = d; out += 1
    }
    while (i < vs.length || j < other.vs.length) {
      if (i < vs.length && j < other.vs.length && vs(i) == other.vs(j)) {
        // same value on both sides: masses join; later hiding from
        // either side persists
        emit(vs(i), ge(i) + other.ge(j), gs(i) + other.gs(j),
          ds(i) + other.ds(j))
        i += 1; j += 1
      } else if (j >= other.vs.length ||
          (i < vs.length && vs(i) < other.vs(j))) {
        val bump = if (j < other.vs.length) other.gs(j) + other.ds(j) else 0L
        emit(vs(i), ge(i), gs(i), ds(i) + bump)
        i += 1
      } else {
        val bump = if (i < vs.length) gs(i) + ds(i) else 0L
        emit(other.vs(j), other.ge(j), other.gs(j), other.ds(j) + bump)
        j += 1
      }
    }
    vs = java.util.Arrays.copyOf(nv, out)
    ge = java.util.Arrays.copyOf(ne, out)
    gs = java.util.Arrays.copyOf(ns, out)
    ds = java.util.Arrays.copyOf(nd, out)
    totalW += other.totalW
    compress()
  }

  /** Lower weighted quantile at num/den: first tuple whose optimistic
    * rank reaches `ceil(W·num/den)`; rank error ≤ max(gSpread + d) ≤
    * 2·eps·W, and 0 for a never-compressed never-merged summary.
    */
  def query(num: Long, den: Long): Option[Long] = {
    flushHead()
    if (totalW == 0L) return None
    val target = (totalW * num + den - 1) / den
    var cum = 0L
    var i = 0
    while (i < vs.length) {
      cum += ge(i) + gs(i)
      if (cum + ds(i) >= target) return Some(vs(i))
      i += 1
    }
    Some(vs(vs.length - 1))
  }
}

object WgkBuffer {
  /** Pending-insert buffer size before an amortized flush+compress. */
  val HeadSize = 4096
}

/** One weighted quantile per aggregate call:
  * `weighted_quantile_sketch(value, weight)` with `num/den` and `eps`
  * fixed at construction ([[GraftFunctions]] registers the SQL form
  * with literal num/den/eps arguments).
  */
case class WeightedQuantileSketch(
    left: Expression,
    right: Expression,
    num: Long,
    den: Long,
    eps: Double = 0.005,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[WgkBuffer] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"weighted_quantile_sketch expects (bigint, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "weighted_quantile_sketch"

  override def createAggregationBuffer(): WgkBuffer = {
    require(num > 0 && den > 0 && num <= den, s"quantile $num/$den out of (0,1]")
    require(eps > 0 && eps < 1, s"eps $eps out of (0,1)")
    new WgkBuffer(eps)
  }

  override def update(buf: WgkBuffer, input: InternalRow): WgkBuffer = {
    val v = left.eval(input)
    val w = right.eval(input)
    if (v != null && w != null)
      buf.insert(v.asInstanceOf[Long], w.asInstanceOf[Long])
    buf
  }

  override def merge(buf: WgkBuffer, other: WgkBuffer): WgkBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: WgkBuffer): Any = {
    buf.finalCompress()
    buf.query(num, den).map(Long.box).orNull
  }

  override def serialize(buf: WgkBuffer): Array[Byte] = {
    buf.compress()
    val bb = ByteBuffer.allocate(8 + 4 + buf.vs.length * 32)
    bb.putLong(buf.totalW)
    bb.putInt(buf.vs.length)
    var i = 0
    while (i < buf.vs.length) {
      bb.putLong(buf.vs(i)); bb.putLong(buf.ge(i))
      bb.putLong(buf.gs(i)); bb.putLong(buf.ds(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): WgkBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new WgkBuffer(eps)
    buf.totalW = bb.getLong()
    val n = bb.getInt()
    buf.vs = new Array[Long](n)
    buf.ge = new Array[Long](n)
    buf.gs = new Array[Long](n)
    buf.ds = new Array[Long](n)
    var i = 0
    while (i < n) {
      buf.vs(i) = bb.getLong(); buf.ge(i) = bb.getLong()
      buf.gs(i) = bb.getLong(); buf.ds(i) = bb.getLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedQuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WeightedQuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
