package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BindReferences, Expression, GreaterThanOrEqual, JoinedRow, LessThanOrEqual, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** A custom whole-operator extension (SURVEY §4.2 stretch goal): an
  * interval-containment join `probe.pos BETWEEN build.lo AND build.hi`
  * planned as a broadcast of the (small) interval side, sorted by `lo`
  * with a prefix-max of `hi`, probed by binary search — O(log B + k) per
  * probe row instead of the O(B) per row of the BroadcastNestedLoopJoin
  * Spark would otherwise pick.
  *
  * This is the reference's `Scan.withStartRow/withStopRow` + spanning-
  * block lookup (`GVCFHBase.java:~85`, reconstructed per SURVEY §0)
  * as a first-class physical operator: the genome-position probe against
  * reference-block intervals.
  *
  * Scale notes (100 TB): the interval side must fit in a broadcast
  * (same contract as any dimension broadcast); the probe side streams
  * with NO shuffle and NO per-row O(B) scan. For interval sides too big
  * to broadcast, use the bucketed explode+equi-join plan (Combine.A6) —
  * the strategy deliberately declines those (falls through to Spark).
  */
case class BroadcastRangeJoinExec(
    probe: SparkPlan,
    build: SparkPlan,
    pos: Expression,
    lo: Expression,
    hi: Expression) extends BinaryExecNode {

  override def left: SparkPlan = probe
  override def right: SparkPlan = build
  override def output: Seq[Attribute] = probe.output ++ build.output

  /** Per-INSTANCE build counter (tests assert broadcast reuse across
    * repeated actions by reading it off the executed plan node). An
    * instance-scoped counter can't be inflated by other suites that
    * happen to trigger the strategy concurrently, unlike the old
    * JVM-global one. */
  @transient val builds = new java.util.concurrent.atomic.AtomicLong(0L)

  // The probe side streams through unchanged, so its distribution and
  // order survive — without these overrides a downstream aggregate on
  // the probe key would insert a needless exchange/sort.
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    probe.outputPartitioning
  override def outputOrdering: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
    probe.outputOrdering

  // One build+broadcast per plan instance: repeated actions on the same
  // DataFrame (count then collect, iterative callers) reuse it instead
  // of re-collecting the build side on the driver every execute().
  @transient private lazy val builtBroadcast = {
    builds.incrementAndGet()
    // Build side: collect, evaluate (lo, hi) once per interval, sort by
    // lo, precompute prefix max(hi) for early backward-scan termination.
    // Rows with NULL lo/hi match nothing under inner-join semantics
    // (the BETWEEN predicate is null), so they are dropped, not NPE'd.
    val buildRows = build.executeCollect()
    val loEval = BindReferences.bindReference(lo, build.output)
    val hiEval = BindReferences.bindReference(hi, build.output)
    val entries = buildRows.flatMap { r =>
      (loEval.eval(r), hiEval.eval(r)) match {
        case (l: Number, h: Number) => Some((l.longValue(), h.longValue(), r.copy()))
        case _ => None
      }
    }.sortBy(_._1)
    val los = entries.map(_._1)
    val his = entries.map(_._2)
    val rows = entries.map(_._3)
    val prefixMaxHi = new Array[Long](entries.length)
    var m = Long.MinValue
    for (i <- entries.indices) { m = math.max(m, his(i)); prefixMaxHi(i) = m }
    sparkContext.broadcast((los, his, rows, prefixMaxHi))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val bcast = builtBroadcast
    val posExpr = BindReferences.bindReference(pos, probe.output)
    val outputAttrs = output
    probe.execute().mapPartitions { iter =>
      val (blos, bhis, brows, bmax) = bcast.value
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outputAttrs, outputAttrs)
      iter.flatMap { probeRow =>
        val pv = posExpr.eval(probeRow)
        if (pv == null || blos.isEmpty) Iterator.empty
        else {
          val p = pv.asInstanceOf[Number].longValue()
          // binary search: first index with lo > p
          var loIdx = 0; var hiIdx = blos.length
          while (loIdx < hiIdx) {
            val mid = (loIdx + hiIdx) >>> 1
            if (blos(mid) <= p) loIdx = mid + 1 else hiIdx = mid
          }
          // scan backwards over lo <= p while any interval can still
          // span p — LAZILY: a hot position spanned by most of a
          // near-threshold build side would otherwise buffer every
          // match (with its copied row) before emitting the first.
          // Safe to defer: Iterator.flatMap drains this inner iterator
          // completely before pulling (and thus mutating) the next
          // probe row.
          val startIdx = loIdx - 1
          new scala.collection.AbstractIterator[InternalRow] {
            private var j = startIdx
            seek()
            private def seek(): Unit = {
              while (j >= 0 && bmax(j) >= p && bhis(j) < p) j -= 1
            }
            override def hasNext: Boolean = j >= 0 && bmax(j) >= p
            override def next(): InternalRow = {
              val r = project(joined(probeRow, brows(j))).copy()
              j -= 1; seek(); r
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(probe = newLeft, build = newRight)
}

/** Planner strategy: intercept inner joins whose ONLY condition is
  * `pos >= lo AND pos <= hi` with long-typed pos from the left side and
  * lo/hi from a small right side (the canonical probe⋈intervals
  * orientation — matching output ordering). Declines anything else
  * (equi keys, big build sides, outer joins, flipped orientation) —
  * Spark's planner handles those, so queries stay correct on sessions
  * without the extension. */
case class RangeJoinStrategy(spark: SparkSession) extends SparkStrategy {

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.subsetOf(side.outputSet)

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, Inner, Some(And(
        GreaterThanOrEqual(pos1, lo), LessThanOrEqual(pos2, hi))), _)
        if pos1.semanticEquals(pos2) &&
          pos1.dataType == org.apache.spark.sql.types.LongType &&
          refsOnly(pos1, l) && refsOnly(lo, r) && refsOnly(hi, r) &&
          r.stats.sizeInBytes <= spark.sessionState.conf.autoBroadcastJoinThreshold =>
      BroadcastRangeJoinExec(planLater(l), planLater(r), pos1, lo, hi) :: Nil
    case _ => Nil
  }
}
