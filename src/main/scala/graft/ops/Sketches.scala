package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api._

/** Approximate-query sketches, the deterministic ones — every value here
  * is reproducible in ANSI SQL, so unlike t-digest/HLL (whose estimates
  * depend on implementation internals) these are oracle-checked like any
  * relational query.
  *
  *   KMV  — k-minimum-values distinct sketch: the k smallest distinct
  *          48-bit hashes of the key; (k-1)·2⁴⁸/h₍ₖ₎ estimates NDV.
  *          State is bounded (k longs) via a native TypedImperativeAggregate
  *          (graft.functions.SketchAggregates) with map-side combine —
  *          the way a 100 TB distinct-count actually runs, vs collect_set
  *          (unbounded state) or window-rank (full sort per group).
  *   CMS  — count-min sketch: d hash rows × w counters, point query =
  *          min over rows. The sketch build is one groupBy((r, cell)) —
  *          pure partial+final aggregation — and the probe is a broadcast
  *          join against the d·w-cell sketch, never a corpus re-scan.
  */
object Sketches {

  // the portable 48-bit hash lives in graft.api (single definition
  // shared with Dedup/Pipeline)

  private val K = 64
  private val TwoPow48 = 281474976710656.0 // normalizer for the 48-bit hash space

  /** KMV distinct-count sketch per l_returnflag next to the exact NDV —
    * the accuracy report a pipeline keeps beside any approximate
    * distinct. The kth smallest distinct hash h₍ₖ₎ estimates NDV as
    * (k-1)·2⁴⁸/h₍ₖ₎ (uniform order statistics); groups with fewer than
    * k distinct values degrade gracefully (k = set size). */
  val distinctKmv = Query(
    "q_distinct_kmv",
    s"""WITH hv AS (
       |  SELECT DISTINCT l_returnflag AS flag,
       |    ${duckH48("l_partkey")} AS h
       |  FROM lineitem),
       |rk AS (SELECT flag, h, row_number() OVER (PARTITION BY flag ORDER BY h) AS rn FROM hv),
       |kth AS (SELECT flag, max(h) AS hk, count(*) AS k FROM rk WHERE rn <= $K GROUP BY flag),
       |ex AS (SELECT l_returnflag AS flag, count(DISTINCT l_partkey) AS exact_distinct
       |       FROM lineitem GROUP BY 1)
       |SELECT ex.flag AS l_returnflag, CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
       |  round(CAST(kth.k - 1 AS DOUBLE) * $TwoPow48 / kth.hk, 6) AS kmv_estimate
       |FROM ex JOIN kth ON ex.flag = kth.flag
       |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val li = tbl(s, d, "lineitem")
    val sk = li
      .select(col("l_returnflag"), col("l_partkey"), expr(h48("l_partkey")).as("h"))
      .groupBy("l_returnflag")
      .agg(graft.functions.SketchAggregates.minKDistinct(col("h"), K).as("ks"),
        countDistinct(col("l_partkey")).as("exact_distinct"))
    sk.select(col("l_returnflag"), col("exact_distinct"),
        round((size(col("ks")) - 1).cast(DoubleType) * TwoPow48 /
          element_at(col("ks"), size(col("ks"))), 6).as("kmv_estimate"))
      .orderBy("l_returnflag")
  }

  private val CmsD = 3
  private val CmsW = 1024
  private val CmsP = 2147483647L // 2^31 - 1, prime
  // row-r hash: ((31 + 6r)·x + (17 + 12r)) mod p mod w
  private def cmsCell(r: String, x: String): String =
    s"((cast((31 + 6 * $r) as bigint) * $x + (17 + 12 * $r)) % $CmsP) % $CmsW"

  /** Count-min sketch over order counts per customer: build the d×w
    * sketch in one aggregate pass, probe five fixed customers, and emit
    * estimate next to exact count (CMS always over-estimates; the gap is
    * the collision noise at this w). */
  val sketchCms = Query(
    "q_sketch_cms",
    s"""WITH cells AS (
       |  SELECT r, ${cmsCell("r", "o_custkey")} AS cell, CAST(count(*) AS BIGINT) AS cnt
       |  FROM orders, range(0, $CmsD) t(r)
       |  GROUP BY 1, 2),
       |probes AS (SELECT unnest([1, 2, 3, 4, 5]) AS custkey),
       |pc AS (SELECT custkey, r, ${cmsCell("r", "custkey")} AS cell
       |       FROM probes, range(0, $CmsD) t(r)),
       |est AS (SELECT custkey, min(coalesce(cnt, 0)) AS cms_count
       |        FROM pc LEFT JOIN cells USING (r, cell) GROUP BY custkey),
       |ex AS (SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS exact_count FROM orders GROUP BY 1)
       |SELECT CAST(p.custkey AS BIGINT) AS custkey, coalesce(ex.exact_count, 0) AS exact_count, est.cms_count
       |FROM probes p LEFT JOIN ex USING (custkey) JOIN est USING (custkey)
       |ORDER BY custkey""".stripMargin) { (s, d) =>
    val orders = tbl(s, d, "orders")
    val cells = orders
      .select(col("o_custkey").cast(LongType).as("x"), explode(sequence(lit(0), lit(CmsD - 1))).as("r"))
      .groupBy(col("r"), expr(cmsCell("r", "x")).as("cell"))
      .agg(count(lit(1)).as("cnt"))
    val probes = s.range(1, 6).select(col("id").as("custkey"))
    val pc = probes
      .select(col("custkey"), explode(sequence(lit(0), lit(CmsD - 1))).as("r"))
      .select(col("custkey"), col("r"), expr(cmsCell("r", "custkey")).as("cell"))
    // LEFT join: a probe whose cells are all empty is a correct CMS
    // estimate of 0, not a dropped row
    val est = pc.join(cells, Seq("r", "cell"), "left")
      .groupBy("custkey").agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
    val ex = orders.join(broadcast(probes), orders("o_custkey") === probes("custkey"))
      .groupBy(col("custkey")).agg(count(lit(1)).as("exact_count"))
    probes
      .join(ex, Seq("custkey"), "left")
      .join(est, Seq("custkey"))
      .select(col("custkey"), coalesce(col("exact_count"), lit(0L)).as("exact_count"),
        col("cms_count"))
      .orderBy("custkey")
  }

  /** Log₂-bin quantile sketch (DDSketch family, deterministic): prices
    * as exact integer cents, bucket = bit-length of the cents value —
    * a ~2× relative-error histogram whose state is ≤ ~40 counters per
    * group, fully MERGEABLE (bucket counts just add), which is how a
    * 100 TB percentile actually runs: partial histograms map-side, one
    * tiny final merge, no global sort. The estimate (bucket lower bound
    * 2^(b-1)) sits next to the exact interpolated percentile so the
    * error is auditable. Everything except the exact column is integer. */
  val quantileSketch = Query(
    "q_quantile_sketch",
    """WITH c AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
      |  FROM lineitem),
      |h AS (
      |  SELECT flag, length(bin(cents)) AS b, count(*) AS n
      |  FROM c GROUP BY flag, b),
      |w AS (
      |  SELECT flag, b, n,
      |    sum(n) OVER (PARTITION BY flag ORDER BY b) AS cum,
      |    sum(n) OVER (PARTITION BY flag) AS total
      |  FROM h),
      |pick AS (
      |  SELECT flag, CAST(min(total) AS BIGINT) AS n,
      |    min(CASE WHEN cum >= (total + 1) // 2 THEN b END) AS b50,
      |    min(CASE WHEN cum >= (9 * total + 9) // 10 THEN b END) AS b90
      |  FROM w GROUP BY flag),
      |ex AS (
      |  SELECT flag, round(quantile_cont(cents, 0.5), 6) AS exact_p50,
      |    round(quantile_cont(cents, 0.9), 6) AS exact_p90
      |  FROM c GROUP BY flag)
      |SELECT p.flag AS l_returnflag, p.n,
      |  CAST(2 ** (b50 - 1) AS BIGINT) AS est_p50_cents,
      |  ex.exact_p50 AS exact_p50_cents,
      |  CAST(2 ** (b90 - 1) AS BIGINT) AS est_p90_cents,
      |  ex.exact_p90 AS exact_p90_cents
      |FROM pick p JOIN ex ON p.flag = ex.flag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val c = tbl(s, d, "lineitem")
      .select(col("l_returnflag").as("flag"),
        (dec("l_extendedprice") * 100).cast(LongType).as("cents"))
    val h = c.groupBy(col("flag"), length(bin(col("cents"))).as("b"))
      .agg(count(lit(1)).as("n"))
    val byFlag = Window.partitionBy("flag")
    val w = h
      .withColumn("cum", sum(col("n")).over(byFlag.orderBy("b")))
      .withColumn("total", sum(col("n")).over(byFlag))
    val pick = w.groupBy("flag")
      .agg(min(col("total")).cast(LongType).as("n"),
        min(when(col("cum") >= expr("(total + 1) div 2"), col("b"))).as("b50"),
        min(when(col("cum") >= expr("(9 * total + 9) div 10"), col("b"))).as("b90"))
    val ex = c.groupBy("flag")
      .agg(round(expr("percentile(cents, 0.5)"), 6).as("exact_p50"),
        round(expr("percentile(cents, 0.9)"), 6).as("exact_p90"))
    pick.join(ex, Seq("flag"))
      .select(col("flag").as("l_returnflag"), col("n"),
        expr("shiftleft(cast(1 as bigint), cast(b50 as int) - 1)").as("est_p50_cents"),
        col("exact_p50").as("exact_p50_cents"),
        expr("shiftleft(cast(1 as bigint), cast(b90 as int) - 1)").as("est_p90_cents"),
        col("exact_p90").as("exact_p90_cents"))
      .orderBy("l_returnflag")
  }

  /** KMV MERGEABILITY — the property that makes a sketch distributed:
    * build the min-k sketch independently on two disjoint halves of the
    * data (orderkey parity — stand-in for two executors' partials),
    * merge by union→distinct→sort→take-k, and emit the merged estimate
    * NEXT TO the single-pass estimate. They are provably equal (min-k
    * of a union = min-k of the unions' min-ks), and the oracle checks
    * both paths — this pins the map-side-combine correctness claim the
    * 100 TB posture rests on. */
  val kmvMerge = Query(
    "q_kmv_merge",
    s"""WITH hv AS (
       |  SELECT DISTINCT l_returnflag AS flag, l_orderkey % 2 AS half,
       |    ${duckH48("l_partkey")} AS h
       |  FROM lineitem),
       |rkh AS (SELECT flag, half, h,
       |        row_number() OVER (PARTITION BY flag, half ORDER BY h) AS rn FROM hv),
       |parts AS (SELECT flag, half, h FROM rkh WHERE rn <= $K),
       |mdist AS (SELECT DISTINCT flag, h FROM parts),
       |mrk AS (SELECT flag, h, row_number() OVER (PARTITION BY flag ORDER BY h) AS rn
       |        FROM mdist),
       |mkth AS (SELECT flag, max(h) AS hk, count(*) AS k FROM mrk WHERE rn <= $K GROUP BY flag),
       |sdist AS (SELECT DISTINCT flag, h FROM hv),
       |srk AS (SELECT flag, h, row_number() OVER (PARTITION BY flag ORDER BY h) AS rn
       |        FROM sdist),
       |skth AS (SELECT flag, max(h) AS hk, count(*) AS k FROM srk WHERE rn <= $K GROUP BY flag)
       |SELECT s.flag AS l_returnflag,
       |  round(CAST(s.k - 1 AS DOUBLE) * $TwoPow48 / s.hk, 6) AS kmv_single,
       |  round(CAST(m.k - 1 AS DOUBLE) * $TwoPow48 / m.hk, 6) AS kmv_merged,
       |  CAST(CASE WHEN s.hk = m.hk AND s.k = m.k THEN 1 ELSE 0 END AS BIGINT) AS merge_exact
       |FROM skth s JOIN mkth m ON s.flag = m.flag
       |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val li = tbl(s, d, "lineitem")
      .select(col("l_returnflag").as("flag"), (col("l_orderkey") % 2).as("half"),
        expr(h48("l_partkey")).as("h"))
    val est = (ks: org.apache.spark.sql.Column) =>
      round((size(ks) - 1).cast(DoubleType) * TwoPow48 / element_at(ks, size(ks)), 6)
    val parts = li.groupBy("flag", "half")
      .agg(graft.functions.SketchAggregates.minKDistinct(col("h"), K).as("ks"))
    val merged = parts.groupBy("flag")
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("ks"))))),
        1, K).as("mks"))
    val single = li.groupBy("flag")
      .agg(graft.functions.SketchAggregates.minKDistinct(col("h"), K).as("sks"))
    single.join(merged, Seq("flag"))
      .select(col("flag").as("l_returnflag"),
        est(col("sks")).as("kmv_single"),
        est(col("mks")).as("kmv_merged"),
        when(col("sks") === col("mks"), 1L).otherwise(0L).as("merge_exact"))
      .orderBy("l_returnflag")
  }

  /** Exact heavy hitters via the two-pass Misra-Gries pattern — the way
    * a 100 TB frequency scan finds its hot keys without materializing
    * the key dictionary: pass 1 runs the BOUNDED-state native MG
    * aggregate (graft_heavy_hitter_keys, ≤ 2k longs ×2 per partial
    * buffer, map-side combined) whose candidate set PROVABLY contains
    * every key with frequency > n/K; pass 2 re-counts only the ≤ K
    * broadcast candidates exactly and filters `cnt·K > n` (integer
    * compare, no division). MG's internal counts depend on merge order,
    * so they are never exposed — the candidates-then-recount composite
    * is deterministic and exactly equals the oracle's plain
    * GROUP BY/HAVING. The key is a planted-skew derivation over events
    * (5 hot keys carry a third of the stream; the tail is ~100k keys). */
  val heavyHitters = Query(
    "q_heavy_hitters",
    """WITH e AS (
      |  SELECT CASE WHEN event_id % 3 = 0 THEN event_id % 5
      |              ELSE 1000 + event_id % 100000 END AS key
      |  FROM events),
      |tot AS (SELECT count(*) AS n FROM e)
      |SELECT e.key, CAST(count(*) AS BIGINT) AS cnt
      |FROM e, tot
      |GROUP BY e.key, tot.n
      |HAVING count(*) * 32 > tot.n
      |ORDER BY key""".stripMargin) { (s, d) =>
    val e = tbl(s, d, "events").select(
      when(col("event_id") % 3 === 0, col("event_id") % 5)
        .otherwise(lit(1000) + col("event_id") % 100000).as("key"))
    val cands = e.agg(
      graft.functions.SketchAggregates.heavyHitterKeys(col("key"), 32).as("ks"),
      count(lit(1)).as("n"))
    e.join(broadcast(cands.select(explode(col("ks")).as("key"), col("n"))), "key")
      .groupBy("key", "n")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 32 > col("n"))
      .select(col("key"), col("cnt"))
      .orderBy("key")
  }

  def queries: Seq[Query] =
    Seq(distinctKmv, sketchCms, quantileSketch, kmvMerge, heavyHitters)
}
