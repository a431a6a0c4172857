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

  /** 48-bit uniform hash from md5 hex (engine-portable: same digest,
    * same first-12-hex-chars window in Spark and DuckDB). */
  private def h48(c: String): String =
    s"cast(conv(substring(md5(cast($c as string)), 1, 12), 16, 10) as bigint)"

  private def duckH48(c: String): String =
    s"""CAST(list_sum(list_transform(range(1, 13), j ->
       |      CAST(strpos('0123456789abcdef', substring(md5(CAST($c AS VARCHAR)), j, 1)) - 1 AS BIGINT)
       |        << (4 * (12 - j)))) AS BIGINT)""".stripMargin

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
       |est AS (SELECT custkey, min(cnt) AS cms_count FROM pc JOIN cells USING (r, cell) GROUP BY custkey),
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
    val est = pc.join(cells, Seq("r", "cell"))
      .groupBy("custkey").agg(min(col("cnt")).as("cms_count"))
    val ex = orders.join(broadcast(probes), orders("o_custkey") === probes("custkey"))
      .groupBy(col("custkey")).agg(count(lit(1)).as("exact_count"))
    probes
      .join(ex, Seq("custkey"), "left")
      .join(est, Seq("custkey"))
      .select(col("custkey"), coalesce(col("exact_count"), lit(0L)).as("exact_count"),
        col("cms_count"))
      .orderBy("custkey")
  }

  def queries: Seq[Query] = Seq(distinctKmv, sketchCms)
}
