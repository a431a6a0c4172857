package graft

import org.apache.spark.sql.functions._

/** Approximate-query operators (HLL++ count-distinct, GK percentile
  * sketch): engine-specific sketches have no DuckDB oracle, so — like
  * the MinHash/SimHash operators (SURVEY §5.2.3) — their contract is
  * accuracy bounds against the exact answer on real data, plus
  * determinism across partitionings (both sketches are merge-based and
  * order-insensitive by construction). */
class ApproxSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct is within its rsd bound on every table key") {
    for ((table, key) <- Seq(("lineitem", "l_partkey"), ("orders", "o_custkey"),
        ("documents", "doc_id"))) {
      val df = graft.api.tbl(spark, sf, table)
      val exact = df.select(countDistinct(col(key))).head.getLong(0)
      val approx = df.select(approx_count_distinct(col(key), 0.02)).head.getLong(0)
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.06, s"$table.$key: approx $approx vs exact $exact (err $err)")
    }
  }

  test("approx_percentile brackets the exact rank within its accuracy") {
    val df = graft.api.tbl(spark, sf, "lineitem")
    val n = df.count()
    for (p <- Seq(0.25, 0.5, 0.9)) {
      val approx = df.select(
        percentile_approx(col("l_extendedprice"), lit(p), lit(1000))).head.getDouble(0)
      // rank of the approximate answer must be within 1/accuracy of p·n
      val rank = df.filter(col("l_extendedprice") <= approx).count()
      assert(math.abs(rank - p * n) <= n / 1000.0 + 1,
        s"p=$p: approx value $approx has rank $rank of $n")
    }
  }

  test("sketches are partitioning-invariant (merge-based determinism)") {
    val df = graft.api.tbl(spark, sf, "orders")
    val a = df.repartition(3).select(approx_count_distinct(col("o_custkey"), 0.02)).head.getLong(0)
    val b = df.repartition(17, col("o_orderkey"))
      .select(approx_count_distinct(col("o_custkey"), 0.02)).head.getLong(0)
    assert(a == b, "HLL sketch result depends on partitioning")
  }
}
