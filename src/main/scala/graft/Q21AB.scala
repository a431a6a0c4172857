package graft

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.tbl

/** Evidence tool (r21): same-host A/B of the r20 q_tpch_q21 shape
  * (semi+anti join pair — three lineitem-scale probes) vs the r21
  * one-pass aggregate rewrite, at an arbitrary sf dir (use the decade
  * corpus to see the broadcast-stops-flipping regime). Prints wall
  * seconds and shuffle bytes/records for each variant, twice each,
  * interleaved so host drift cannot masquerade as a win.
  * `sbt "runMain graft.Q21AB /tmp/graft_sf1"` */
object Q21AB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sw = new LongAdder; val sr = new LongAdder; val rec = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          sw.add(m.shuffleWriteMetrics.bytesWritten)
          sr.add(m.shuffleReadMetrics.totalBytesRead)
          rec.add(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    def oldQ21(s: SparkSession, d: String) = {
      val ordersF = tbl(s, d, "orders")
        .filter(col("o_orderstatus") === "F").select("o_orderkey", "o_orderdate")
      val lateAll = tbl(s, d, "lineitem")
        .join(ordersF, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
      val supRegion = tbl(s, d, "supplier")
        .join(broadcast(tbl(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(tbl(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name")
      val others = tbl(s, d, "lineitem")
        .select(col("l_orderkey").as("o2_key"), col("l_suppkey").as("o2_supp"))
      val lateOthers = lateAll
        .select(col("l_orderkey").as("o3_key"), col("l_suppkey").as("o3_supp"))
      lateAll
        .join(supRegion, col("l_suppkey") === col("s_suppkey"))
        .join(others,
          col("l_orderkey") === col("o2_key") && col("o2_supp") =!= col("l_suppkey"),
          "left_semi")
        .join(lateOthers,
          col("l_orderkey") === col("o3_key") && col("o3_supp") =!= col("l_suppkey"),
          "left_anti")
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(20)
    }
    def run(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      sw.reset(); sr.reset(); rec.reset()
      val t0 = System.nanoTime()
      val rows = df.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"$label: $wall%.3f s shuffle_write=${sw.sum / 1e6}%.1f MB " +
        f"read=${sr.sum / 1e6}%.1f MB records=${rec.sum}  rows=${rows.length} " +
        s"head=${rows.take(2).mkString(";")}")
    }
    for (i <- 1 to 2) {
      run(s"old run$i", oldQ21(spark, sfDir))
      run(s"new run$i", SparkEntry.queries("q_tpch_q21")(spark, sfDir))
    }
    spark.stop()
  }
}
