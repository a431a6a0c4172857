package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries by name at a given sf dir.
  * `sbt "runMain graft.TimeOne /root/testdata/sf0.1 q_dedup_simhash ..."`
  * Runs each query twice (cold, warm) after one warmup query.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q_text_stats")(spark, sfDir).count() catch { case _: Throwable => }
    for (n <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"TIME $n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
    }
    spark.stop()
  }
}
