package graft

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence tool (r21): the latestPerKey rewrite's claim is that the
  * max_by aggregate ships ONE winner per cell through the exchange
  * while the old Window(row_number) shape shipped EVERY version of
  * every cell — a claim the driver fixtures (1–3 versions/key) cannot
  * exhibit. This probe builds a DEEP store — `keys` keys × `vers`
  * versions per key in one bulk generation — and A/Bs the two
  * resolution shapes over the same scan, interleaved, with shuffle
  * bytes/records from task metrics.
  * `sbt "runMain graft.StoreDepthAB [keys] [vers]"` (default 20000 × 100) */
object StoreDepthAB {
  def main(args: Array[String]): Unit = {
    val keys = if (args.length > 0) args(0).toLong else 20000L
    val vers = if (args.length > 1) args(1).toLong else 100L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sw = new LongAdder; val rec = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          sw.add(m.shuffleWriteMetrics.bytesWritten)
          rec.add(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    val dir = java.nio.file.Files.createTempDirectory("graft_depth_ab").toString
    val schema = "key LONG, ver LONG, payload STRING"
    spark.range(0, keys * vers, 1, 32).selectExpr(
        "id % " + keys + " AS key",
        "id DIV " + keys + " AS ver",
        "concat('p', id % 7) AS payload")
      .repartitionByRange(8, col("key")).sortWithinPartitions("key")
      .write.format("graft.sources.VariantStoreSink")
      .option("path", dir).mode("overwrite").save()
    // the OLD resolution shape, verbatim from the pre-r21 latestPerKey
    def windowRead() = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("ver").desc, col("payload").desc)
      spark.read.schema(schema)
        .parquet(graft.sources.VariantStore.rangeFiles(dir,
          Long.MinValue, Long.MaxValue): _*)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
        .agg(count(lit(1)), sum(col("ver")), sum(col("key")))
    }
    // the SHIPPED resolution (max_by aggregate inside readRange)
    def aggRead() =
      graft.sources.VariantStore.readRange(spark, dir, schema,
          Long.MinValue, Long.MaxValue)
        .agg(count(lit(1)), sum(col("ver")), sum(col("key")))
    def run(label: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      sw.reset(); rec.reset()
      val t0 = System.nanoTime()
      val r = df.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"$label: $wall%.3f s shuffle_write=${sw.sum / 1e6}%.1f MB " +
        f"records=${rec.sum}  result=${r.mkString}")
    }
    println(s"store: $keys keys x $vers versions = ${keys * vers} rows")
    for (i <- 1 to 2) {
      run(s"window run$i", windowRead())
      run(s"max_by run$i", aggRead())
    }
    spark.stop()
  }
}
