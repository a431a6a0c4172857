package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Streaming

/** Batch ↔ streaming parity: the same window expressions must produce
  * the same final counts whether the events arrive as a table or as a
  * stream (Spark's unified-model contract, SURVEY §2C). */
class ParitySpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val evs = Seq(
    Ev(ts("2024-01-01 10:05:00"), 1, "click", 1.0),
    Ev(ts("2024-01-01 10:40:00"), 2, "view", 2.0),
    Ev(ts("2024-01-01 11:10:00"), 1, "click", 3.0),
    Ev(ts("2024-01-01 12:55:00"), 3, "purchase", 4.0))

  test("sliding-window counts agree between batch and streaming") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val batchDf = evs.toDF()
    val batch = batchDf
      .groupBy(window($"ts", "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("window_start"), $"n")
      .orderBy("window_start")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq

    val input = MemoryStream[Ev]
    val q = Streaming.slidingCounts(input.toDF())
      .writeStream.format("memory").queryName("parity_out")
      .outputMode("complete").start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      val streamed = spark.table("parity_out").orderBy("window_start")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}
