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

  test("sessionization agrees between batch islands and streaming session_window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // gaps straddle the 30-min threshold on both sides but avoid the
    // EXACT boundary: batch islands keep a gap of exactly 30:00 in-session
    // (`> gap` splits) while session_window's half-open [start, last+gap)
    // would split it — equal everywhere else.
    val sevs = Seq(
      Ev(ts("2024-01-01 09:00:00"), 1, "click", 1.0),
      Ev(ts("2024-01-01 09:29:59"), 1, "view", 1.0),  // 29:59 → same session
      Ev(ts("2024-01-01 10:05:00"), 1, "click", 1.0), // 35:01 → new session
      Ev(ts("2024-01-01 10:06:00"), 1, "view", 1.0),
      Ev(ts("2024-01-01 09:10:00"), 2, "click", 1.0),
      Ev(ts("2024-01-01 11:00:00"), 2, "view", 1.0))  // 1h50m → new session
    // batch: gaps-and-islands (the q_sessionize expression)
    val byU = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts")
    val run = byU.rowsBetween(Long.MinValue, 0)
    val prevTs = lag($"ts", 1).over(byU)
    val batch = sevs.toDF()
      .withColumn("new_s",
        when(prevTs.isNull || unix_micros($"ts") - unix_micros(prevTs) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum($"new_s").over(run))
      .groupBy("user_id", "sid")
      .agg(min($"ts").as("session_start"), count(lit(1)).as("n"))
      .select("user_id", "session_start", "n")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    // streaming: session_window over the same rows
    val input = MemoryStream[Ev]
    val q = Streaming.sessionCounts(input.toDF(), gap = "30 minutes", delay = "1 minute")
      .writeStream.format("memory").queryName("sess_parity_out")
      .outputMode("complete").start()
    try {
      input.addData(sevs: _*)
      q.processAllAvailable()
      val streamed = spark.table("sess_parity_out")
        .collect().map(r => (r.getLong(2), r.getTimestamp(0).toString, r.getLong(3)))
        .toSet
      assert(streamed == batch,
        s"batch sessions $batch != streaming sessions $streamed")
    } finally q.stop()
  }
}
