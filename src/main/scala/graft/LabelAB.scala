package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Evidence tool (r22b): shuffle economy of the cluster-LABEL BUILD
  * (candidateEdges → connectedComponents) measured directly on the
  * in-memory frames — the ShuffleAudit path can't see it because the
  * warm pass populates the write-once scratch cache and the measured
  * pass reads parquet. Runs the build end-to-end (count of the label
  * frame) under a task-metrics listener; bytes/records are
  * deterministic, so old-vs-new comparisons hold across host drift.
  * `sbt "runMain graft.LabelAB /tmp/graft_sf1"`
  */
object LabelAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sw = new LongAdder; val sr = new LongAdder
    val recs = new LongAdder; val tasks = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          sw.add(m.shuffleWriteMetrics.bytesWritten)
          sr.add(m.shuffleReadMetrics.totalBytesRead)
          recs.add(m.shuffleWriteMetrics.recordsWritten)
          tasks.increment()
        }
      }
    })
    val docs = api.tbl(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val lab = ops.Dedup.connectedComponents(
      docs.select("doc_id"), ops.Dedup.candidateEdges(docs))
    val n = lab.count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // listener bus drain
    println(f"LABEL_BUILD sf=$sfDir rows=$n sec=$sec%.3f " +
      f"shuffle_write_mb=${sw.sum / 1e6}%.3f shuffle_read_mb=${sr.sum / 1e6}%.3f " +
      f"records=${recs.sum} tasks=${tasks.sum}")
    spark.stop()
  }
}
