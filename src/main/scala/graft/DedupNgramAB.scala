package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Evidence tool (r22, r21 verdict #4): interleaved same-JVM A/B of
  * q_dedup_ngram's materialization barrier on the two reused K-row
  * frames (candidate pairs, survivor shingle sets):
  *
  *   - `ckpt`    — `localCheckpoint()` (the shipped form): EAGER, runs
  *                 the subtree at build time and pins blocks.
  *   - `none`    — no barrier: each consumer re-plans the subtree;
  *                 ReusedExchange decides how much actually re-runs.
  *   - `persist` — `persist(MEMORY_AND_DISK)`: LAZY block reuse, no
  *                 lineage truncation, no build-time execution.
  *
  * Run at sf0.1 and at the decade corpus (/tmp/graft_sf1) where the
  * signature pipeline actually bites. Results cross-checked equal
  * across variants first (must print diff=0).
  *
  * `sbt "runMain graft.DedupNgramAB [sfDir] [rounds]"`
  */
object DedupNgramAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs: DataFrame = graft.api.tbl(spark, sfDir, "documents")

    val persisted = scala.collection.mutable.ListBuffer[DataFrame]()
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "ckpt" -> (() => graft.ops.Dedup.dedupNgramWith(docs, _.localCheckpoint())),
      "none" -> (() => graft.ops.Dedup.dedupNgramWith(docs, identity)),
      "persist" -> (() => graft.ops.Dedup.dedupNgramWith(docs, df => {
        val p = df.persist(StorageLevel.MEMORY_AND_DISK); persisted += p; p
      })))

    // value cross-check (and a warm-up for every shape)
    val ref = variants.head._2().collect().map(_.toString).toSeq
    for ((name, mk) <- variants.drop(1)) {
      val got = mk().collect().map(_.toString).toSeq
      println(s"DIFF $name vs ckpt = ${if (got == ref) 0 else got.diff(ref).size}")
      persisted.foreach(_.unpersist(true)); persisted.clear()
    }

    for (r <- 1 to rounds; (name, mk) <- variants) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"AB round$r $name%-8s ${sec}%.3f s")
      persisted.foreach(_.unpersist(true)); persisted.clear()
    }
    spark.stop()
  }
}
