package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Subprocess half of the PROCESS-KILL durability drive
  * (KillDurabilitySpec): runs ONE store operation against `storeDir`
  * with a crash-injection seam installed that (a) touches `syncFile`
  * to publish "I am inside the kill window" and (b) blocks forever —
  * the parent then SIGKILLs this JVM. Unlike the in-process crash/race
  * specs (which simulate interleavings through the same seams), the
  * process genuinely dies: file locks release by OS action, buffers
  * never flush, no finally blocks run. The reopened store must satisfy
  * the atomic-rename / manifest-ordering contract with no cooperation
  * from this side.
  *
  * args: storeDir op syncFile
  * ops:  append_pre     — batch append, killed before the manifest append
  *       truncate_pre   — truncate commit, killed before the manifest swap
  *       truncate_post  — truncate commit, killed after swap + retire
  *       compact_pre    — major compaction, killed before the splice
  *       compact_post   — major compaction, killed after the splice,
  *                        before the fold set is retired
  *       minor_pre      — minor compaction, killed before the splice
  */
object KillDriver {

  private val Ddl = "key LONG, ver LONG, payload STRING"

  private def blockAt(syncFile: String): () => Unit = () => {
    java.nio.file.Files.write(java.nio.file.Paths.get(syncFile),
      "in-window\n".getBytes("UTF-8"))
    Thread.sleep(600000) // parent SIGKILLs long before this elapses
  }

  def main(args: Array[String]): Unit = {
    val Array(storeDir, op, syncFile) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def newRows() = (100L until 150L).map(k => (k, 9L, s"new-$k"))
      .toDF("key", "ver", "payload")
      .repartitionByRange(1, col("key")).sortWithinPartitions("key")

    val hook = blockAt(syncFile)
    op match {
      case "append_pre" =>
        CommitSeams.appendPrePublish = hook
        newRows().write.format("graft.sources.VariantStoreSink")
          .option("path", storeDir).mode("append").save()
      case "truncate_pre" =>
        CommitSeams.truncatePrePublish = hook
        newRows().write.format("graft.sources.VariantStoreSink")
          .option("path", storeDir).mode("overwrite").save()
      case "truncate_post" =>
        CommitSeams.truncatePostRetire = hook
        newRows().write.format("graft.sources.VariantStoreSink")
          .option("path", storeDir).mode("overwrite").save()
      case "compact_pre" =>
        VariantStore.compactImpl(spark, storeDir, Ddl, 1, Long.MinValue, hook)
      case "compact_post" =>
        VariantStore.compactImpl(spark, storeDir, Ddl, 1, Long.MinValue,
          () => (), hook)
      case "minor_pre" =>
        VariantStore.compactMinorImpl(spark, storeDir, Ddl, 1, 1, hook)
      case "auto_pre" =>
        // the r19 self-enforcing cadence: four hand-driven streaming
        // epochs of OVERLAPPING keys at threshold 4 — epoch 4's commit
        // triggers the auto-fold, whose pre-splice seam publishes and
        // blocks. The kill lands with epoch 4 already durable (manifest
        // lines + high-water mark precede the fold by construction).
        CommitSeams.autoFoldPreSplice = hook
        val schema = org.apache.spark.sql.types.StructType.fromDDL(Ddl)
        val write = new StoreStreamingWrite(storeDir, schema, "killauto",
          AutoCompactPolicy(enabled = true, threshold = 4, keep = 2))
        for (e <- 1 to 4) {
          val w = StoreMemstoreFactory(storeDir, schema,
            StoreManifest.queryTag("killauto")).createWriter(0, 0L, e)
          (0L until 20L).foreach(k => w.write(
            org.apache.spark.sql.catalyst.InternalRow(k, e.toLong,
              org.apache.spark.unsafe.types.UTF8String.fromString(s"auto-$e-$k"))))
          write.commit(e,
            Array[org.apache.spark.sql.connector.write.WriterCommitMessage](w.commit()))
        }
      case other => sys.error(s"unknown op: $other")
    }
    // unreachable while the seam blocks; a clean exit means the seam
    // never fired — the parent treats missing syncFile as a failure
    spark.stop()
  }
}
