package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Epoch-commit idempotency at the driver-commit layer — the property
  * Spark's epoch tracking relies on for exactly-once: a RETRIED epoch
  * commit (same epochId, new task files after a driver failover)
  * replaces exactly its own generation's manifest records, never a
  * neighbor's. In the same package as the sink so the test drives the
  * private commit path directly — forcing a real mid-commit failover
  * through the public API is not deterministic. */
class StoreEpochSpec extends graft.SparkSpec {

  private val schema = StructType.fromDDL("key LONG, ver LONG, payload STRING")

  private def epochFiles(dir: String, epoch: Long, rows: Seq[(Long, Long, String)])
      : WriterCommitMessage = {
    val w = StoreMemstoreFactory(dir, schema).createWriter(0, 0L, epoch)
    rows.foreach { case (k, v, p) =>
      w.write(InternalRow(k, v, UTF8String.fromString(p)))
    }
    w.commit()
  }

  private def manifestFiles(dir: String): Seq[String] =
    StoreManifest.readLines(java.nio.file.Paths.get(dir)).map(StoreManifest.parse(_).file)

  test("re-committed epoch replaces exactly its own generation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_epoch").toString
    val write = new StoreStreamingWrite(dir, schema)
    // epoch 5 commits, epoch 6 commits on top
    val m5a = epochFiles(dir, 5L, Seq((1L, 5L, "a5"), (2L, 5L, "b5")))
    write.commit(5L, Array(m5a))
    val m6 = epochFiles(dir, 6L, Seq((1L, 6L, "a6")))
    write.commit(6L, Array(m6))
    assert(manifestFiles(dir).size == 2)
    // driver failover: epoch 5 re-runs with fresh task files and
    // re-commits. The manifest must hold exactly ONE gen-5 record set
    // (the retry's) and epoch 6 untouched.
    val m5b = epochFiles(dir, 5L, Seq((1L, 5L, "a5"), (2L, 5L, "b5")))
    write.commit(5L, Array(m5b))
    val files = manifestFiles(dir)
    assert(files.size == 2, s"re-commit duplicated or dropped a generation: $files")
    val gen5 = files.filter(_.startsWith("gen-000000005-"))
    assert(gen5.size == 1 && !gen5.contains(
      m5a.asInstanceOf[StoreCommit].file),
      s"re-commit must replace the old gen-5 record: $files")
    assert(files.exists(_.startsWith("gen-000000006-")), s"epoch 6 lost: $files")
    // the re-committed store reads exactly once per key/ver
    val back = VariantStore.readAsOf(spark, dir, "key LONG, ver LONG, payload STRING", 6L)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(back == Map(1L -> "a6", 2L -> "b5"), s"wrong resolved state: $back")
  }
}
