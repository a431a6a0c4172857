package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read-side + maintenance API over a [[VariantStoreSink]] directory —
  * the half of the store contract the `_MANIFEST` exists for:
  *
  *   readRange — an HBase-scan analog: consult the manifest's per-file
  *               (minKey, maxKey) and hand Spark ONLY the files whose
  *               range overlaps the scan — file-level region pruning
  *               before any I/O, the same move as the reference's
  *               row-key-range scans (SURVEY §3.2). A residual filter
  *               keeps exactness inside partially-overlapping files.
  *   compact   — the LSM step that closes the loop with the streaming
  *               (memstore) path: fold ALL current generations through
  *               one `repartitionByRange + sortWithinPartitions` pass
  *               back into the batch bulk-load layout (one sorted
  *               generation, fresh manifest).
  *
  * The manifest is tiny (one line per file) — reading it is driver-side
  * metadata work, exactly like fetching the region index. */
object VariantStore {

  private def manifest(path: String): Seq[(String, Long, Long, Long)] =
    StoreManifest.readLines(java.nio.file.Paths.get(path)).map(StoreManifest.parse)

  /** Scan `[lo, hi]` by key: manifest-pruned file list + residual filter. */
  def readRange(spark: SparkSession, path: String, schema: String,
      lo: Long, hi: Long): DataFrame = {
    val keyCol = schema.trim.split("\\s+")(0)
    val files = manifest(path)
      .filter { case (_, _, mn, mx) => mx >= lo && mn <= hi }
      .map { case (f, _, _, _) => s"$path/$f" }
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    else spark.read.schema(schema).csv(files: _*)
      .filter(col(keyCol) >= lo && col(keyCol) <= hi)
  }

  /** Rewrite every live generation as one sorted bulk generation. The
    * input file list comes from the manifest (never a directory listing),
    * so orphans from failed tasks are excluded by construction. */
  def compact(spark: SparkSession, path: String, schema: String,
      numRanges: Int = 8): Unit = {
    val keyCol = schema.trim.split("\\s+")(0)
    val files = manifest(path).map { case (f, _, _, _) => s"$path/$f" }
    require(files.nonEmpty, s"nothing to compact: no manifest at $path")
    spark.read.schema(schema).csv(files: _*)
      .repartitionByRange(numRanges, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.format("graft.sources.VariantStoreSink")
      .option("path", path).mode("overwrite").save()
  }
}
