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

  private def manifest(path: String): Seq[ManifestEntry] =
    StoreManifest.readLines(java.nio.file.Paths.get(path)).map(StoreManifest.parse)

  /** Scan `[lo, hi]` by key: manifest-pruned file list + residual filter. */
  def readRange(spark: SparkSession, path: String, schema: String,
      lo: Long, hi: Long): DataFrame = {
    val keyCol = schema.trim.split("\\s+")(0)
    val files = manifest(path)
      .filter(e => e.maxKey >= lo && e.minKey <= hi)
      .map(e => s"$path/${e.file}")
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    else spark.read.schema(schema).csv(files: _*)
      .filter(col(keyCol) >= lo && col(keyCol) <= hi)
  }

  /** As-of-timestamp read — the HBase versioned-cell analog
    * (`maxVersions > 1` + timerange scans, `GVCFHBaseTest.java:~40`,
    * reconstructed per SURVEY §0). The store holds every written
    * version of a key (append-mode generations carry a `ver` LONG as
    * the SECOND schema field); `readAsOf` reconstructs "the table as of
    * t": per key, the highest-`ver` row with `ver <= asOf`, i.e. HBase's
    * latest-cell-at-timerange-end semantics. Rows whose every version is
    * newer than `asOf` are absent, exactly like a cell first written
    * after t.
    *
    * Scale: one window exchange on the key — the generations are each
    * range-partitioned and sorted by key, so at 100 TB this is the
    * standard versioned-read shuffle (HBase pays the same merge across
    * HFiles per region, just region-locally). The manifest carries each
    * file's `ver` range (r9), so files whose EVERY version is newer than
    * `asOf` are skipped before any I/O — the HFile time-range prune; a
    * residual `ver <= asOf` scan filter keeps exactness inside
    * partially-newer files. */
  def readAsOf(spark: SparkSession, path: String, schema: String,
      asOf: Long): DataFrame = {
    val cols = schema.trim.split(",").map(_.trim.split("\\s+")(0))
    require(cols.length >= 2 && cols(1) == "ver",
      s"versioned schema needs (key, ver, ...): got ${schema}")
    val keyCol = cols(0)
    val files = asOfFiles(path, asOf)
    if (files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    // ver desc + every remaining column desc: duplicate (key, ver) rows
    // are legal (neither writer rejects an equal-key re-put), and a
    // ver-only ordering would let partition/scan order pick the winner —
    // the nondeterminism this repo bans everywhere else. The full-row
    // order makes the resolved snapshot a pure function of store CONTENT.
    val tiebreak = cols.drop(2).map(col(_).desc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("ver").desc +: tiebreak: _*)
    spark.read.schema(schema).csv(files: _*)
      .filter(col("ver") <= asOf)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The file list an as-of-`t` read touches: manifest entries whose
    * `ver` range starts at or before `t`. Package-visible so the spec
    * can assert the time-range prune without scanning anything. */
  private[graft] def asOfFiles(path: String, asOf: Long): Seq[String] =
    manifest(path).filter(_.minVer <= asOf).map(e => s"$path/${e.file}")

  /** Rewrite every live generation as one sorted bulk generation. The
    * input file list comes from the manifest (never a directory listing),
    * so orphans from failed tasks are excluded by construction. */
  def compact(spark: SparkSession, path: String, schema: String,
      numRanges: Int = 8): Unit = {
    val keyCol = schema.trim.split("\\s+")(0)
    val files = manifest(path).map(e => s"$path/${e.file}")
    require(files.nonEmpty, s"nothing to compact: no manifest at $path")
    spark.read.schema(schema).csv(files: _*)
      .repartitionByRange(numRanges, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.format("graft.sources.VariantStoreSink")
      .option("path", path).mode("overwrite").save()
  }
}
