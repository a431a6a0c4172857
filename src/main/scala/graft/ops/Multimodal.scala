package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Decoded-media metadata row (the stable schema downstream operators
  * partition/filter on, independent of the decoder implementation). */
case class MediaMeta(
    doc_id: Long, n_bytes: Long, width: Int, height: Int,
    channels: Int, format: String)

/** Multimodal-column plumbing (north star): image/audio/video travel as
  * opaque `BinaryType` columns; decode/feature-extract runs as typed
  * per-partition batch work so a real decoder drops in without touching
  * the plan shape.
  *
  * THE DECODER IS A STUB: no media libraries exist in this environment,
  * so `decodeStub` derives deterministic fake dimensions from the byte
  * payload. Everything around it — binary schema, Dataset encoding,
  * mapPartitions batching, downstream partitioning — is real and tested
  * (OperatorSpec), which is exactly the plumbing a production decoder
  * needs.
  *
  * Scale notes: decode is embarrassingly parallel map work; the binary
  * column should be the LAST projected column (parquet stores it fine,
  * but column pruning means metadata-only queries never read the bytes).
  */
object Multimodal {

  /** media(doc_id LONG, media BINARY) → per-item decoded metadata.
    * Swap the body for a real decoder (libjpeg/ffmpeg/...) to go live. */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition batch: a real implementation would init the
        // decoder once here and stream the partition through it.
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong // stub: dims derived from payload size
          MediaMeta(id, n, (n % 640 + 1).toInt, (n * 31 % 480 + 1).toInt, 3, "fake/raw")
        }
      }
      .toDF()
  }
}
