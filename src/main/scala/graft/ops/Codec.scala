package graft.ops

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api._

/** One variant record in codec form (the `variants` schema + `gt`). */
final case class VariantRecord(
    sample: String, contig: String, start: Long, end: Long,
    kind: String, alleles: Seq[String], gq: Int, gt: String)

/** Key columns + opaque payload — the cell shape a byte-oriented store
  * holds: row key (contig, start), column qualifier (sample), value. */
final case class EncodedVariant(
    contig: String, start: Long, sample: String, payload: Array[Byte])

/** Pluggable record ↔ `byte[]` payload codec — the analog of the
  * reference's `HBaseVariantEncoder` abstraction (SURVEY §1.1: variant
  * record ↔ HBase cell value). Implementations must satisfy the
  * round-trip law `decode(encode(r)) == r` (CodecSpec, ScalaCheck). */
trait VariantCodec extends Serializable {
  def encode(r: VariantRecord): Array[Byte]
  def decode(b: Array[Byte]): VariantRecord

  /** variants DataFrame → (contig, start, sample, payload BINARY).
    * Typed per-row map work — embarrassingly parallel, no shuffle. */
  def encodeDf(df: DataFrame): DataFrame = {
    val s = df.sparkSession; import s.implicits._
    df.select("sample", "contig", "start", "end", "kind", "alleles", "gq", "gt")
      .as[VariantRecord]
      .map(r => EncodedVariant(r.contig, r.start, r.sample, encode(r)))
      .toDF()
  }

  /** Inverse of [[encodeDf]], plus the payload size (`payload_len`) so
    * storage-cost queries never re-read the bytes. */
  def decodeDf(df: DataFrame): DataFrame = {
    val s = df.sparkSession; import s.implicits._
    df.select("contig", "start", "sample", "payload")
      .as[EncodedVariant]
      .map { e =>
        val r = decode(e.payload)
        (r.sample, r.contig, r.start, r.end, r.kind, r.alleles, r.gq, r.gt,
          e.payload.length.toLong)
      }
      .toDF("sample", "contig", "start", "end", "kind", "alleles", "gq", "gt",
        "payload_len")
  }
}

/** Fixed-layout big-endian binary: a 29-byte header
  * `[start:8][end:8][gq:4][kind:1][sampleLen:2][contigLen:2][gtLen:2][nAlleles:2]`
  * followed by the UTF-8 string bytes and `[len:2][bytes]` per allele.
  * Null strings carry length -1. Deterministic byte-for-byte, so payload
  * sizes are pure arithmetic over field lengths — which is exactly what
  * the q_codec_roundtrip oracle recomputes. */
object FixedLayoutCodec extends VariantCodec {
  private val HeaderLen = 29

  private def utf8(s: String): Array[Byte] =
    if (s == null) Array.emptyByteArray else s.getBytes(UTF_8)

  /** Field length as a short, failing FAST on overflow: a silent
    * toShort wrap would write a negative length while appending all the
    * bytes — decode would then read every later field from misaligned
    * garbage with no error. */
  private def shortLen(n: Int, what: String): Short = {
    require(n <= Short.MaxValue, s"$what exceeds ${Short.MaxValue} bytes ($n)")
    n.toShort
  }

  override def encode(r: VariantRecord): Array[Byte] = {
    val sample = utf8(r.sample); val contig = utf8(r.contig); val gt = utf8(r.gt)
    val alleles = r.alleles.map(utf8)
    val buf = ByteBuffer.allocate(HeaderLen + sample.length + contig.length +
      gt.length + alleles.map(_.length + 2).sum)
    buf.putLong(r.start).putLong(r.end).putInt(r.gq)
      .put(if (r.kind == "site") 1.toByte else 0.toByte)
      .putShort(if (r.sample == null) -1 else shortLen(sample.length, "sample"))
      .putShort(if (r.contig == null) -1 else shortLen(contig.length, "contig"))
      .putShort(if (r.gt == null) -1 else shortLen(gt.length, "gt"))
      .putShort(shortLen(r.alleles.size, "allele count"))
    buf.put(sample).put(contig).put(gt)
    // null alleles carry the same -1 marker as the header strings, so
    // decode(encode(r)) == r holds for them too (round-trip law)
    r.alleles.zip(alleles).foreach { case (orig, a) =>
      buf.putShort(if (orig == null) -1 else shortLen(a.length, "allele"))
      buf.put(a)
    }
    buf.array()
  }

  override def decode(b: Array[Byte]): VariantRecord = {
    val buf = ByteBuffer.wrap(b)
    val start = buf.getLong(); val end = buf.getLong(); val gq = buf.getInt()
    val kind = if (buf.get() == 1) "site" else "block"
    val sampleLen = buf.getShort(); val contigLen = buf.getShort()
    val gtLen = buf.getShort(); val nAlleles = buf.getShort()
    def str(len: Short): String =
      if (len < 0) null
      else { val a = new Array[Byte](len); buf.get(a); new String(a, UTF_8) }
    val sample = str(sampleLen); val contig = str(contigLen); val gt = str(gtLen)
    val alleles = Seq.fill(nAlleles.toInt)(str(buf.getShort()))
    VariantRecord(sample, contig, start, end, kind, alleles, gq, gt)
  }
}

object Codec {

  /** Encode the synthetic cohort, decode it back, and aggregate every
    * decoded field plus the payload byte size. The oracle recomputes the
    * aggregates from the cohort directly AND derives payload_len from
    * the fixed layout's size formula — a hash match proves both the
    * round trip (field-lossless) and the declared byte layout. */
  val codecRoundtrip = Query(
    "q_codec_roundtrip",
    s"""WITH ${Gvcf.duckSyntheticV},
       |sized AS (
       |  SELECT contig, kind, vstart, vend, gq, gt,
       |    CASE WHEN kind = 'site' THEN length(ref) + length(alt) ELSE length(ref) END AS allele_chars,
       |    29 + length(sample) + length(contig) + length(gt) +
       |      CASE WHEN kind = 'site' THEN 4 + length(ref) + length(alt)
       |           ELSE 2 + length(ref) END AS plen
       |  FROM v)
       |SELECT contig, kind, count(*) AS n,
       |  CAST(sum(vstart) AS BIGINT) AS sum_start,
       |  CAST(sum(vend) AS BIGINT) AS sum_end,
       |  CAST(sum(gq) AS BIGINT) AS sum_gq,
       |  CAST(count(DISTINCT gt) AS BIGINT) AS n_gts,
       |  CAST(sum(allele_chars) AS BIGINT) AS sum_allele_chars,
       |  CAST(sum(plen) AS BIGINT) AS sum_payload_bytes
       |FROM sized
       |GROUP BY contig, kind
       |ORDER BY contig, kind""".stripMargin) { (s, d) =>
    val dec = FixedLayoutCodec.decodeDf(
      FixedLayoutCodec.encodeDf(Gvcf.syntheticVariants(s, Gvcf.cohortN(s, d))))
    dec.groupBy("contig", "kind")
      .agg(
        count(lit(1)).as("n"),
        sum(col("start")).cast(LongType).as("sum_start"),
        sum(col("end")).cast(LongType).as("sum_end"),
        sum(col("gq")).cast(LongType).as("sum_gq"),
        countDistinct(col("gt")).cast(LongType).as("n_gts"),
        sum(aggregate(col("alleles"), lit(0), (acc, a) => acc + length(a)))
          .cast(LongType).as("sum_allele_chars"),
        sum(col("payload_len")).cast(LongType).as("sum_payload_bytes"))
      .orderBy("contig", "kind")
  }

  val queries: Seq[Query] = Seq(codecRoundtrip)
}
