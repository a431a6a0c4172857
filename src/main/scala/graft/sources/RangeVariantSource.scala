package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A custom DataSource V2 source: deterministic synthetic variant rows
  * over a genomic-position key range, with PREDICATE PUSHDOWN on `pos`
  * narrowing the generated range before any row exists — the DSv2
  * analog of the reference's `Scan.withStartRow/withStopRow`
  * (`GVCFHBase.java:~85`, reconstructed per SURVEY §0).
  *
  * Rows are pure arithmetic in `pos` (gq/depth derived by the same
  * Knuth-hash used elsewhere), so a DuckDB `range()` expression
  * reproduces the source exactly — the custom source is oracle-backed
  * like every other operator (q_source_custom).
  *
  * Usage: `spark.read.format("graft.sources.RangeVariantSource")
  *   .option("lo", "0").option("hi", "100000").load()`
  *
  * Scale notes: planInputPartitions splits the range evenly across
  * `partitions` (default 8) — the source scales horizontally like any
  * pre-split region scan, and pushdown means a `pos BETWEEN` query
  * reads only the covered slices.
  */
class RangeVariantSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeVariantSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    {
      val hi = properties.getOrDefault("hi", "1000000").toLong
      // (pos · 2654435761) stays below 2^63 only while pos < ~3.47e9;
      // past that the gq/depth arithmetic would wrap negative and the
      // documented DuckDB range() oracle equivalence breaks
      require(hi <= 3000000000L,
        s"hi must be <= 3e9 (Knuth-hash overflow bound), got $hi")
      new VariantTable(
        properties.getOrDefault("lo", "0").toLong, hi,
        properties.getOrDefault("partitions", "8").toInt)
    }
}

object RangeVariantSource {
  val schema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("gq", LongType, nullable = false),
    StructField("depth", LongType, nullable = false)))
}

private[sources] class VariantTable(lo: Long, hi: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"range_variants[$lo,$hi)"
  override def schema(): StructType = RangeVariantSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VariantScanBuilder(lo, hi, partitions)
}

private[sources] class VariantScanBuilder(var lo: Long, var hi: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownFilters {

  private var pushed: Array[Filter] = Array.empty

  /** Accept pos range predicates by narrowing [lo, hi); everything else
    * stays a post-scan filter (returned as residual). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThanOrEqual("pos", _: Long) | GreaterThan("pos", _: Long) |
           LessThanOrEqual("pos", _: Long) | LessThan("pos", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThanOrEqual("pos", v: Long) => lo = math.max(lo, v)
      // saturating +1: a boundary literal at Long.MaxValue must not wrap
      // (the accepted filter is NOT re-applied by Spark, so an overflow
      // here would silently change results)
      case GreaterThan("pos", v: Long) =>
        lo = if (v == Long.MaxValue) Long.MaxValue else math.max(lo, v + 1)
      case LessThanOrEqual("pos", v: Long) =>
        if (v < Long.MaxValue) hi = math.min(hi, v + 1)
      case LessThan("pos", v: Long) => hi = math.min(hi, v)
      case _ =>
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new VariantScan(lo, math.max(lo, hi), partitions)
}

private[sources] case class VariantRange(start: Long, end: Long) extends InputPartition

private[sources] class VariantScan(lo: Long, hi: Long, partitions: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = RangeVariantSource.schema
  override def description(): String = s"RangeVariantScan[$lo, $hi)"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, math.min(partitions.toLong, hi - lo)).toInt
    val step = (hi - lo + n - 1) / math.max(1, n)
    (0 until n).map { i =>
      VariantRange(lo + i * step, math.min(hi, lo + (i + 1) * step))
    }.filter(r => r.start < r.end).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VariantReaderFactory
}

private[sources] class VariantReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[VariantRange]
    new PartitionReader[InternalRow] {
      private var pos = r.start - 1
      override def next(): Boolean = { pos += 1; pos < r.end }
      override def get(): InternalRow =
        InternalRow(pos, (pos * 2654435761L) % 100, pos % 64)
      override def close(): Unit = ()
    }
  }
}
