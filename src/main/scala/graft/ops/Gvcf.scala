package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's core computation as a reusable API: combine sparse
  * per-sample interval records (gVCF reference blocks + variant sites)
  * into dense per-position, all-samples rows (SURVEY §2A A4–A7;
  * `GVCFHBase.load` + `VariantCombiner.combine`, `GVCFHBase.java:~110`,
  * citations reconstructed per SURVEY §0).
  *
  * Input schema (FIXTURES.md §2):
  *   variants(sample STRING, contig STRING, start LONG, end LONG,
  *            kind STRING 'site'|'block', alleles ARRAY<STRING>, gq INT)
  *
  * The imperative reference loop (scan in key order, carry each sample's
  * current spanning block, densify at every site) becomes:
  *   sites      = distinct positions where kind = 'site'
  *   coverage   = interval containment join (bucketed — A6) of sites
  *                against every sample's records
  *   combined   = groupBy(position) + ordered collect (A4)
  *
  * Split-invariance (the reference's stride-split correctness property,
  * SURVEY §5.2.3): combineAtSites(splitBlocks(v, w)) == combineAtSites(v)
  * for any stride w — covered by GvcfSpec.
  */
object Gvcf {

  /** A7 — split every record at fixed stride boundaries: one row per
    * crossed `[k*stride, (k+1)*stride)` window, bounds clipped. Sites
    * (start == end) pass through unchanged. */
  def splitBlocks(variants: DataFrame, stride: Long): DataFrame =
    variants
      .withColumn("k", explode(sequence(expr(s"start div $stride"), expr(s"end div $stride"))))
      .withColumn("start", greatest(col("start"), col("k") * stride))
      .withColumn("end", least(col("end"), col("k") * stride + stride - 1))
      .drop("k")

  /** GQ-band block merging (the gVCF banding semantics the reference's
    * storage assumes, per GATK CombineGVCFs): adjacent reference blocks
    * of the same sample/contig that touch (prev.end + 1 == start) and
    * fall in the same GQ band collapse into one block carrying the
    * band-minimum GQ. Gaps-and-islands over the position order; sites
    * pass through untouched. Inverse of [[splitBlocks]] up to banding —
    * merge(split(v)) == merge(v) (GvcfSpec). */
  def mergeAdjacentBlocks(variants: DataFrame): DataFrame = {
    val bandOf = when(col("gq") < 20, 0).when(col("gq") < 60, 1).otherwise(2)
    val w = Window.partitionBy(col("sample"), col("contig")).orderBy(col("start"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blocks = variants.filter(col("kind") === "block").withColumn("band", bandOf)
    val newGrp = when(
      lag(col("end"), 1).over(w).isNull ||
        col("start") =!= lag(col("end"), 1).over(w) + 1 ||
        col("band") =!= lag(col("band"), 1).over(w), 1).otherwise(0)
    val merged = blocks
      .withColumn("grp", sum(newGrp).over(run))
      .groupBy(col("sample"), col("contig"), col("grp"), col("band"))
      .agg(min(col("start")).as("start"), max(col("end")).as("end"),
        first(col("alleles")).as("alleles"), min(col("gq")).as("gq"))
      .withColumn("kind", lit("block"))
      .select("sample", "contig", "start", "end", "kind", "alleles", "gq")
    merged.unionByName(variants.filter(col("kind") === "site"))
  }

  /** A4+A6 — dense combine at every variant site: for each (contig, pos)
    * with at least one site record, emit each sample's state there
    * (its site alleles, or the spanning block's alleles), plus the dense
    * ordered per-sample summary. The interval join is bucketed on the
    * same stride grid as the storage layout, so it is an equi-join +
    * residual — never a nested-loop join (SURVEY §4.2). */
  def combineAtSites(variants: DataFrame, bucketWidth: Long = 64): DataFrame = {
    val sites = variants.filter(col("kind") === "site")
      .select(col("contig"), col("start").as("pos")).distinct()
    // bucket both sides on the stride grid: records explode to the
    // buckets they span, sites map to exactly one bucket.
    val recs = variants
      .withColumn("bkt", explode(sequence(
        expr(s"start div $bucketWidth"), expr(s"end div $bucketWidth"))))
    val probe = sites.withColumn("bkt", expr(s"pos div $bucketWidth"))
    probe.join(recs, Seq("contig", "bkt"))
      .filter(col("pos") >= col("start") && col("pos") <= col("end"))
      .select(col("contig"), col("pos"), col("sample"), col("kind"),
        col("alleles"), col("gq"))
      .groupBy("contig", "pos")
      .agg(
        count(lit(1)).as("n_samples"),
        expr("transform(sort_array(collect_list(struct(sample, kind, alleles, gq))), " +
          "s -> concat(s.sample, ':', s.kind, ':', array_join(s.alleles, '/')))")
          .as("calls"))
      .orderBy("contig", "pos")
  }
}
