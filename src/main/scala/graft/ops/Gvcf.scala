package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api._

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
        // NOT group-constant: touching same-band blocks can carry
        // different ref bases, and the merged block takes the ref at its
        // START (gVCF convention). min_by on the unique in-group start is
        // deterministic — never first(), which is flagged
        // non-deterministic and poisons plan canonicalization / exchange
        // reuse (see mergedSiteAgg doc).
        expr("min_by(alleles, start)").as("alleles"), min(col("gq")).as("gq"))
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
  /** Shared bucketed site-coverage join (A6 grid): one row per
    * (site, covering record). PRECONDITION (a gVCF file invariant): a
    * sample's records do not overlap each other — exactly one covering
    * record per (site, covered sample). Overlapping per-sample records
    * (corrupt input) duplicate that sample's coverage row, and the
    * consumers deliberately differ in how they degrade: combineSites /
    * genotypeGvcf render the sample twice and over-count n_samples
    * (visible, greppable damage in the output), while exportLines
    * dedups to the max-GQ record first — NOT for extra correctness,
    * but because its map build would otherwise ABORT the whole export
    * under mapKeyDedupPolicy=EXCEPTION, turning one corrupt sample
    * into a dead 100 TB job. Validate-at-ingest is the real fix. */
  private def siteCoverage(v: DataFrame, bucketWidth: Long): DataFrame = {
    val sites = v.filter(col("kind") === "site")
      .select(col("contig"), col("start").as("pos")).distinct()
    // bucket both sides on the stride grid: records explode to the
    // buckets they span, sites map to exactly one bucket.
    val recs = v.withColumn("bkt", explode(sequence(
      expr(s"start div $bucketWidth"), expr(s"end div $bucketWidth"))))
    val probe = sites.withColumn("bkt", expr(s"pos div $bucketWidth"))
    probe.join(recs, Seq("contig", "bkt"))
      .filter(col("pos") >= col("start") && col("pos") <= col("end"))
  }

  def combineAtSites(variants: DataFrame, bucketWidth: Long = 64): DataFrame = {
    siteCoverage(variants, bucketWidth)
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

  /** The reference's SampleNameIndex analog (SURVEY §1.1: dense sample →
    * column-qualifier int mapping), built FROM the data: position in the
    * sorted distinct sample names, 0-based. The distinct-sample set is
    * tiny (cohort size), so this collapses to one metadata-scale
    * aggregate row — sort + posexplode — rather than a global window,
    * which would force a single-partition WindowExec over the exchange. */
  def sampleNameIndex(variants: DataFrame): DataFrame =
    variants.select("sample").distinct()
      .agg(sort_array(collect_list(col("sample"))).as("ss"))
      .select(posexplode(col("ss")).as(Seq("sample_idx", "sample")))
      .select(col("sample"), col("sample_idx").cast(LongType))

  /** A4 completed (r2 verdict item 3) — the MERGED site record with GATK
    * CombineGVCFs semantics, not just densified per-sample states:
    *   ref  — the site records' reference allele;
    *   alt  — sorted distinct union of every sample's concrete alts,
    *          with `<NON_REF>` kept as the trailing symbolic allele;
    *   calls — every covered sample's genotype REMAPPED to indices in
    *          the merged allele list (a sample's local allele j resolves
    *          through its own `alleles` array — or `<NON_REF>` past its
    *          end — then to the merged index; block-covered samples stay
    *          0/0 with their block GQ), ordered by [[sampleNameIndex]].
    * Input may carry a `gt` column (the [[Vcf]] parser emits one); the
    * legacy fixture schema without it defaults to het 0/1 sites and 0/0
    * blocks. Same bucketed interval join as [[combineAtSites]] — one
    * equi-join + residual, never a nested loop. */
  /** The per-sample half of [[combineSites]], exposed for downstream
    * QC operators (Mendelian checks, concordance): one row per
    * (site, covered sample) with the merged ref/alts and the sample's
    * genotype REMAPPED to merged allele indices. */
  def combinedCalls(variants: DataFrame, bucketWidth: Long = 64): DataFrame = {
    val v = if (variants.columns.contains("gt")) variants
      else variants.withColumn("gt",
        when(col("kind") === "site", lit("0/1")).otherwise(lit("0/0")))
    val cov = siteCoverage(v, bucketWidth)
      .select("contig", "pos", "sample", "kind", "alleles", "gq", "gt")
    // Merged ref/alts as whole-partition WINDOW aggregates over the one
    // shuffled copy of the coverage rows (r14 rework): the previous
    // shape aggregated a SECOND copy of `cov` (groupBy site → merged)
    // and merge-joined it back, so the coverage subtree — the
    // corpus-scale stage: record scan, bucket explode, site probe
    // join — was computed twice and both join sides paid a sort. One
    // hash exchange on the site key now feeds the window, the remap,
    // and every downstream per-site aggregate (same-key groupBy adds
    // no exchange). Block rows contribute NULL to the site-only
    // min/collect (skipped by both), and array_sort makes the alts
    // union independent of the window's intra-partition row order. */
    // try_cast + range guards: a malformed GT token ('A', '', '-1')
    // degrades to the missing call '.' instead of aborting a 100 TB
    // combine under ANSI — same skip-bad-records posture as the parser.
    // graft_remap_gt (r22) = the former split/transform/array_position
    // CASE chain as ONE codegen-native pass (the HOF transform evaluated
    // interpreted on every coverage row); GvcfKernels.remapGt documents
    // the replicated expression verbatim and GvcfExprSpec pins token-level
    // equality including the malformed-token corners.
    val remapped = graft.functions.GvcfExpressions.remapGt(
      col("gt"), col("kind"), col("alleles"), col("alts"), Vcf.NonRef)
    val w = Window.partitionBy("contig", "pos")
    // one select, not chained withColumn: both window aggregates land in
    // a single WindowExec pass over the shared sort
    cov
      .select(cov.columns.map(col) :+
        min(when(col("kind") === "site", element_at(col("alleles"), 1))).over(w)
          .as("ref") :+
        // collect_SET, not collect_list: the window aggregate's buffer
        // dedups the alt slices as it goes, so the per-ROW projection
        // wrapping the shared window value (sorted-distinct-flatten —
        // WindowExec evaluates the frame once per partition but the
        // projection above it once per row) runs over the handful of
        // DISTINCT allele lists a site carries, not one entry per
        // covered sample. With collect_list it was O(samples²) work per
        // site — 37 s of task time on the 3,000-sample wide cohort at
        // sf0.1, ×100 at a 30,000-sample cohort — for a value that is
        // O(distinct alts). Set iteration order is arbitrary, but the
        // canonical sort inside graft_merged_alts (r22: the former
        // concat(array_sort(array_distinct(flatten(…))), [NON_REF]) HOF
        // chain as one codegen-native pass) keeps the output unchanged.
        graft.functions.GvcfExpressions.mergedAlts(collect_set(
            when(col("kind") === "site",
              expr("slice(alleles, 2, greatest(size(alleles) - 1, 0))"))).over(w),
          Vcf.NonRef).as("alts"): _*)
      .join(broadcast(sampleNameIndex(v)), "sample")
      .withColumn("gtm", remapped)
  }

  /** THE per-site merged-header aggregate, shared by every rollup of
    * [[combinedCalls]]-shaped rows (combineSites, genotypeGvcf's final
    * aggregate, exportLines): group by (contig, pos), carry the
    * group-constant merged ref and comma-joined alt list — max(), NOT
    * first(): first() is flagged non-deterministic, which poisons plan
    * canonicalization / exchange reuse — plus the covered-sample count.
    * Caller-specific aggregates ride along, so the determinism rule
    * lives in exactly one place. */
  private def mergedSiteAgg(df: DataFrame, extra: Column*): DataFrame =
    df.groupBy("contig", "pos")
      .agg(max(col("ref")).as("ref"),
        (array_join(max(col("alts")), ",").as("alt") +:
          count(lit(1)).as("n_samples") +: extra): _*)

  def combineSites(variants: DataFrame, bucketWidth: Long = 64): DataFrame =
    mergedSiteAgg(combinedCalls(variants, bucketWidth),
      // graft_sorted_call_vals = transform(sort_array(...), s -> s.c) as
      // one primitive kernel (r22: the HOF pair ran interpreted with a
      // boxed struct comparator per element)
      graft.functions.GvcfExpressions.sortedCallVals(
        expr("collect_list(struct(sample_idx AS i, " +
          "concat(sample, ':', coalesce(gtm, './.'), ':', " +
          "coalesce(CAST(gq AS STRING), '.')) AS c))"))
        .as("calls"))
      .orderBy("contig", "pos")

  // --------------------------------------------------------------------
  // Dense → long-format combine handoff (SCALE.md r17g, enforced in code
  // r18): the dense per-site calls row is O(cohort width) — linear and
  // spill-safe to ~300k samples (memory floor ∝ width), then GC-bound
  // (~1.4 width exponent at 1M samples, CENTURY_PROBE_334x). Past the
  // handoff the SAME combine semantics are served in LONG format — one
  // O(1) row per (site, covered sample) — which has no per-row width
  // term at any cohort size. [[combineAuto]] makes the handoff an
  // admission rule a planner enforces from table metadata BEFORE any
  // execution, not a prose contract.
  // --------------------------------------------------------------------

  /** Column-metadata key carrying the declared cohort width on the
    * `sample` column. Spark column metadata round-trips through parquet,
    * so a store-written cohort keeps its declared width across reads —
    * the 100 TB planner's "table metadata" in local form. */
  val CohortWidthKey = "graft.cohortWidth"

  /** The measured dense-combine admission CAP (SCALE.md r17g): dense
    * is linear and spill-safe to ~300k samples; past it, per-site rows
    * reach 20–30 MB and wall time goes GC-bound (~1.4 width exponent at
    * 1M samples) — no amount of heap buys the cap back. The effective
    * bound on a given JVM is [[derivedMaxDenseWidth]], which can only
    * be SMALLER. */
  val MaxDenseWidth = 300000L

  /** Measured per-sample heap coefficient of the dense combine, per
    * concurrent slot (SCALE.md r17e): at 300k samples the combine OOMs
    * in a 4.8 GB heap and runs green in 9.6 GB on 32 slots —
    * 9.6 GB / 32 / 300k ≈ 1 KiB per sample per slot, measured under
    * the audit's starved `spark.memory.fraction = 0.15`, so a default-
    * fraction JVM keeps ≥ 4× execution-memory headroom on top. */
  val BytesPerSampleSlot = 1024L

  /** Sentinel default for the `maxDenseWidth` parameters: derive the
    * bound from the running JVM via [[defaultMaxDenseWidth]]. */
  val DeriveFromHeap = -1L

  /** The heap-aware dense admission bound (r19, verdict item 5): the
    * r18 constant encoded "~9.6 GB floor at local[32]" — on a smaller
    * executor the safe dense width is proportionally smaller, and a
    * constant rule silently mis-admits. `heap / slots /
    * [[BytesPerSampleSlot]]` gives every admitted cohort at least the
    * measured-green per-sample budget whatever the JVM, capped at
    * [[MaxDenseWidth]] (the GC-bound wall-time law is heap-independent).
    * The r17e brackets anchor it: the 4.8 GB OOM heap derives 153,600
    * (refuses the 300k cohort that OOM'd there), the 9.6 GB green heap
    * derives the full 300,000 (admits exactly the measured green
    * point). */
  def derivedMaxDenseWidth(heapBytes: Long, slots: Int): Long = {
    require(heapBytes > 0 && slots >= 1,
      s"bad derivation inputs: heap=$heapBytes slots=$slots")
    math.min(MaxDenseWidth, heapBytes / slots / BytesPerSampleSlot)
  }

  /** [[derivedMaxDenseWidth]] for THIS JVM: driver heap over the
    * session's concurrent slot count (local mode runs every task inside
    * this heap; a cluster submitter should size from executor memory —
    * same formula, the executor's numbers). */
  def defaultMaxDenseWidth(spark: SparkSession): Long =
    derivedMaxDenseWidth(Runtime.getRuntime.maxMemory,
      spark.sparkContext.defaultParallelism)

  /** Declare the cohort width on `sample`'s column metadata (writers
    * that know their cohort call this; [[syntheticVariantsWide]] does).
    *
    * CONTRACT: the declared width is an UPPER BOUND on the cohort's
    * distinct samples — the same trust model as catalog table
    * statistics (a CBO broadcasts on declared sizes; stale stats
    * mis-plan). Spark propagates column metadata through
    * width-changing transformations it knows nothing about, so a
    * transformation that can GROW the cohort (a union of cohorts, an
    * append of new samples) must re-declare — [[mergeCohorts]] is the
    * blessed union and sums the bounds. The upper-bound direction is
    * the safe one: over-declaring can only route a dense-eligible
    * cohort to the long format (a performance pessimization with
    * identical results), never a too-wide cohort to the dense path
    * (the GC-death mis-route the admission rule exists to prevent).
    * Filters keep the stale larger bound — conservative, same
    * direction. */
  def annotateWidth(variants: DataFrame, width: Long): DataFrame = {
    // preserve any pre-existing column metadata (e.g. round-tripped from
    // a parquet/store read) — only the width key is (re)declared
    val existing = variants.schema.find(_.name == "sample")
      .map(_.metadata).getOrElse(Metadata.empty)
    val md = new MetadataBuilder().withMetadata(existing)
      .putLong(CohortWidthKey, width).build()
    variants.withColumn("sample", col("sample").as("sample", md))
  }

  /** Union two cohorts PRESERVING the admission contract: the result
    * declares the SUM of the inputs' widths — an upper bound on the
    * union's distinct samples whatever the overlap, so the dispatch
    * stays fail-safe (see [[annotateWidth]]'s contract). A bare
    * `unionByName` would silently keep ONE side's declaration and could
    * admit a 2×-wider cohort to the dense path. Un-annotated inputs
    * fall back to their measured width (one metadata-scale aggregate). */
  def mergeCohorts(a: DataFrame, b: DataFrame): DataFrame =
    annotateWidth(a.unionByName(b), cohortWidth(a) + cohortWidth(b))

  /** Cohort width: the declared `sample`-column metadata when present
    * (zero execution — the planner path; an UPPER BOUND by the
    * [[annotateWidth]] contract), else one distinct-count aggregate
    * over the sample column (metadata-scale: |cohort| rows through one
    * exchange, never the record corpus). */
  def cohortWidth(variants: DataFrame): Long =
    variants.schema.find(_.name == "sample")
      .filter(_.metadata.contains(CohortWidthKey))
      .map { f =>
        val schemaDecl = f.metadata.getLong(CohortWidthKey)
        // bare-union defense (r18 review): a plain unionByName of two
        // annotated cohorts inherits the FIRST side's declaration —
        // under-declaring the union and admitting a too-wide cohort to
        // the dense path. Walk the analyzed plan: Union nodes SUM their
        // children's declared bounds (exactly what the blessed
        // mergeCohorts declares) unless a re-annotation above them
        // overrides; the larger of the walk and the schema declaration
        // keeps the upper-bound contract whichever path built the plan.
        planDeclaredWidth(variants.queryExecution.analyzed)
          .map(math.max(schemaDecl, _)).getOrElse(schemaDecl)
      }
      .getOrElse(variants.select("sample").distinct().count())

  /** The declared cohort width of a logical subtree, union-aware: a
    * Project that explicitly re-annotates `sample` (the
    * [[annotateWidth]] shape) is authoritative for everything beneath
    * it; a Union sums its children's bounds (over-declaring on
    * overlap — the safe direction); other multi-child nodes (joins)
    * take the max sample-bearing child (rows combine, cohorts don't);
    * a leaf reads its output attribute's metadata. None = some branch
    * carries no declaration — the caller falls back to its schema
    * declaration / measured width. */
  private def planDeclaredWidth(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Union}
    plan match {
      case p: Project =>
        val reDecl = p.projectList.collectFirst {
          case a: Alias if a.name == "sample" &&
              a.explicitMetadata.exists(_.contains(CohortWidthKey)) =>
            a.explicitMetadata.get.getLong(CohortWidthKey)
        }
        reDecl.orElse(p.children.headOption.flatMap(planDeclaredWidth))
      case u: Union =>
        val ws = u.children.map(planDeclaredWidth)
        if (ws.nonEmpty && ws.forall(_.isDefined)) Some(ws.flatten.sum) else None
      case leaf if leaf.children.isEmpty =>
        leaf.output.find(_.name == "sample")
          .filter(_.metadata.contains(CohortWidthKey))
          .map(_.metadata.getLong(CohortWidthKey))
      case other =>
        val ws = other.children.flatMap(planDeclaredWidth)
        if (ws.isEmpty) None else Some(ws.max)
    }
  }

  /** [[combineAuto]]'s decision record: which format was admitted, the
    * width that decided it, and the (lazy) result plan. The format is
    * fixed before anything executes. */
  final case class AutoCombine(format: String, width: Long, df: DataFrame)

  /** LONG-format combine — the same CombineGVCFs semantics as
    * [[combineSites]] with the dense per-site calls row unbundled to one
    * row per (site, covered sample): (contig, pos, merged ref, merged
    * alt list, sample, sample_idx, remapped genotype, gq). Every row is
    * O(1) regardless of cohort width, so this path has no width ceiling
    * — the shuffles are the identical bucketed coverage join + site-key
    * window exchange as the dense path; only the final width-sized
    * collect_list is gone. [[denseFromLong]] reassembles the dense shape
    * exactly (GvcfSpec proves hash-identity), so the two formats are one
    * logical result. */
  def combineLong(variants: DataFrame, bucketWidth: Long = 64): DataFrame =
    combinedCalls(variants, bucketWidth)
      .select(col("contig"), col("pos"), col("ref"),
        array_join(col("alts"), ",").as("alt"),
        col("sample"), col("sample_idx"),
        coalesce(col("gtm"), lit("./.")).as("gt"), col("gq"))

  /** Reassemble [[combineSites]]' dense shape from [[combineLong]] rows
    * — the equality witness (and the explicit opt-in for a consumer that
    * truly wants dense rows above the handoff, paying the width cost
    * knowingly). Same call-string formula and sample_idx order as the
    * dense path, so the outputs are value-identical. */
  def denseFromLong(long: DataFrame): DataFrame =
    long.groupBy("contig", "pos")
      .agg(max(col("ref")).as("ref"), max(col("alt")).as("alt"),
        count(lit(1)).as("n_samples"),
        graft.functions.GvcfExpressions.sortedCallVals(
          expr("collect_list(struct(sample_idx AS i, " +
            "concat(sample, ':', gt, ':', " +
            "coalesce(CAST(gq AS STRING), '.')) AS c))"))
          .as("calls"))
      .orderBy("contig", "pos")

  /** Width-dispatching combine — the r17g handoff rule as code: read the
    * cohort width from table metadata ([[cohortWidth]]; declared
    * column metadata when present, one metadata-scale aggregate
    * otherwise), then admit the DENSE per-site format only up to
    * [[MaxDenseWidth]] samples and route wider cohorts to the LONG
    * format. The decision happens before any combine work executes —
    * the returned plan is lazy — so a 100 TB planner can assert the
    * admission rule without touching the record corpus. */
  def combineAuto(variants: DataFrame, bucketWidth: Long = 64,
      maxDenseWidth: Long = DeriveFromHeap): AutoCombine = {
    val bound = resolveBound(variants, maxDenseWidth)
    val width = cohortWidth(variants)
    if (width <= bound)
      AutoCombine("dense", width, combineSites(variants, bucketWidth))
    else
      AutoCombine("long", width, combineLong(variants, bucketWidth))
  }

  /** An explicit `maxDenseWidth` wins; the [[DeriveFromHeap]] default
    * resolves against the running JVM ([[defaultMaxDenseWidth]]). */
  private def resolveBound(variants: DataFrame, maxDenseWidth: Long): Long =
    if (maxDenseWidth == DeriveFromHeap)
      defaultMaxDenseWidth(variants.sparkSession)
    else maxDenseWidth

  /** The GenotypeGVCFs step — the computation the reference's store
    * exists to enable (`VariantCombiner.java:~8 (unverified)`, per
    * SURVEY §0): re-genotype every covered sample at every merged site
    * FROM ITS PHRED LIKELIHOODS, in merged allele space.
    *
    * Per (site, covered sample):
    *   1. Merged alleles `[ref] ++ sorted-distinct alts ++ <NON_REF>`
    *      (the combine union). The sample's LOCAL allele list is its own
    *      `alleles ++ <NON_REF>`.
    *   2. PL index remap — the hard part: diploid genotype (a,b), a≤b,
    *      lives at canonical PL index b(b+1)/2 + a. Walk the merged
    *      genotype space in canonical order, map each merged allele to
    *      the sample's local index (alleles the sample never saw resolve
    *      to its <NON_REF>, the GATK convention), and read the sample's
    *      PL at the LOCAL pair's canonical index. Block-covered samples
    *      (no PL) synthesize the standard banded likelihoods
    *      0 / GQ / 2·GQ for hom-ref / het / hom-alt.
    *   3. Re-genotype: GT = argmin PL (first index on ties — canonical
    *      order makes that deterministic); GQ = second-best − best,
    *      capped at 99.
    *
    * All-integer math end to end, so the DuckDB oracle is exact. Plan
    * shape: the same bucketed site-coverage equi-join as the combine,
    * one merged-allele aggregate joined back, then pure per-row array
    * expressions (codegen'd, no UDFs) and one final site aggregate —
    * nothing new shuffles at 100 TB beyond what combine already pays. */
  def genotypeGvcf(variants: DataFrame, bucketWidth: Long = 64): DataFrame =
    mergedSiteAgg(genotypeCalls(variants, bucketWidth),
      sum(col("dp")).cast(LongType).as("sum_dp"),
      array_join(graft.functions.GvcfExpressions.sortedCallVals(
        expr("collect_list(struct(sample_idx AS i, " +
          "concat(sample, ':', gt_new, ':', gq_new) AS c))")), ";")
        .as("calls"))
      .orderBy("contig", "pos")

  /** The per-sample half of [[genotypeGvcf]] — every covered sample's
    * re-genotyped call in merged allele space, BEFORE the width-sized
    * per-site calls assembly. This is the genotype family's long-format
    * core (the [[combinedCalls]] analog): [[genotypeLong]] projects it,
    * [[genotypeGvcf]] rolls it up densely. */
  private def genotypeCalls(variants: DataFrame, bucketWidth: Long): DataFrame = {
    val cov = siteCoverage(variants, bucketWidth)
      .select("contig", "pos", "sample", "kind", "alleles", "gq", "dp", "pl")
    // merged ref/alts as whole-partition window aggregates over the ONE
    // shuffled copy of the coverage rows — same r14 rework as
    // [[combinedCalls]]: the coverage subtree (the corpus-scale stage)
    // runs once, and the window exchange on the site key is the same
    // partitioning the final per-site aggregate needs.
    val wm = Window.partitionBy("contig", "pos")
    // one select, not chained withColumn: both window aggregates land in
    // a single WindowExec pass over the shared sort
    val re = cov
      .select(cov.columns.map(col) :+
        min(when(col("kind") === "site", element_at(col("alleles"), 1))).over(wm)
          .as("ref") :+
        // collect_SET for the same reason as [[combinedCalls]]: the
        // wrapping sorted-distinct-flatten is a per-row projection over
        // the shared window value, so the aggregate must hand it
        // distinct slices, not one per sample (O(samples²) otherwise).
        // graft_merged_alts = the former concat(array_sort(array_distinct(
        // flatten(…))), array(NON_REF)) chain as ONE codegen-native pass
        // (r22: the HOF chain evaluated interpreted on every coverage row).
        graft.functions.GvcfExpressions.mergedAlts(collect_set(
            when(col("kind") === "site",
              expr("slice(alleles, 2, greatest(size(alleles) - 1, 0))"))).over(wm),
          Vcf.NonRef).as("alts"): _*)
      .withColumn("malleles", concat(array(col("ref")), col("alts")))
      .withColumn("lall", concat(col("alleles"), array(lit(Vcf.NonRef))))
      // The local-index map + canonical-pair walk + PL remap + argmin +
      // second-best gap, packed into ONE codegen-native expression
      // (graft_pl_regenotype, r22 — was a 6-step interpreted HOF chain:
      // limap/pairs/mpl/argmin/sort; see GvcfKernels.plRegenotype for the
      // step-by-step replication, incl. coalesce(gq, 0) for GQ-'.'
      // blocks and the 999999 out-of-range PL sentinel). The packed long
      // carries (a, b, gq_new); unpacking below is pure integer codegen.
      .withColumn("pk", graft.functions.GvcfExpressions.plRegenotype(
        col("malleles"), col("lall"), col("pl"), col("kind"), col("gq")))
      .withColumn("gt_new", expr(
        "concat(CAST(pk & 1048575 AS STRING), '/', " +
          "CAST(shiftright(pk, 20) & 1048575 AS STRING))"))
      .withColumn("gq_new", expr("CAST(shiftright(pk, 40) AS INT)"))
    re.join(broadcast(sampleNameIndex(variants)), "sample")
  }

  /** LONG-format genotyping — the [[combineLong]] analog for
    * [[genotypeGvcf]]: one O(1) row per (site, covered sample) with the
    * merged header and the sample's RE-GENOTYPED call, no width-sized
    * per-site assembly anywhere in the plan. Same shuffles as the dense
    * path (bucketed coverage join + site-key window). */
  def genotypeLong(variants: DataFrame, bucketWidth: Long = 64): DataFrame =
    genotypeCalls(variants, bucketWidth)
      .select(col("contig"), col("pos"), col("ref"),
        array_join(col("alts"), ",").as("alt"),
        col("sample"), col("sample_idx"),
        col("gt_new").as("gt"), col("gq_new").as("gq"), col("dp"))

  /** Reassemble [[genotypeGvcf]]'s dense shape from [[genotypeLong]]
    * rows — the genotype equality witness (GvcfSpec). */
  def genotypeFromLong(long: DataFrame): DataFrame =
    long.groupBy("contig", "pos")
      .agg(max(col("ref")).as("ref"), max(col("alt")).as("alt"),
        count(lit(1)).as("n_samples"),
        sum(col("dp")).cast(LongType).as("sum_dp"),
        array_join(graft.functions.GvcfExpressions.sortedCallVals(
          expr("collect_list(struct(sample_idx AS i, " +
            "concat(sample, ':', gt, ':', gq) AS c))")), ";")
          .as("calls"))
      .orderBy("contig", "pos")

  /** Width-dispatching genotyping — the same r17g admission rule as
    * [[combineAuto]], applied to the GenotypeGVCFs output: dense
    * per-site rows up to [[MaxDenseWidth]] samples, the long format
    * beyond, decided from table metadata on the lazy plan. */
  def genotypeAuto(variants: DataFrame, bucketWidth: Long = 64,
      maxDenseWidth: Long = DeriveFromHeap): AutoCombine = {
    val bound = resolveBound(variants, maxDenseWidth)
    val width = cohortWidth(variants)
    if (width <= bound)
      AutoCombine("dense", width, genotypeGvcf(variants, bucketWidth))
    else
      AutoCombine("long", width, genotypeLong(variants, bucketWidth))
  }

  /** Deterministic 3-sample synthetic cohort (pure arithmetic — the
    * DuckDB oracle rebuilds it value for value): record j of sample k is
    * a het/hom site at position 10j+1 when (j+k)%3 < 2 (so every
    * position has TWO samples with different alts — the merge union is
    * exercised), else a reference block spanning [10j+1, 10j+10]. */
  def syntheticVariants(s: SparkSession, n: Long): DataFrame =
    // partitions sized to the data (rows/50k, clamped to the core
    // count), not the session default: 32 near-empty tasks of
    // per-row arithmetic otherwise dominate small-cohort queries'
    // scheduling cost (deltaSample precedent, Gvcf.scala:536)
    s.range(0, n, 1, sizedParts(n)).selectExpr(
      "concat('s', id % 3) AS sample",
      "concat('chr', 1 + (id div 3) % 2) AS contig",
      "(id div 3) * 10 + 1 AS start",
      "CASE WHEN ((id div 3) + id % 3) % 3 < 2 THEN (id div 3) * 10 + 1 " +
        "ELSE (id div 3) * 10 + 10 END AS end",
      "CASE WHEN ((id div 3) + id % 3) % 3 < 2 THEN 'site' ELSE 'block' END AS kind",
      "CASE WHEN ((id div 3) + id % 3) % 3 < 2 " +
        "THEN array(substr('ACGT', CAST((id div 3) % 4 AS INT) + 1, 1), " +
        "           substr('ACGT', CAST(((id div 3) + 1 + id % 3) % 4 AS INT) + 1, 1)) " +
        "ELSE array(substr('ACGT', CAST((id div 3) % 4 AS INT) + 1, 1)) END AS alleles",
      "CAST(((id div 3) * 7 + (id % 3) * 13) % 90 + 10 AS INT) AS gq",
      "CASE WHEN ((id div 3) + id % 3) % 3 >= 2 THEN '0/0' " +
        "WHEN ((id div 3) + id % 3) % 2 = 0 THEN '0/1' ELSE '1/1' END AS gt")

  /** [[syntheticVariants]] extended with the likelihood fields: every
    * record gets a depth `dp = gq % 30 + 10`; site records get the
    * 6-entry PL over their local `[ref, alt, <NON_REF>]` diploid space —
    * 0 at the true genotype's canonical index, `(j+1)·10 + start%7`
    * elsewhere (so the argmin is unique and the remap is observable);
    * blocks carry no PL (synthesized from GQ downstream, as in a real
    * gVCF). */
  def syntheticVariantsPl(s: SparkSession, n: Long): DataFrame =
    withPl(syntheticVariants(s, n))

  /** Add the likelihood fields (dp, pl) to any cohort shaped like
    * [[syntheticVariants]] — shared by the 3-sample and WIDE cohorts so
    * the PL arithmetic cannot drift between them. */
  private[graft] def withPl(cohort: DataFrame): DataFrame =
    cohort
      .withColumn("dp", (col("gq") % 30 + 10).cast(IntegerType))
      // explicit 6-element array, not transform(sequence(0, 5), …): the
      // higher-order transform evaluates INTERPRETED (a boxed lambda call
      // per element per row — r22 RemapAB measured the class of chain at
      // >10× the codegen cost), and j is statically 0..5 here, so the
      // unrolled form is the same values with every element codegen'd.
      // j = gidx is only reachable for j in {0,1,2} (gidx = 0/1/2).
      .withColumn("pl", expr(
        """CASE WHEN kind = 'site' THEN array(
          |  CAST(CASE WHEN 0 = (CASE WHEN gt = '0/1' THEN 1 WHEN gt = '1/1' THEN 2 ELSE 0 END)
          |       THEN 0 ELSE 10 + start % 7 END AS INT),
          |  CAST(CASE WHEN 1 = (CASE WHEN gt = '0/1' THEN 1 WHEN gt = '1/1' THEN 2 ELSE 0 END)
          |       THEN 0 ELSE 20 + start % 7 END AS INT),
          |  CAST(CASE WHEN 2 = (CASE WHEN gt = '0/1' THEN 1 WHEN gt = '1/1' THEN 2 ELSE 0 END)
          |       THEN 0 ELSE 30 + start % 7 END AS INT),
          |  CAST(40 + start % 7 AS INT),
          |  CAST(50 + start % 7 AS INT),
          |  CAST(60 + start % 7 AS INT))
          |END""".stripMargin))

  /** [[syntheticVariantsWide]] with the likelihood fields — the input
    * for wide-cohort GENOTYPING (q_genotype_wide). */
  def syntheticVariantsWidePl(s: SparkSession, nSamples: Long,
      nPositions: Long = WidePositions): DataFrame =
    withPl(syntheticVariantsWide(s, nSamples, nPositions))

  /** WIDE cohort — the SAMPLE axis scales with sf while the position
    * axis stays fixed (the dense-vector / HBase wide-row bound the
    * reference lives with, `GVCFHBase.java:~110 (unverified)`): every
    * one of `nSamples` samples has a record at every one of
    * `nPositions` positions (site or spanning block by the same
    * (j + k) % 3 scheme as [[syntheticVariants]]). Sample names are
    * zero-padded so lexicographic sample order == numeric order on
    * both engines. Alt index (j + 1 + k % 3) % 4 never collides with
    * the ref (j % 4), keeping ≤3 distinct alts per site. */
  def syntheticVariantsWide(s: SparkSession, nSamples: Long,
      nPositions: Long = WidePositions): DataFrame =
    // sample-axis partitions sized to the OUTPUT rows (samples ×
    // positions); the fixed 120-position side rides along as a single
    // slice — see syntheticVariants on why sizing beats the session
    // default here. The generator KNOWS its width, so it declares it on
    // the sample column ([[annotateWidth]]) — [[combineAuto]] reads the
    // admission decision from metadata with zero execution.
    annotateWidth(
    s.range(0, nSamples, 1, sizedParts(nSamples * nPositions))
      .selectExpr("id AS k")
      .crossJoin(s.range(0, nPositions, 1, 1).selectExpr("id AS j"))
      .selectExpr(
        // concat+lpad, not format_string('s%05d'): identical bytes (the
        // DuckDB cohort CTE already spells it lpad), but format_string
        // instantiates a java.util.Formatter per ROW — 2.7× steady-state
        // per-row cost in a same-JVM noop A/B at 20M rows (r21, guide
        // §1.2 step 2), paid on all three cohort scans of every wide
        // query. The k >= 100000 branch preserves %05d semantics
        // EXACTLY at probe widths (ScaleCentury runs this generator at
        // width 1,002,000): lpad alone TRUNCATES past 5 digits, which
        // would collide sample names; %05d pads but never truncates.
        "concat('s', CASE WHEN k >= 100000 THEN CAST(k AS STRING) " +
          "ELSE lpad(CAST(k AS STRING), 5, '0') END) AS sample",
        "concat('chr', 1 + j % 2) AS contig",
        "j * 10 + 1 AS start",
        "CASE WHEN (j + k) % 3 < 2 THEN j * 10 + 1 ELSE j * 10 + 10 END AS end",
        "CASE WHEN (j + k) % 3 < 2 THEN 'site' ELSE 'block' END AS kind",
        "CASE WHEN (j + k) % 3 < 2 " +
          "THEN array(substr('ACGT', CAST(j % 4 AS INT) + 1, 1), " +
          "           substr('ACGT', CAST((j + 1 + k % 3) % 4 AS INT) + 1, 1)) " +
          "ELSE array(substr('ACGT', CAST(j % 4 AS INT) + 1, 1)) END AS alleles",
        "CAST((j * 7 + k * 13) % 90 + 10 AS INT) AS gq",
        "CASE WHEN (j + k) % 3 >= 2 THEN '0/0' " +
          "WHEN (j + k) % 2 = 0 THEN '0/1' ELSE '1/1' END AS gt"),
      nSamples)

  /** Fixed position count for the wide cohort: the point is per-site
    * WIDTH, so positions don't scale. 120 positions → 60 sites/contig. */
  val WidePositions = 120L

  /** Generator partition count sized to the produced rows: one slice
    * per ~50k rows, clamped to [1, 32]. Values are partition-invariant
    * (pure arithmetic on `id`), so this only moves scheduling cost. */
  private[ops] def sizedParts(rows: Long): Int =
    math.max(1L, math.min(32L, rows / 50000L + 1L)).toInt

  /** Wide-cohort sample count: |orders| / 50 = 30 / 300 / 3,000 samples
    * at sf0.001 / 0.01 / 0.1 — realistic cohort widths, vs the 3+1 the
    * rest of the gVCF family uses. Memoized per dir (metadata read). */
  private val wideSizes = scala.collection.concurrent.TrieMap.empty[String, Long]
  def wideN(s: SparkSession, d: String): Long =
    wideSizes.getOrElseUpdate(d, math.max(3L, tbl(s, d, "orders").count() / 50))

  /** Cohort size derived from the scale factor so the gVCF family is
    * bench-visible as data grows (r8 verdict: a fixed 3,000-record cohort
    * made dual-scale vacuous for the genomics core): n = |orders| / 5 =
    * 300 at sf0.001, 3,000 at sf0.01 (the driver's gate scale — output
    * unchanged), 30,000 at sf0.1. Memoized per dir; the count is a
    * parquet-metadata read, not a scan. */
  private val cohortSizes = scala.collection.concurrent.TrieMap.empty[String, Long]
  def cohortN(s: SparkSession, d: String): Long =
    cohortSizes.getOrElseUpdate(d, tbl(s, d, "orders").count() / 5)

  /** The same `i = 0..n-1` enumeration in DuckDB. `range()` only takes
    * constants, so n = |orders| / 5 is derived by windowed enumeration
    * over the SAME parquet `orders` the Spark side counts. */
  private[ops] val duckG =
    """g AS (SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS i FROM orders
      |      QUALIFY row_number() OVER (ORDER BY o_orderkey) <= count(*) OVER () // 5)""".stripMargin

  /** The same cohort as [[syntheticVariants]] in DuckDB CTE form
    * (column names vstart/vend dodge the END keyword). */
  private[ops] val duckSyntheticV =
    s"""$duckG,
      |v AS (
      |  SELECT 's' || CAST(i % 3 AS VARCHAR) AS sample,
      |    'chr' || CAST(1 + (i // 3) % 2 AS VARCHAR) AS contig,
      |    (i // 3) * 10 + 1 AS vstart,
      |    CASE WHEN ((i // 3) + i % 3) % 3 < 2 THEN (i // 3) * 10 + 1
      |         ELSE (i // 3) * 10 + 10 END AS vend,
      |    CASE WHEN ((i // 3) + i % 3) % 3 < 2 THEN 'site' ELSE 'block' END AS kind,
      |    substr('ACGT', CAST((i // 3) % 4 AS INT) + 1, 1) AS ref,
      |    substr('ACGT', CAST(((i // 3) + 1 + i % 3) % 4 AS INT) + 1, 1) AS alt,
      |    CAST(((i // 3) * 7 + (i % 3) * 13) % 90 + 10 AS INT) AS gq,
      |    CASE WHEN ((i // 3) + i % 3) % 3 >= 2 THEN '0/0'
      |         WHEN ((i // 3) + i % 3) % 2 = 0 THEN '0/1' ELSE '1/1' END AS gt
      |  FROM g)""".stripMargin

  /** The coverage → merged alleles → remapped genotypes chain (the
    * CombineGVCFs pipeline) in DuckDB CTE form, FROM a preceding `v`
    * cohort CTE — shared by the 3-sample oracles (q_combine_merge,
    * q_gvcf_export), the wide combine (q_combine_wide), and the wide
    * export (q_export_wide), so the merge arithmetic cannot drift. */
  private val duckCombineChain =
    """sites AS (SELECT DISTINCT contig, vstart AS pos FROM v WHERE kind = 'site'),
      |cov AS (
      |  SELECT s.contig, s.pos, v.sample, v.kind, v.ref, v.alt, v.gt, v.gq
      |  FROM sites s JOIN v ON v.contig = s.contig AND s.pos BETWEEN v.vstart AND v.vend),
      |merged AS (
      |  SELECT contig, pos, min(ref) AS mref,
      |    list_sort(list_distinct(list(alt))) AS calts
      |  FROM cov WHERE kind = 'site' GROUP BY contig, pos),
      |remap AS (
      |  SELECT c.contig, c.pos, c.sample,
      |    CASE WHEN c.kind = 'block' THEN c.gt
      |         ELSE array_to_string(list_transform(string_split(c.gt, '/'), g ->
      |           CASE WHEN g = '0' THEN '0'
      |                ELSE CAST(list_position(m.calts, c.alt) AS VARCHAR) END), '/')
      |    END AS gtm, c.gq
      |  FROM cov c JOIN merged m ON c.contig = m.contig AND c.pos = m.pos)""".stripMargin

  /** Shared oracle CTEs: cohort → coverage → merged alleles → remapped
    * genotypes (the CombineGVCFs pipeline, reused by q_combine_merge and
    * q_gvcf_export). */
  private val duckCombineCtes =
    s"""$duckSyntheticV,
       |$duckCombineChain""".stripMargin

  /** Merged-record combine over the synthetic cohort, oracle-backed: the
    * DuckDB side rebuilds the cohort and performs the same merge (site
    * union, genotype remap via list_position, sample-ordered calls).
    * `calls` is flattened to one ';'-joined string — the driver's compare
    * sorts on every output column and can't sort array cells (r3's only
    * red entry), so no final query schema may carry ARRAY columns. */
  val combineMerge = Query(
    "q_combine_merge",
    s"""WITH $duckCombineCtes
       |SELECT r.contig, r.pos, m.mref AS ref,
       |  array_to_string(m.calts, ',') || ',<NON_REF>' AS alt,
       |  count(*) AS n_samples,
       |  array_to_string(list(r.sample || ':' || r.gtm || ':' || CAST(r.gq AS VARCHAR) ORDER BY r.sample), ';') AS calls
       |FROM remap r JOIN merged m ON r.contig = m.contig AND r.pos = m.pos
       |GROUP BY r.contig, r.pos, m.mref, m.calts
       |ORDER BY r.contig, r.pos""".stripMargin) { (s, d) =>
    combineSites(syntheticVariants(s, cohortN(s, d)))
      .withColumn("calls", array_join(col("calls"), ";"))
  }

  /** Sample-axis scale evidence (r9 verdict item 3): the SAME combine as
    * [[combineMerge]], but over the WIDE cohort — per-site sample count
    * = |orders|/50 (30 / 300 / 3,000 at sf0.001/0.01/0.1) with the
    * position axis fixed, so the measured cost is the per-site
    * `collect_list` at realistic cohort widths (the reference's HBase
    * wide-row bound: one cell per sample per position). The combined
    * calls string is md5'd on BOTH engines — a 3,000-sample calls cell
    * is ~40 KB and the digest proves it value-exact without shipping
    * megabytes through the compare. Plan shape is [[combineSites]]
    * verbatim: bucketed coverage equi-join, one site aggregate — width
    * changes the aggregate's fan-in, never the shuffle count.
    *
    * SCALE CONTRACT (measured, r15 decade drive): output cells are
    * O(sites × samples) by definition, so the wide trio
    * (combine/genotype/export over this cohort) is intentionally
    * cohort-BOUNDED — at the sf1-equivalent decade the cohort would be
    * 30,000 samples × 10× sites = 100× sf0.1's matrix, and the dense
    * form ground >9 CPU-min/task before being killed (SCALE.md r15f).
    * That is the anti-pattern the store's long format exists to avoid:
    * unbounded cohorts take the long-format combine/genotype family,
    * which the decade drive runs at a 300,000-record cohort. */
  /** The WIDE cohort ([[syntheticVariantsWide]]) in DuckDB CTE form —
    * shared by q_combine_wide and q_genotype_wide so the cohort
    * arithmetic cannot drift between their oracles. */
  private val duckWideV =
    """ns AS (SELECT count(*) // 50 AS n FROM orders),
      |ss AS (SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS k FROM orders
      |       QUALIFY row_number() OVER (ORDER BY o_orderkey) <=
      |         greatest((SELECT n FROM ns), 3)),
      |ps AS (SELECT range AS j FROM range(0, 120)),
      |v AS (
      |  -- k >= 100000 guard mirrors the Scala generator (r21 advice):
      |  -- bare lpad TRUNCATES past 5 digits, the generator preserves
      |  -- %05d semantics — inert at fixture widths, but impl and
      |  -- oracle must agree at ANY width an oracle-verified probe uses
      |  SELECT 's' || (CASE WHEN k >= 100000 THEN CAST(k AS VARCHAR)
      |                 ELSE lpad(CAST(k AS VARCHAR), 5, '0') END) AS sample,
      |    'chr' || CAST(1 + j % 2 AS VARCHAR) AS contig,
      |    j * 10 + 1 AS vstart,
      |    CASE WHEN (j + k) % 3 < 2 THEN j * 10 + 1 ELSE j * 10 + 10 END AS vend,
      |    CASE WHEN (j + k) % 3 < 2 THEN 'site' ELSE 'block' END AS kind,
      |    substr('ACGT', CAST(j % 4 AS INT) + 1, 1) AS ref,
      |    substr('ACGT', CAST((j + 1 + k % 3) % 4 AS INT) + 1, 1) AS alt,
      |    CAST((j * 7 + k * 13) % 90 + 10 AS INT) AS gq,
      |    CASE WHEN (j + k) % 3 >= 2 THEN '0/0'
      |         WHEN (j + k) % 2 = 0 THEN '0/1' ELSE '1/1' END AS gt
      |  FROM ss, ps)""".stripMargin

  val combineWide = Query(
    "q_combine_wide",
    s"""WITH $duckWideV,
      |$duckCombineChain
      |SELECT r.contig, r.pos, m.mref AS ref,
      |  array_to_string(m.calts, ',') || ',<NON_REF>' AS alt,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  md5(array_to_string(list(r.sample || ':' || r.gtm || ':' || CAST(r.gq AS VARCHAR)
      |    ORDER BY r.sample), ';')) AS calls_md5
      |FROM remap r JOIN merged m ON r.contig = m.contig AND r.pos = m.pos
      |GROUP BY r.contig, r.pos, m.mref, m.calts
      |ORDER BY r.contig, r.pos""".stripMargin) { (s, d) =>
    combineSites(syntheticVariantsWide(s, wideN(s, d)))
      .withColumn("calls_md5", md5(array_join(col("calls"), ";").cast(BinaryType)))
      .drop("calls")
  }

  /** The r17g handoff ENFORCED under the driver's gate: run
    * [[combineAuto]] over the wide cohort and emit the admitted format
    * as a result column. At every driver scale the cohort width
    * (|orders|/50 ≤ 60,000 at sf1) is under [[MaxDenseWidth]], so the
    * oracle pins `format = 'dense'` — if the dispatch ever mis-routes a
    * bounded cohort to the long format (schema change) or the dense
    * output drifts, the gate goes red. The long branch is exercised by
    * the same query entry at the 334× probe corpus (width 1,002,000 →
    * long; graft.AutoCombineProbe validates it there) and by GvcfSpec's
    * dense≡long equality. Oracle SQL is [[combineWide]]'s verbatim plus
    * the format literal. */
  val combineAutoQuery = Query(
    "q_combine_auto",
    s"""WITH $duckWideV,
      |$duckCombineChain
      |SELECT 'dense' AS format, r.contig, r.pos, m.mref AS ref,
      |  array_to_string(m.calts, ',') || ',<NON_REF>' AS alt,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  md5(array_to_string(list(r.sample || ':' || r.gtm || ':' || CAST(r.gq AS VARCHAR)
      |    ORDER BY r.sample), ';')) AS calls_md5
      |FROM remap r JOIN merged m ON r.contig = m.contig AND r.pos = m.pos
      |GROUP BY r.contig, r.pos, m.mref, m.calts
      |ORDER BY r.contig, r.pos""".stripMargin) { (s, d) =>
    // the gate pins the dispatch MECHANISM, so it passes the fixed cap:
    // the heap-derived default would make the admitted format (hence the
    // result schema) depend on the gate runner's JVM — a small-heap
    // driver at a wide-enough sf would flip to 'long' against a 'dense'
    // oracle. The derived path is covered where the heap IS the variable
    // under test: WidthFloorProbe brackets it, GvcfSpec pins the formula.
    val auto = combineAuto(syntheticVariantsWide(s, wideN(s, d)),
      maxDenseWidth = MaxDenseWidth)
    auto.format match {
      case "dense" => auto.df
        .withColumn("calls_md5", md5(array_join(col("calls"), ";").cast(BinaryType)))
        .drop("calls")
        .select(lit("dense").as("format"), col("*"))
      // width-free long rows — reached only above MaxDenseWidth, where
      // no oracle runs (the probe corpus); kept schema-stable per route
      case _ => auto.df.select(lit("long").as("format"), col("*"))
    }
  }

  /** Delta sample for the incremental combine: 's3' contributes a het
    * site at the first n/30 position groups (so its positions land in
    * ~10% of the store's position buckets), pure arithmetic on both
    * engines. Its alt allele (j+2 mod 4) differs from the cohort's two
    * site alleles at most groups, so the merged allele list — and every
    * covered sample's remapped genotype — genuinely changes in the
    * touched buckets. */
  def deltaSample(s: SparkSession, n: Long): DataFrame =
    // partitions sized to the delta (~100k rows each), not the session
    // default: one added sample is delta-scale by construction, and 32
    // near-empty range tasks would dominate the incremental path's cost
    // at bench scale while the count still grows with n for a real
    // cohort-sized delta.
    s.range(0, n / 30, 1, math.max(1, (n / 30 / 100000L).toInt + 1)).selectExpr(
      "'s3' AS sample",
      "concat('chr', 1 + id % 2) AS contig",
      "id * 10 + 1 AS start",
      "id * 10 + 1 AS end",
      "'site' AS kind",
      "array(substr('ACGT', CAST(id % 4 AS INT) + 1, 1), " +
        "substr('ACGT', CAST((id + 2) % 4 AS INT) + 1, 1)) AS alleles",
      "CAST((id * 11) % 90 + 10 AS INT) AS gq",
      "'0/1' AS gt")

  /** Bump whenever [[syntheticVariants]] / [[combineSites]] output or the
    * incremental store layout changes — the bucket-partitioned fixture
    * dirs below are keyed on it (the [[Vcf.SyntheticFormatVersion]]
    * stale-cache rule). */
  val IncStoreVersion = 1
  /** Position-bucket width of the incremental store. */
  val IncBucketW = 1000L

  /** Fixture parent dir, keyed by version + cohort size + CONTENT
    * fingerprint of the deriving `orders` table (the Sources.cachedStore
    * pattern): unlike the fixed-n VCF fixture, this store's content is
    * data-dependent (n = |orders|/5), so a version constant alone would
    * serve a stale fixture if the testdata at the same path were
    * regenerated — the fingerprint catches even a same-cardinality
    * regeneration. `raw/` and `comb/` live under ONE parent so the
    * atomic publish covers both. */
  private def incParent(d: String, n: Long): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_inc_v${IncStoreVersion}_n${n}_" +
      graft.api.contentFingerprint(s"$d/orders.parquet") + "_" +
      d.replaceAll("[^a-zA-Z0-9]", "_")

  private[graft] def incDir(d: String, which: String, n: Long): String =
    s"${incParent(d, n)}/$which"

  /** Write-once incremental-store fixtures per (sf, content): the raw
    * cohort exploded into every position bucket a record SPANS (the
    * reference's spanning-block duplication at region boundaries,
    * `GVCFHBase.java:~95 (unverified)`), and the combined output
    * bucketed by site position — both `partitionBy(bucket)` so reads
    * prune at the directory level. Built into a temp dir and
    * ATOMICALLY renamed in ([[graft.api.buildOnce]]), so a concurrent
    * Verify/Bench pair can never read a half-built store; the bench
    * then measures the incremental READ path the query exists to
    * prove, not its setup writes. */
  private[graft] def incrementalStore(s: SparkSession, d: String): (String, String) = {
    val n = cohortN(s, d)
    graft.api.buildOnce(incParent(d, n)) { tmp =>
      val base = syntheticVariants(s, n)
      base.withColumn("bucket",
          explode(sequence(col("start") / IncBucketW cast LongType, col("end") / IncBucketW cast LongType)))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$tmp/raw")
      combineSites(base)
        .withColumn("calls", array_join(col("calls"), ";"))
        .withColumn("bucket", (col("pos") / IncBucketW).cast(LongType))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$tmp/comb")
    }
    (incDir(d, "raw", n), incDir(d, "comb", n))
  }

  /** Bucket-pruned INCREMENTAL combine — the reference's raison d'être
    * (`README.md:~1 (unverified)`): adding sample N+1 must not redo the
    * other N samples' work. Sample s3's delta touches ~10% of the
    * position buckets; the query re-runs [[combineSites]] ONLY on those
    * buckets' raw records (+ the delta) — a `bucket IN (...)` partition
    * filter, directory-level pruning, asserted in GvcfSpec — and passes
    * every untouched bucket's PREVIOUS combined output through verbatim
    * (complement partition filter, pruned likewise). The touched-bucket
    * list is a K-row driver materialization (|delta positions| / bucket
    * width, metadata-scale — the Ivf-centroid class of documented
    * lineage break). Spanning-block duplicates inside the touched slice
    * collapse via dropDuplicates before re-combining. The oracle replays
    * the FULL 4-sample combine from scratch — a hash match proves
    * incremental == full recompute. */
  val combineIncremental = Query(
    "q_combine_incremental",
    s"""WITH $duckSyntheticV,
       |dn AS (SELECT count(*) AS n FROM g),
       |delta AS (
       |  SELECT 's3' AS sample,
       |    'chr' || CAST(1 + (i // 3) % 2 AS VARCHAR) AS contig,
       |    (i // 3) * 10 + 1 AS vstart, (i // 3) * 10 + 1 AS vend,
       |    'site' AS kind,
       |    substr('ACGT', CAST((i // 3) % 4 AS INT) + 1, 1) AS ref,
       |    substr('ACGT', CAST(((i // 3) + 2) % 4 AS INT) + 1, 1) AS alt,
       |    CAST(((i // 3) * 11) % 90 + 10 AS INT) AS gq,
       |    '0/1' AS gt
       |  FROM g, dn WHERE i % 3 = 0 AND i < 3 * (n // 30)),
       |v4 AS (SELECT * FROM v UNION ALL SELECT * FROM delta),
       |sites AS (SELECT DISTINCT contig, vstart AS pos FROM v4 WHERE kind = 'site'),
       |cov AS (
       |  SELECT s.contig, s.pos, v4.sample, v4.kind, v4.ref, v4.alt, v4.gt, v4.gq
       |  FROM sites s JOIN v4 ON v4.contig = s.contig AND s.pos BETWEEN v4.vstart AND v4.vend),
       |merged AS (
       |  SELECT contig, pos, min(ref) AS mref,
       |    list_sort(list_distinct(list(alt))) AS calts
       |  FROM cov WHERE kind = 'site' GROUP BY contig, pos),
       |remap AS (
       |  SELECT c.contig, c.pos, c.sample,
       |    CASE WHEN c.kind = 'block' THEN c.gt
       |         ELSE array_to_string(list_transform(string_split(c.gt, '/'), g2 ->
       |           CASE WHEN g2 = '0' THEN '0'
       |                ELSE CAST(list_position(m.calts, c.alt) AS VARCHAR) END), '/')
       |    END AS gtm, c.gq
       |  FROM cov c JOIN merged m ON c.contig = m.contig AND c.pos = m.pos)
       |SELECT r.contig, r.pos, m.mref AS ref,
       |  array_to_string(m.calts, ',') || ',<NON_REF>' AS alt,
       |  count(*) AS n_samples,
       |  array_to_string(list(r.sample || ':' || r.gtm || ':' || CAST(r.gq AS VARCHAR) ORDER BY r.sample), ';') AS calls
       |FROM remap r JOIN merged m ON r.contig = m.contig AND r.pos = m.pos
       |GROUP BY r.contig, r.pos, m.mref, m.calts
       |ORDER BY r.contig, r.pos""".stripMargin) { (s, d) =>
    val (rawDir, combDir) = incrementalStore(s, d)
    val delta = deltaSample(s, cohortN(s, d))
    // touched buckets from the delta — K rows to the driver. distinct()
    // bounds the collect at bucket-count rows; the K-row sort runs
    // driver-side (an orderBy here would add a range exchange + a whole
    // extra stage to a metadata-scale frame).
    val touched = delta
      .select((col("start") / IncBucketW).cast(LongType).as("bucket"))
      .distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    val rawTouched = graft.api.pathTbl(s, rawDir)
      .filter(col("bucket").isin(touched: _*))
      .drop("bucket")
      // spanning blocks were duplicated into each bucket they cross —
      // collapse before combining (one record per (sample, start))
      .dropDuplicates("sample", "contig", "start")
    // localCheckpoint KEPT over lazy persist (r22, measured):
    // combineSites traverses its input twice (sample index build —
    // a broadcast, i.e. a concurrent driver job — and the coverage
    // join + windowed allele merge); under lazy persist the two
    // racing consumers duplicate the pruned scan + dedup shuffle
    // (FloorAudit sf0.1: task_ms 2579 → 10684 on the persist
    // variant). The touched slice is delta-bounded (the premise of
    // incrementality), so materializing it eagerly is the Ivf-centroid
    // class of lineage break, not a corpus cache.
    val recombined = combineSites(
        rawTouched.unionByName(delta).localCheckpoint())
      .withColumn("calls", array_join(col("calls"), ";"))
    val passthrough = graft.api.pathTbl(s, combDir)
      .filter(!col("bucket").isin(touched: _*))
      .drop("bucket")
    passthrough.unionByName(recombined).orderBy("contig", "pos")
  }

  /** GenotypeGVCFs over the PL-bearing cohort. The oracle replays the
    * ENTIRE pipeline independently in DuckDB list SQL — coverage join,
    * allele union, canonical-order PL remap through the local-index map,
    * argmin re-genotype, GQ from the two smallest likelihoods — so a
    * hash match proves the remap math, not just the plumbing. */
  /** The GenotypeGVCFs pipeline (coverage → merged alleles → PL remap →
    * argmin genotype) in DuckDB CTE form, FROM a preceding `v` cohort
    * CTE — shared verbatim by q_genotype_gvcf (3-sample cohort) and
    * q_genotype_wide (|orders|/50-sample cohort) so the remap arithmetic
    * cannot drift between their oracles. */
  private val duckGenotypeCtes =
    """vp AS (
      |  SELECT *, CAST(gq % 30 + 10 AS INT) AS dp,
      |    CASE WHEN kind = 'site' THEN
      |      list_transform(range(0, 6), j -> CAST(
      |        CASE WHEN j = (CASE WHEN gt = '0/1' THEN 1 WHEN gt = '1/1' THEN 2 ELSE 0 END)
      |             THEN 0 ELSE (j + 1) * 10 + vstart % 7 END AS INT))
      |    END AS pl,
      |    CASE WHEN kind = 'site' THEN [ref, alt] ELSE [ref] END AS lall0
      |  FROM v),
      |sites AS (SELECT DISTINCT contig, vstart AS pos FROM v WHERE kind = 'site'),
      |cov AS (
      |  SELECT s.contig, s.pos, p.sample, p.kind, p.lall0, p.gq, p.dp, p.pl, p.alt, p.ref
      |  FROM sites s JOIN vp p
      |    ON p.contig = s.contig AND s.pos BETWEEN p.vstart AND p.vend),
      |merged AS (
      |  SELECT contig, pos, min(ref) AS mref,
      |    list_append(list_sort(list_distinct(list(alt))), '<NON_REF>') AS calts
      |  FROM cov WHERE kind = 'site' GROUP BY contig, pos),
      |re AS (
      |  SELECT c.contig, c.pos, c.sample, c.kind, c.gq, c.dp, c.pl, m.mref, m.calts,
      |    list_prepend(m.mref, m.calts) AS mall,
      |    list_append(c.lall0, '<NON_REF>') AS lall
      |  FROM cov c JOIN merged m ON c.contig = m.contig AND c.pos = m.pos),
      |re2 AS (
      |  SELECT *,
      |    flatten(list_transform(range(0, CAST(len(mall) AS BIGINT)),
      |      b -> list_transform(range(0, b + 1), a -> [a, b]))) AS pairs,
      |    list_transform(mall, mm ->
      |      CASE WHEN coalesce(list_position(lall, mm), 0) > 0
      |           THEN list_position(lall, mm) - 1 ELSE len(lall) - 1 END) AS limap
      |  FROM re),
      |re3 AS (
      |  SELECT *, CASE WHEN kind = 'block' OR pl IS NULL THEN
      |      list_transform(pairs, p -> coalesce(gq, 0) *
      |        ((CASE WHEN p[1] > 0 THEN 1 ELSE 0 END) + (CASE WHEN p[2] > 0 THEN 1 ELSE 0 END)))
      |    ELSE list_transform(pairs, p -> coalesce(pl[CAST(
      |      (greatest(limap[CAST(p[1] + 1 AS INT)], limap[CAST(p[2] + 1 AS INT)]) *
      |       (greatest(limap[CAST(p[1] + 1 AS INT)], limap[CAST(p[2] + 1 AS INT)]) + 1)) // 2
      |        + least(limap[CAST(p[1] + 1 AS INT)], limap[CAST(p[2] + 1 AS INT)]) + 1 AS INT)], 999999))
      |    END AS mpl
      |  FROM re2),
      |re4 AS (
      |  SELECT *, CAST(list_position(mpl, list_min(mpl)) AS INT) AS gpos,
      |    list_sort(mpl) AS spl
      |  FROM re3),
      |calls AS (
      |  SELECT contig, pos, sample, mref, calts, dp,
      |    CAST(pairs[gpos][1] AS VARCHAR) || '/' || CAST(pairs[gpos][2] AS VARCHAR) AS gt_new,
      |    least(spl[2] - spl[1], 99) AS gq_new
      |  FROM re4)""".stripMargin

  val genotypeGvcfQuery = Query(
    "q_genotype_gvcf",
    s"""WITH $duckSyntheticV,
       |$duckGenotypeCtes
       |SELECT contig, pos, mref AS ref, array_to_string(calts, ',') AS alt,
       |  CAST(count(*) AS BIGINT) AS n_samples,
       |  CAST(sum(dp) AS BIGINT) AS sum_dp,
       |  array_to_string(list(sample || ':' || gt_new || ':' || CAST(gq_new AS VARCHAR)
       |    ORDER BY sample), ';') AS calls
       |FROM calls
       |GROUP BY contig, pos, mref, calts
       |ORDER BY contig, pos""".stripMargin) { (s, d) =>
    genotypeGvcf(syntheticVariantsPl(s, cohortN(s, d)))
  }

  /** Wide-cohort GENOTYPING evidence (VERDICT r12 task #7): the SAME
    * GenotypeGVCFs pipeline as [[genotypeGvcfQuery]], but over the WIDE
    * cohort — per-site sample count = |orders|/50 (30 / 300 / 3,000 at
    * sf0.001/0.01/0.1, position axis fixed at 120), so the measured
    * cost is the per-sample PL remap at realistic cohort widths — the
    * axis commit 3f6146a had pinned at 50. The per-sample remap is
    * per-ROW expression work (no extra shuffle vs the 3-sample query:
    * width changes the site aggregate's fan-in and the remap row count,
    * never the shuffle count), so this query is the evidence that
    * genotyping scales linearly in cohort width. `calls` is md5'd on
    * BOTH engines per the q_combine_wide pattern — a 3,000-sample calls
    * cell is ~40 KB; the digest proves it value-exact without shipping
    * megabytes through the compare. */
  val genotypeWide = Query(
    "q_genotype_wide",
    s"""WITH $duckWideV,
       |$duckGenotypeCtes
       |SELECT contig, pos, mref AS ref, array_to_string(calts, ',') AS alt,
       |  CAST(count(*) AS BIGINT) AS n_samples,
       |  CAST(sum(dp) AS BIGINT) AS sum_dp,
       |  md5(array_to_string(list(sample || ':' || gt_new || ':' || CAST(gq_new AS VARCHAR)
       |    ORDER BY sample), ';')) AS calls_md5
       |FROM calls
       |GROUP BY contig, pos, mref, calts
       |ORDER BY contig, pos""".stripMargin) { (s, d) =>
    genotypeGvcf(syntheticVariantsWidePl(s, wideN(s, d)))
      .withColumn("calls_md5", md5(col("calls").cast(BinaryType)))
      .drop("calls")
  }

  /** The reference's output path (SURVEY §3.2 `load → collect →
    * string-format`): merged combine records rendered as gVCF body lines
    * `CHROM POS ID REF ALT QUAL FILTER INFO FORMAT cell…` with one
    * `GT:GQ` cell per cohort sample in [[sampleNameIndex]] order.
    * Samples not covered at a site render as the VCF missing cell
    * `./.:.` (exercised in GvcfSpec; the synthetic cohort covers every
    * sample everywhere). Pure per-row string work over [[combinedCalls]]
    * plus one broadcast of the sample list — export adds no shuffle. */
  def exportLines(variants: DataFrame, bucketWidth: Long = 64): DataFrame = {
    val samplesArr = sampleNameIndex(variants)
      .agg(sort_array(collect_list(col("sample"))).as("samples"))
    // built on combinedCalls, NOT combineSites: the export needs a
    // sample → "gt:gq" map per site, so assembling combineSites' ordered
    // call strings (plus its global sort) only to split them apart again
    // would be wasted work — build the map entries directly.
    mergedSiteAgg(combinedCalls(variants, bucketWidth),
      sort_array(collect_list(struct(col("sample").as("k"),
        coalesce(col("gq"), lit(Int.MinValue)).as("g"),
        concat(coalesce(col("gtm"), lit("./.")), lit(":"),
          coalesce(col("gq").cast(StringType), lit("."))).as("call")))).as("es"))
      // ONE row per (site, sample): a sample with two records covering
      // the same site (overlapping gVCF blocks in messy real input)
      // keeps its max-(gq, call) record via the sorted adjacent-dedup —
      // deterministic, pure post-aggregation array work, no extra
      // shuffle. NS= counts the DEDUPED entries for the same reason.
      .withColumn("esd", expr(
        "filter(es, (x, i) -> i = size(es) - 1 OR es[i + 1].k != x.k)"))
      .crossJoin(broadcast(samplesArr))
      // Per-sample calls by SORTED MERGE, not map probe: the earlier
      // shape built a per-site map and ran element_at(m, sample) for
      // every cohort sample — and Catalyst map lookup is a LINEAR scan
      // of the kv array, so each line cost O(samples²) (~4 s for 120
      // lines at a 3,000-wide cohort, ×100 at 30,000). Covered entries
      // and the uncovered samples' './.:.'  defaults are merged by
      // graft_export_cells — ONE codegen-native pass replacing the
      // 5-HOF transform/array_except/sort_array chain that evaluated
      // interpreted per line (r22); cohort order is identical because
      // `samples` was already sorted.
      .select(col("contig"), col("pos"),
        concat_ws("\t",
          col("contig"), col("pos").cast(StringType), lit("."), col("ref"), col("alt"),
          lit("."), lit("PASS"),
          concat(lit("NS="), size(col("esd")).cast(StringType)), lit("GT:GQ"),
          array_join(graft.functions.GvcfExpressions.exportCells(
            col("esd"), col("samples"), "./.:."),
            "\t")).as("line"))
  }

  /** gVCF export over the synthetic cohort; the oracle builds the
    * byte-identical lines (chr(9) = tab) from the shared combine CTEs. */
  val gvcfExport = Query(
    "q_gvcf_export",
    s"""WITH $duckCombineCtes
       |SELECT r.contig, r.pos,
       |  r.contig || chr(9) || CAST(r.pos AS VARCHAR) || chr(9) || '.' || chr(9) ||
       |  m.mref || chr(9) || array_to_string(m.calts, ',') || ',<NON_REF>' || chr(9) ||
       |  '.' || chr(9) || 'PASS' || chr(9) ||
       |  'NS=' || CAST(count(*) AS VARCHAR) || chr(9) || 'GT:GQ' || chr(9) ||
       |  array_to_string(list(r.gtm || ':' || CAST(r.gq AS VARCHAR) ORDER BY r.sample), chr(9)) AS line
       |FROM remap r JOIN merged m ON r.contig = m.contig AND r.pos = m.pos
       |GROUP BY r.contig, r.pos, m.mref, m.calts
       |ORDER BY r.contig, r.pos""".stripMargin) { (s, d) =>
    exportLines(syntheticVariants(s, cohortN(s, d))).orderBy("contig", "pos")
  }

  /** Wide-cohort EXPORT evidence (the other half of VERDICT r12 task
    * #7): [[exportLines]] over the WIDE cohort — each rendered gVCF body
    * line carries one `GT:GQ` cell per sample, so at |orders|/50 width a
    * line is ~30/300/3,000 cells (≈25 KB at sf0.1). Export stays
    * per-row string work over the combine output plus one broadcast
    * sample list — width grows the rendered string, never the shuffle
    * count. Lines md5'd on both engines (q_combine_wide pattern). */
  val exportWide = Query(
    "q_export_wide",
    s"""WITH $duckWideV,
       |$duckCombineChain
       |SELECT r.contig, r.pos,
       |  md5(r.contig || chr(9) || CAST(r.pos AS VARCHAR) || chr(9) || '.' || chr(9) ||
       |  m.mref || chr(9) || array_to_string(m.calts, ',') || ',<NON_REF>' || chr(9) ||
       |  '.' || chr(9) || 'PASS' || chr(9) ||
       |  'NS=' || CAST(count(*) AS VARCHAR) || chr(9) || 'GT:GQ' || chr(9) ||
       |  array_to_string(list(r.gtm || ':' || CAST(r.gq AS VARCHAR) ORDER BY r.sample), chr(9))) AS line_md5
       |FROM remap r JOIN merged m ON r.contig = m.contig AND r.pos = m.pos
       |GROUP BY r.contig, r.pos, m.mref, m.calts
       |ORDER BY r.contig, r.pos""".stripMargin) { (s, d) =>
    exportLines(syntheticVariantsWide(s, wideN(s, d)))
      .withColumn("line_md5", md5(col("line").cast(BinaryType)))
      .drop("line")
      .orderBy("contig", "pos")
  }

  // --------------------------------------------------------------------
  // Dense → chunked EXPORT handoff (r19, the r18-verdict ask): a rendered
  // gVCF line carries one GT:GQ cell per cohort sample, so at the 1M-
  // sample width [[exportLines]] builds an ~8 MB string inside ONE row —
  // the same width-scaling the dense combine's admission rule routes
  // around. The chunked form shards each line into fixed-width cell runs
  // (one row per (site, sample-chunk) plus one prefix row), every row
  // O(chunkSamples) regardless of cohort width; a text writer stitches
  // parts in (site, chunk_idx) order without ever materializing a line.
  // --------------------------------------------------------------------

  /** Sharded gVCF export: rows `(contig, pos, chunk_idx, part)` where
    * chunk_idx 0 is the line prefix (`CHROM POS ID REF ALT QUAL FILTER
    * INFO FORMAT`) and chunk k ≥ 1 is the tab-joined `GT:GQ` cells of
    * cohort samples `[(k−1)·chunkSamples, k·chunkSamples)` in
    * [[sampleNameIndex]] order — uncovered samples render `./.:.`
    * exactly as [[exportLines]] does. Joining a site's parts in
    * chunk_idx order with tabs reproduces the dense line byte-exactly
    * ([[linesFromChunks]] is the witness; GvcfSpec pins equality,
    * including on partial-coverage and duplicate-record fixtures).
    *
    * Scale shape: the exchanges key on (site, chunk) — site×chunk rows,
    * each bounded by chunkSamples cells — and the per-chunk sample lists
    * broadcast once (cohort-metadata scale, the same list the dense path
    * broadcasts whole). No row anywhere is O(cohort width). */
  def exportChunks(variants: DataFrame, bucketWidth: Long = 64,
      chunkSamples: Int = 10000): DataFrame = {
    require(chunkSamples >= 1, s"chunkSamples must be >= 1: $chunkSamples")
    val chunkOf = expr(s"sample_idx DIV $chunkSamples + 1")
    val chunkLists = sampleNameIndex(variants)
      .withColumn("chunk_idx", chunkOf)
      .groupBy("chunk_idx")
      .agg(sort_array(collect_list(col("sample"))).as("csamples"))
    // per-(site, chunk) covered entries with the exportLines dedup: a
    // sample's duplicate records share its sample_idx, hence its chunk,
    // so the max-(gq, call) adjacent-dedup is chunk-local by construction
    val cellEntries = combinedCalls(variants, bucketWidth)
      .withColumn("chunk_idx", chunkOf)
      .groupBy("contig", "pos", "chunk_idx")
      .agg(max(col("ref")).as("ref"),
        array_join(max(col("alts")), ",").as("alt"),
        sort_array(collect_list(struct(col("sample").as("k"),
          coalesce(col("gq"), lit(Int.MinValue)).as("g"),
          concat(coalesce(col("gtm"), lit("./.")), lit(":"),
            coalesce(col("gq").cast(StringType), lit("."))).as("call")))).as("es"))
      .withColumn("esd", expr(
        "filter(es, (x, i) -> i = size(es) - 1 OR es[i + 1].k != x.k)"))
      .select("contig", "pos", "chunk_idx", "ref", "alt", "esd")
    // site header facts ride the chunk rows (ref/alt are site-constant;
    // NS sums the deduped coverage across chunks) — chunk-count scale
    val perSite = cellEntries.groupBy("contig", "pos")
      .agg(max(col("ref")).as("ref"), max(col("alt")).as("alt"),
        sum(size(col("esd"))).as("ns"))
    val prefix = perSite.select(col("contig"), col("pos"),
      lit(0L).as("chunk_idx"),
      concat_ws("\t",
        col("contig"), col("pos").cast(StringType), lit("."), col("ref"),
        col("alt"), lit("."), lit("PASS"),
        concat(lit("NS="), col("ns").cast(StringType)), lit("GT:GQ")).as("part"))
    // every site renders EVERY chunk — a chunk with no covered sample at
    // a site (partial-coverage input) is all './.:.'  defaults
    val cells = perSite.select("contig", "pos")
      .crossJoin(broadcast(chunkLists))
      .join(cellEntries.drop("ref", "alt"), Seq("contig", "pos", "chunk_idx"), "left")
      .select(col("contig"), col("pos"), col("chunk_idx"),
        when(col("esd").isNull,
          array_join(expr("transform(csamples, n -> './.:.')"), "\t"))
          .otherwise(array_join(graft.functions.GvcfExpressions.exportCells(
            col("esd"), col("csamples"), "./.:."),
            "\t")).as("part"))
    prefix.unionByName(cells)
  }

  /** Stitch [[exportChunks]] rows back into whole lines — the equality
    * witness against [[exportLines]] (and the explicit opt-in for a
    * consumer that wants dense lines above the handoff, paying the
    * width-sized row knowingly; a file writer should instead write
    * parts sorted by (contig, pos, chunk_idx) and never materialize
    * them). Tab-joining in chunk_idx order is byte-exact because the
    * prefix ends at FORMAT and every cell run is already tab-joined. */
  def linesFromChunks(chunks: DataFrame): DataFrame =
    chunks.groupBy("contig", "pos")
      .agg(array_join(graft.functions.GvcfExpressions.sortedCallVals(
        expr("collect_list(struct(chunk_idx AS i, part AS c))")),
        "\t").as("line"))

  /** Width-dispatching export — the [[combineAuto]] admission rule
    * applied to the render path: dense whole lines ([[exportLines]]) up
    * to `maxDenseWidth` declared samples, the sharded chunk form
    * ([[exportChunks]]) above it. The decision reads table metadata on
    * the LAZY plan ([[cohortWidth]]), before any execution. */
  def exportAuto(variants: DataFrame, bucketWidth: Long = 64,
      maxDenseWidth: Long = DeriveFromHeap,
      chunkSamples: Int = 10000): AutoCombine = {
    val bound = resolveBound(variants, maxDenseWidth)
    val width = cohortWidth(variants)
    if (width <= bound)
      AutoCombine("dense", width, exportLines(variants, bucketWidth))
    else
      AutoCombine("chunked", width,
        exportChunks(variants, bucketWidth, chunkSamples))
  }

  /** The export handoff ENFORCED under the driver's gate (the
    * q_combine_auto pattern): [[exportAuto]] over the wide cohort emits
    * the admitted format as a result column; at every driver scale the
    * width is under [[MaxDenseWidth]], so the oracle pins
    * `format = 'dense'` and the [[exportWide]] line digests. The chunked
    * branch is exercised by graft.AutoExportProbe at the 334× corpus
    * (width 1,002,000 → chunked, formula-validated) and by GvcfSpec's
    * stitch-equality pins. */
  val exportAutoQuery = Query(
    "q_export_auto",
    s"""WITH $duckWideV,
       |$duckCombineChain
       |SELECT 'dense' AS format, r.contig, r.pos,
       |  md5(r.contig || chr(9) || CAST(r.pos AS VARCHAR) || chr(9) || '.' || chr(9) ||
       |  m.mref || chr(9) || array_to_string(m.calts, ',') || ',<NON_REF>' || chr(9) ||
       |  '.' || chr(9) || 'PASS' || chr(9) ||
       |  'NS=' || CAST(count(*) AS VARCHAR) || chr(9) || 'GT:GQ' || chr(9) ||
       |  array_to_string(list(r.gtm || ':' || CAST(r.gq AS VARCHAR) ORDER BY r.sample), chr(9))) AS line_md5
       |FROM remap r JOIN merged m ON r.contig = m.contig AND r.pos = m.pos
       |GROUP BY r.contig, r.pos, m.mref, m.calts
       |ORDER BY r.contig, r.pos""".stripMargin) { (s, d) =>
    // fixed cap for the same reason as q_combine_auto: the gate's
    // format/schema must not depend on the gate runner's heap
    val auto = exportAuto(syntheticVariantsWide(s, wideN(s, d)),
      maxDenseWidth = MaxDenseWidth)
    auto.format match {
      case "dense" => auto.df
        .withColumn("line_md5", md5(col("line").cast(BinaryType)))
        .drop("line")
        .select(lit("dense").as("format"), col("*"))
        .orderBy("contig", "pos")
      // width-free chunk rows — reached only above MaxDenseWidth, where
      // no oracle runs (the probe corpus); kept schema-stable per route
      case _ => auto.df
        .withColumn("part_md5", md5(col("part").cast(BinaryType)))
        .drop("part")
        .select(lit("chunked").as("format"), col("*"))
        .orderBy("contig", "pos", "chunk_idx")
    }
  }

  /** The gVCF HEADER for [[exportLines]] — the piece that makes the
    * export a LOADABLE file (`##contig` extents and `##FORMAT`
    * declarations; the reference carries this context in its encoder,
    * `HBaseVariantContextEncoder.java:~25 (unverified)`). Everything is
    * derived deterministically FROM THE DATA: contig lengths are the
    * observed per-contig max(end), the sample columns are the sorted
    * cohort samples. Output is (ord, line) so the caller can
    * `orderBy(ord)` and prepend to the body. Metadata-scale aggregates
    * only — the single-partition row_number window runs over
    * #contigs rows, never data. */
  def exportHeader(variants: DataFrame): DataFrame = {
    import variants.sparkSession.implicits._
    val fixed = Seq(
      (0L, "##fileformat=VCFv4.2"),
      (1L, """##INFO=<ID=NS,Number=1,Type=Integer,Description="Number of samples">"""),
      (2L, """##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">"""),
      (3L, """##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype quality">""")
    ).toDF("ord", "line")
    // partitioned on a CONSTANT bucket (one partition, #contigs rows) so
    // the `No Partition Defined` warning channel stays clean (r13
    // verdict #5; a plain literal is folded back out by Spark 4's
    // EliminateWindowPartitions, hence the non-foldable pmod)
    val contigs = variants.groupBy("contig").agg(max(col("end")).as("mx"))
      .withColumn("ord", lit(100L) + row_number().over(
        Window.partitionBy(pmod(length(col("contig")), lit(1))).orderBy("contig")))
      .select(col("ord"),
        concat(lit("##contig=<ID="), col("contig"),
          lit(",length="), col("mx").cast(StringType), lit(">")).as("line"))
    // Long.MaxValue, not a round constant: the #CHROM line must sort
    // after EVERY ##contig line (ord 100+rank), and real references
    // carry thousands of contigs/scaffolds — a cap like 1000 would let
    // contig lines leak past the column header and break loadability.
    val samplesLine = sampleNameIndex(variants)
      .agg(sort_array(collect_list(col("sample"))).as("ss"))
      .select(lit(Long.MaxValue).as("ord"),
        concat(lit("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"),
          array_join(col("ss"), "\t")).as("line"))
    fixed.unionByName(contigs).unionByName(samplesLine).orderBy("ord")
  }

  /** Header emission over the synthetic cohort; the oracle rebuilds the
    * byte-identical lines from the same data extents. */
  val gvcfHeader = Query(
    "q_gvcf_header",
    s"""WITH $duckSyntheticV,
       |c AS (
       |  SELECT contig, max(vend) AS mx,
       |    CAST(row_number() OVER (ORDER BY contig) AS BIGINT) AS rn
       |  FROM v GROUP BY contig),
       |smp AS (
       |  SELECT array_to_string(list(sample ORDER BY sample), chr(9)) AS s
       |  FROM (SELECT DISTINCT sample FROM v)),
       |h AS (
       |  SELECT 0 AS ord, '##fileformat=VCFv4.2' AS line
       |  UNION ALL SELECT 1, '##INFO=<ID=NS,Number=1,Type=Integer,Description="Number of samples">'
       |  UNION ALL SELECT 2, '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">'
       |  UNION ALL SELECT 3, '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype quality">'
       |  UNION ALL SELECT 100 + rn, '##contig=<ID=' || contig || ',length=' || CAST(mx AS VARCHAR) || '>' FROM c
       |  UNION ALL SELECT 9223372036854775807,
       |    '#CHROM' || chr(9) || 'POS' || chr(9) || 'ID' || chr(9) || 'REF' || chr(9) ||
       |    'ALT' || chr(9) || 'QUAL' || chr(9) || 'FILTER' || chr(9) || 'INFO' || chr(9) ||
       |    'FORMAT' || chr(9) || s FROM smp)
       |SELECT CAST(ord AS BIGINT) AS ord, line FROM h
       |ORDER BY ord""".stripMargin) { (s, d) =>
    exportHeader(syntheticVariants(s, cohortN(s, d)))
  }

  /** Dense sample-name index as an oracle-backed query: the index joined
    * back against the cohort with per-sample extents. */
  val sampleIndexQuery = Query(
    "q_sample_index",
    s"""WITH $duckSyntheticV,
       |idx AS (
       |  SELECT sample, CAST(row_number() OVER (ORDER BY sample) - 1 AS BIGINT) AS sample_idx
       |  FROM (SELECT DISTINCT sample FROM v))
       |SELECT v.sample, idx.sample_idx, count(*) AS n_records,
       |  CAST(min(v.vstart) AS BIGINT) AS min_start,
       |  CAST(max(v.vend) AS BIGINT) AS max_end
       |FROM v JOIN idx ON v.sample = idx.sample
       |GROUP BY v.sample, idx.sample_idx
       |ORDER BY idx.sample_idx""".stripMargin) { (s, d) =>
    val v = syntheticVariants(s, cohortN(s, d))
    v.join(broadcast(sampleNameIndex(v)), "sample")
      .groupBy("sample", "sample_idx")
      .agg(count(lit(1)).as("n_records"),
        min(col("start")).cast(LongType).as("min_start"),
        max(col("end")).cast(LongType).as("max_end"))
      .orderBy("sample_idx")
  }

  /** Per-site allele statistics over the merged records — the
    * GenotypeGVCFs-style AC/AN accounting downstream of combine: for
    * every merged site and every called alt-allele index, the allele
    * count (AC) and the total called allele number (AN = 2 × covered
    * samples; the synthetic cohort is fully diploid-called). Pure
    * explode + count over [[combineSites]] output — one extra narrow
    * aggregate after the combine's own shuffle. */
  def siteAlleleStats(variants: DataFrame, bucketWidth: Long = 64): DataFrame =
    // built on combinedCalls, NOT combineSites: the stats need the
    // remapped genotypes, not the assembled per-site call strings — going
    // through combineSites would pay its global sort and then re-parse
    // the very strings it just concatenated. collect_list skips null
    // gtm (missing call) rows; they still count toward AN, as before.
    combinedCalls(variants, bucketWidth)
      .groupBy("contig", "pos")
      .agg(max(col("alts")).as("alts"),
        (count(lit(1)) * 2).as("an"),
        flatten(collect_list(split(col("gtm"), "/"))).as("gs"))
      .select(col("contig"), col("pos"), col("alts"), col("an"),
        explode(col("gs")).as("g"))
      .filter(col("g") =!= "0" && col("g") =!= "." &&
        expr("try_cast(g AS BIGINT)").isNotNull)
      .groupBy(col("contig"), col("pos"),
        expr("try_cast(g AS BIGINT)").as("alt_idx"))
      .agg(max(col("alts")).as("alts"), max(col("an")).as("an"),
        count(lit(1)).as("ac"))
      .select(col("contig"), col("pos"), col("alt_idx"),
        expr("try_element_at(alts, CAST(alt_idx AS INT))").as("alt"),
        col("ac"), col("an"))
      .orderBy("contig", "pos", "alt_idx")

  /** AC/AN oracle: replays the merged-genotype CTEs, unnests genotype
    * entries, and counts non-reference calls per allele index. */
  val siteStats = Query(
    "q_site_stats",
    s"""WITH $duckCombineCtes,
       |an AS (SELECT contig, pos, 2 * count(*) AS an FROM remap GROUP BY contig, pos),
       |gt AS (
       |  SELECT r.contig, r.pos, CAST(g AS BIGINT) AS alt_idx, m.calts
       |  FROM remap r JOIN merged m ON r.contig = m.contig AND r.pos = m.pos,
       |       unnest(string_split(r.gtm, '/')) AS t(g)
       |  WHERE g <> '0' AND g <> '.')
       |SELECT gt.contig, gt.pos, gt.alt_idx,
       |  CASE WHEN gt.alt_idx <= len(gt.calts) THEN gt.calts[CAST(gt.alt_idx AS INT)]
       |       ELSE '<NON_REF>' END AS alt,
       |  count(*) AS ac, CAST(min(an.an) AS BIGINT) AS an
       |FROM gt JOIN an ON gt.contig = an.contig AND gt.pos = an.pos
       |GROUP BY gt.contig, gt.pos, gt.alt_idx, alt
       |ORDER BY gt.contig, gt.pos, gt.alt_idx""".stripMargin) { (s, d) =>
    siteAlleleStats(syntheticVariants(s, cohortN(s, d)))
  }

  /** GQ-band block merging as an oracle-backed query: a synthetic
    * all-blocks cohort with touching runs (record j of a sample spans
    * [10j+1, 10j+10], so consecutive records touch) whose GQ drifts
    * across band boundaries — [[mergeAdjacentBlocks]] must collapse
    * exactly the same-band runs the oracle's gaps-and-islands window
    * finds. Output: per merged block (sample, contig, start, end,
    * band-min GQ). */
  val mergeBands = Query(
    "q_merge_bands",
    s"""WITH $duckG,
      |v AS (
      |  SELECT 's' || CAST(i % 3 AS VARCHAR) AS sample,
      |    'chr' || CAST(1 + (i // 600) AS VARCHAR) AS contig,
      |    ((i // 3) % 200) * 10 + 1 AS vstart,
      |    ((i // 3) % 200) * 10 + 10 AS vend,
      |    CAST(((i // 3) * 7 + (i % 3) * 13) % 90 + 10 AS INT) AS gq
      |  FROM g),
      |banded AS (
      |  SELECT *, CASE WHEN gq < 20 THEN 0 WHEN gq < 60 THEN 1 ELSE 2 END AS band
      |  FROM v),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(vend) OVER w IS NULL
      |                   OR vstart <> lag(vend) OVER w + 1
      |                   OR band <> lag(band) OVER w THEN 1 ELSE 0 END AS new_grp
      |  FROM banded
      |  WINDOW w AS (PARTITION BY sample, contig ORDER BY vstart)),
      |grp AS (
      |  SELECT *, sum(new_grp) OVER (PARTITION BY sample, contig ORDER BY vstart
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp_id
      |  FROM flagged)
      |SELECT sample, contig, CAST(min(vstart) AS BIGINT) AS start,
      |  CAST(max(vend) AS BIGINT) AS "end", CAST(min(gq) AS BIGINT) AS gq
      |FROM grp GROUP BY sample, contig, grp_id
      |ORDER BY sample, contig, start""".stripMargin) { (s, d) =>
    val blocks = s.range(0, cohortN(s, d), 1, sizedParts(cohortN(s, d)))
      .selectExpr(
      "concat('s', id % 3) AS sample",
      "concat('chr', 1 + (id div 600)) AS contig",
      "((id div 3) % 200) * 10 + 1 AS start",
      "((id div 3) % 200) * 10 + 10 AS end",
      "'block' AS kind",
      "array('REF') AS alleles",
      "CAST(((id div 3) * 7 + (id % 3) * 13) % 90 + 10 AS INT) AS gq")
    mergeAdjacentBlocks(blocks)
      .select(col("sample"), col("contig"), col("start").cast(LongType).as("start"),
        col("end").cast(LongType).as("end"), col("gq").cast(LongType).as("gq"))
      .orderBy("sample", "contig", "start")
  }

  /** GQ re-banding of the MERGED cohort stream — the GVCFWriter banding
    * step on the reference's output path (`GVCFHBase.java:~120
    * (unverified)`): where [[mergeAdjacentBlocks]] bands each sample's
    * input blocks, this bands the COMBINED reference stream by
    * min-GQ-over-samples. Pipeline:
    *   1. elementary segmentation — every block start and end+1 is a
    *      boundary, so any block overlapping a segment covers it
    *      entirely;
    *   2. bucketed containment join (the A6 grid — equi-join +
    *      residual, never a nested loop) → per-segment cohort-min GQ;
    *   3. band by the standard GQ bands and coalesce TOUCHING same-band
    *      segments (gaps-and-islands), carrying the band-min GQ.
    * O(records) segments end to end; the per-contig windows are the
    * same shape as [[coverageHistogram]] — at 100 TB you'd range-
    * partition within contig, the plan is otherwise unchanged. */
  def rebandMerged(variants: DataFrame, bucketWidth: Long = 64): DataFrame = {
    val blocks = variants.filter(col("kind") === "block")
      .select("contig", "start", "end", "sample", "gq")
    val bounds = blocks.select(col("contig"), col("start").as("p"))
      .unionAll(blocks.select(col("contig"), (col("end") + 1).as("p")))
      .distinct()
    val wB = Window.partitionBy("contig").orderBy("p")
    val segs = bounds
      .withColumn("hi", lead(col("p"), 1).over(wB) - 1)
      .filter(col("hi").isNotNull)
      .select(col("contig"), col("p").as("lo"), col("hi"))
    val recs = blocks.withColumn("bkt", explode(sequence(
      expr(s"start div $bucketWidth"), expr(s"end div $bucketWidth"))))
    val probe = segs.withColumn("bkt", expr(s"lo div $bucketWidth"))
    // uncovered segments drop here (inner join), which also breaks
    // band runs across coverage gaps in the islands pass below
    val covered = probe.join(recs, Seq("contig", "bkt"))
      .filter(col("lo") >= col("start") && col("lo") <= col("end"))
      .groupBy("contig", "lo", "hi")
      .agg(min(col("gq")).as("mgq"))
    val w = Window.partitionBy("contig").orderBy("lo")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val newGrp = when(lag(col("hi"), 1).over(w).isNull ||
      col("lo") =!= lag(col("hi"), 1).over(w) + 1 ||
      col("band") =!= lag(col("band"), 1).over(w), 1).otherwise(0)
    covered
      .withColumn("band", when(col("mgq") < 20, 0L).when(col("mgq") < 60, 1L).otherwise(2L))
      .withColumn("grp", sum(newGrp).over(run))
      .groupBy("contig", "grp", "band")
      .agg(min(col("lo")).as("start"), max(col("hi")).as("end"),
        min(col("mgq")).cast(LongType).as("gq"))
      .select("contig", "start", "end", "band", "gq")
      .orderBy("contig", "start")
  }

  /** Re-banding over a cohort whose per-sample block EXTENTS differ
    * (sample k's block j ends k early), so elementary segments see
    * varying coverage and the min-GQ genuinely changes within a block
    * run; the oracle replays segmentation + banding in window SQL. */
  val rebandMergedQuery = Query(
    "q_reband_merged",
    s"""WITH $duckG,
      |v AS (
      |  SELECT 's' || CAST(i % 3 AS VARCHAR) AS sample,
      |    'chr' || CAST(1 + (i // 600) AS VARCHAR) AS contig,
      |    ((i // 3) % 200) * 10 + 1 AS vstart,
      |    ((i // 3) % 200) * 10 + 10 - i % 3 AS vend,
      |    CAST(((i // 3) * 7 + (i % 3) * 13) % 90 + 10 AS INT) AS gq
      |  FROM g),
      |b AS (
      |  SELECT DISTINCT contig, vstart AS p FROM v
      |  UNION SELECT DISTINCT contig, vend + 1 FROM v),
      |sg AS (
      |  SELECT contig, p AS lo,
      |    lead(p) OVER (PARTITION BY contig ORDER BY p) - 1 AS hi
      |  FROM b),
      |cov AS (
      |  SELECT s.contig, s.lo, s.hi, min(v.gq) AS mgq
      |  FROM sg s JOIN v ON v.contig = s.contig AND s.lo BETWEEN v.vstart AND v.vend
      |  WHERE s.hi IS NOT NULL
      |  GROUP BY s.contig, s.lo, s.hi),
      |banded AS (
      |  SELECT *, CASE WHEN mgq < 20 THEN 0 WHEN mgq < 60 THEN 1 ELSE 2 END AS band
      |  FROM cov),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(hi) OVER w IS NULL OR lo <> lag(hi) OVER w + 1
      |                   OR band <> lag(band) OVER w THEN 1 ELSE 0 END AS new_grp
      |  FROM banded
      |  WINDOW w AS (PARTITION BY contig ORDER BY lo)),
      |grp AS (
      |  SELECT *, sum(new_grp) OVER (PARTITION BY contig ORDER BY lo
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp_id
      |  FROM flagged)
      |SELECT contig, CAST(min(lo) AS BIGINT) AS start,
      |  CAST(max(hi) AS BIGINT) AS "end",
      |  CAST(band AS BIGINT) AS band, CAST(min(mgq) AS BIGINT) AS gq
      |FROM grp GROUP BY contig, grp_id, band
      |ORDER BY contig, start""".stripMargin) { (s, d) =>
    val blocks = s.range(0, cohortN(s, d), 1, sizedParts(cohortN(s, d)))
      .selectExpr(
      "concat('s', id % 3) AS sample",
      "concat('chr', 1 + (id div 600)) AS contig",
      "((id div 3) % 200) * 10 + 1 AS start",
      "((id div 3) % 200) * 10 + 10 - id % 3 AS end",
      "'block' AS kind", "array('REF') AS alleles",
      "CAST(((id div 3) * 7 + (id % 3) * 13) % 90 + 10 AS INT) AS gq")
    rebandMerged(blocks)
  }

  /** Depth-of-coverage histogram (samtools-depth / GATK DepthOfCoverage
    * analog) WITHOUT per-base explosion: each record contributes a +1
    * event at `start` and a -1 event at `end + 1`; a per-contig running
    * sum over the deduplicated event positions yields piecewise-constant
    * depth, and the segment length to the next event weights the
    * histogram. O(records) rows end to end — at 100 TB the only shuffles
    * are the event groupBy and the contig-partitioned window, never the
    * O(genome-length) base table a naive sequence-explode would build. */
  def coverageHistogram(variants: DataFrame): DataFrame = {
    val events = variants
      .select(col("contig"), col("start").as("pos"), lit(1L).as("delta"))
      .unionAll(variants.select(
        col("contig"), (col("end") + 1).as("pos"), lit(-1L).as("delta")))
    val byPos = events.groupBy("contig", "pos").agg(sum("delta").as("delta"))
    val w = Window.partitionBy("contig").orderBy("pos")
    byPos
      .withColumn("depth", sum(col("delta"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("seg", lead(col("pos"), 1).over(w) - col("pos"))
      .filter(col("depth") > 0 && col("seg").isNotNull)
      .groupBy("contig", "depth")
      .agg(sum("seg").as("bases"))
      .orderBy("contig", "depth")
  }

  /** Coverage histogram over the synthetic cohort; the oracle replays the
    * identical sweep-line in DuckDB window SQL. */
  val coverageHist = Query(
    "q_coverage_hist",
    s"""WITH $duckSyntheticV,
       |ev AS (
       |  SELECT contig, vstart AS pos, 1 AS delta FROM v
       |  UNION ALL
       |  SELECT contig, vend + 1 AS pos, -1 AS delta FROM v),
       |byp AS (SELECT contig, pos, sum(delta) AS delta FROM ev GROUP BY contig, pos),
       |seg AS (
       |  SELECT contig, pos,
       |    sum(delta) OVER (PARTITION BY contig ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS depth,
       |    lead(pos) OVER (PARTITION BY contig ORDER BY pos) - pos AS seg
       |  FROM byp)
       |SELECT contig, CAST(depth AS BIGINT) AS depth, CAST(sum(seg) AS BIGINT) AS bases
       |FROM seg WHERE depth > 0 AND seg IS NOT NULL
       |GROUP BY contig, depth
       |ORDER BY contig, depth""".stripMargin) { (s, d) =>
    coverageHistogram(syntheticVariants(s, cohortN(s, d)))
  }

  /** Transition/transversion QC counts per contig over the distinct site
    * alleles (the standard variant-call quality metric). The ratio is
    * emitted as integer ppm (`ti * 1e6 div tv`) so the output is exact in
    * both engines — no float division in the result schema. */
  def tiTvByContig(variants: DataFrame): DataFrame = {
    val sites = variants.filter(col("kind") === "site")
      .select(col("contig"), col("start").as("pos"),
        col("alleles")(0).as("ref"), col("alleles")(1).as("alt"))
      .distinct()
    val isTransition =
      col("ref").isin("A", "G") === col("alt").isin("A", "G")
    sites
      .groupBy("contig")
      .agg(
        sum(when(isTransition, 1L).otherwise(0L)).as("ti"),
        sum(when(isTransition, 0L).otherwise(1L)).as("tv"))
      .withColumn("ratio_ppm", expr("ti * 1000000 div tv"))
      .orderBy("contig")
  }

  val tiTv = Query(
    "q_titv",
    s"""WITH $duckSyntheticV,
       |s AS (SELECT DISTINCT contig, vstart AS pos, ref, alt FROM v WHERE kind = 'site'),
       |c AS (
       |  SELECT contig,
       |    CAST(sum(CASE WHEN (ref IN ('A','G')) = (alt IN ('A','G')) THEN 1 ELSE 0 END) AS BIGINT) AS ti,
       |    CAST(sum(CASE WHEN (ref IN ('A','G')) = (alt IN ('A','G')) THEN 0 ELSE 1 END) AS BIGINT) AS tv
       |  FROM s GROUP BY contig)
       |SELECT contig, ti, tv, ti * 1000000 // tv AS ratio_ppm
       |FROM c ORDER BY contig""".stripMargin) { (s, d) =>
    tiTvByContig(syntheticVariants(s, cohortN(s, d)))
  }

  /** Per-(sample, contig) covered breadth: union the sample's intervals
    * (gaps-and-islands — a new island starts where `start` exceeds the
    * running max of previous ends + 1, so overlapping AND merely-adjacent
    * records coalesce), then sum island extents. The window partitions on
    * (sample, contig) — bounded state per key, no all-pairs work. */
  def sampleBreadth(variants: DataFrame): DataFrame = {
    val w = Window.partitionBy("sample", "contig").orderBy("start", "end")
    val maxPrevEnd = max(col("end"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val newIsland =
      when(maxPrevEnd.isNull || col("start") > maxPrevEnd + 1, 1L).otherwise(0L)
    variants
      .withColumn("island", sum(newIsland)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("sample", "contig", "island")
      .agg(min(col("start")).as("lo"), max(col("end")).as("hi"))
      .groupBy("sample", "contig")
      .agg(sum(col("hi") - col("lo") + 1).as("breadth"),
        count(lit(1)).as("n_islands"))
      .orderBy("sample", "contig")
  }

  val breadth = Query(
    "q_sample_breadth",
    s"""WITH $duckSyntheticV,
       |isl AS (
       |  SELECT sample, contig, vstart, vend,
       |    CASE WHEN max(vend) OVER wp IS NULL
       |           OR vstart > max(vend) OVER wp + 1 THEN 1 ELSE 0 END AS new_island
       |  FROM v
       |  WINDOW wp AS (PARTITION BY sample, contig ORDER BY vstart, vend
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |grp AS (
       |  SELECT *, sum(new_island) OVER (PARTITION BY sample, contig
       |    ORDER BY vstart, vend
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM isl),
       |ext AS (
       |  SELECT sample, contig, island, min(vstart) AS lo, max(vend) AS hi
       |  FROM grp GROUP BY sample, contig, island)
       |SELECT sample, contig, CAST(sum(hi - lo + 1) AS BIGINT) AS breadth,
       |  CAST(count(*) AS BIGINT) AS n_islands
       |FROM ext GROUP BY sample, contig
       |ORDER BY sample, contig""".stripMargin) { (s, d) =>
    sampleBreadth(syntheticVariants(s, cohortN(s, d)))
  }

  /** Trio Mendelian-violation counts (s0 = child, s1/s2 = parents) over
    * the MERGED calls: a site is consistent iff the child's alleles can
    * be drawn one from each parent (either assignment order — unphased
    * genotypes). Runs on [[combinedCalls]] so multi-allelic sites are
    * compared in merged index space; the pivot is a 6-column conditional
    * aggregate, one shuffle on the site key. */
  def mendelViolations(variants: DataFrame): DataFrame = {
    // ONE validated typed-genotype column up front: split + try_cast
    // once into an INT array (a no-call './.' or malformed token yields
    // null entries — the site just can't be checked — instead of an
    // ANSI cast/index error), then cheap element reads. One transform
    // per row instead of two independent split+cast chains.
    val al = combinedCalls(variants)
      .select(col("contig"), col("pos"), col("sample"),
        expr("transform(split(gtm, '/'), g -> try_cast(g AS INT))").as("ga"))
      .select(col("contig"), col("pos"), col("sample"),
        expr("try_element_at(ga, 1)").as("a1"),
        expr("try_element_at(ga, 2)").as("a2"))
    def pick(s: String, c: String) = max(when(col("sample") === s, col(c)))
    val trio = al.groupBy("contig", "pos").agg(
      pick("s0", "a1").as("c1"), pick("s0", "a2").as("c2"),
      pick("s1", "a1").as("p1a"), pick("s1", "a2").as("p1b"),
      pick("s2", "a1").as("p2a"), pick("s2", "a2").as("p2b"))
    val fromP1 = (col("c1") === col("p1a") || col("c1") === col("p1b")) &&
      (col("c2") === col("p2a") || col("c2") === col("p2b"))
    val fromP2 = (col("c1") === col("p2a") || col("c1") === col("p2b")) &&
      (col("c2") === col("p1a") || col("c2") === col("p1b"))
    trio
      .withColumn("viol", when(fromP1 || fromP2, 0L).otherwise(1L))
      .groupBy("contig")
      .agg(count(lit(1)).as("n_sites"), sum(col("viol")).as("n_violations"))
      .orderBy("contig")
  }

  val mendel = Query(
    "q_mendel",
    s"""WITH $duckCombineCtes,
       |al AS (
       |  SELECT contig, pos, sample,
       |    CAST(string_split(gtm, '/')[1] AS INT) AS a1,
       |    CAST(string_split(gtm, '/')[2] AS INT) AS a2
       |  FROM remap),
       |trio AS (
       |  SELECT contig, pos,
       |    max(CASE WHEN sample = 's0' THEN a1 END) AS c1,
       |    max(CASE WHEN sample = 's0' THEN a2 END) AS c2,
       |    max(CASE WHEN sample = 's1' THEN a1 END) AS p1a,
       |    max(CASE WHEN sample = 's1' THEN a2 END) AS p1b,
       |    max(CASE WHEN sample = 's2' THEN a1 END) AS p2a,
       |    max(CASE WHEN sample = 's2' THEN a2 END) AS p2b
       |  FROM al GROUP BY contig, pos),
       |j AS (
       |  SELECT contig,
       |    CASE WHEN ((c1 = p1a OR c1 = p1b) AND (c2 = p2a OR c2 = p2b))
       |           OR ((c1 = p2a OR c1 = p2b) AND (c2 = p1a OR c2 = p1b))
       |         THEN 0 ELSE 1 END AS viol
       |  FROM trio)
       |SELECT contig, CAST(count(*) AS BIGINT) AS n_sites,
       |  CAST(sum(viol) AS BIGINT) AS n_violations
       |FROM j GROUP BY contig ORDER BY contig""".stripMargin) { (s, d) =>
    mendelViolations(syntheticVariants(s, cohortN(s, d)))
  }

  /** Genotype concordance (GATK GenotypeConcordance shape): callset B is
    * a deterministic perturbation of the cohort's site calls (every
    * (j + k) % 7 == 0 call het↔hom flipped); the output is the
    * genotype-by-genotype confusion matrix — one groupBy on the matrix
    * cell, callsets joined on the (contig, pos, sample) call key. */
  val concordance = Query(
    "q_concordance",
    s"""WITH $duckSyntheticV,
       |sa AS (SELECT contig, vstart AS pos, sample, gt FROM v WHERE kind = 'site'),
       |sb AS (
       |  SELECT contig, pos, sample,
       |    CASE WHEN (pos // 10 + CAST(substr(sample, 2, 1) AS INT)) % 7 = 0
       |         THEN (CASE WHEN gt = '0/1' THEN '1/1' ELSE '0/1' END)
       |         ELSE gt END AS gt_b
       |  FROM sa)
       |SELECT a.gt AS gt_a, b.gt_b AS gt_b, CAST(count(*) AS BIGINT) AS n
       |FROM sa a JOIN sb b
       |  ON a.contig = b.contig AND a.pos = b.pos AND a.sample = b.sample
       |GROUP BY a.gt, b.gt_b
       |ORDER BY gt_a, gt_b""".stripMargin) { (s, d) =>
    val sa = syntheticVariants(s, cohortN(s, d)).filter(col("kind") === "site")
      .select(col("contig"), col("start").as("pos"), col("sample"), col("gt"))
    val sb = sa.withColumn("gt_b",
      when(expr("(pos div 10 + CAST(substring(sample, 2, 1) AS INT)) % 7 = 0"),
        when(col("gt") === "0/1", "1/1").otherwise("0/1"))
        .otherwise(col("gt")))
      .drop("gt")
    sa.join(sb, Seq("contig", "pos", "sample"))
      .groupBy(col("gt").as("gt_a"), col("gt_b"))
      .agg(count(lit(1)).as("n"))
      .orderBy("gt_a", "gt_b")
  }

  /** Coverage GAPS (callable-regions complement): within each contig's
    * observed [min(start), max(end)] span, the maximal intervals covered
    * by NO record — the same interval-union islands as [[sampleBreadth]]
    * but pooled across samples and inverted (island k's end + 1 up to
    * island k+1's start - 1). O(records), no per-base work. */
  def coverageGaps(variants: DataFrame): DataFrame = {
    val w = Window.partitionBy("contig").orderBy("start", "end")
    val maxPrevEnd = max(col("end"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val newIsland =
      when(maxPrevEnd.isNull || col("start") > maxPrevEnd + 1, 1L).otherwise(0L)
    val islands = variants
      .withColumn("island", sum(newIsland)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("contig", "island")
      .agg(min(col("start")).as("lo"), max(col("end")).as("hi"))
    val wI = Window.partitionBy("contig").orderBy("lo")
    islands
      .withColumn("next_lo", lead(col("lo"), 1).over(wI))
      .filter(col("next_lo").isNotNull && col("next_lo") > col("hi") + 1)
      .select(col("contig"), (col("hi") + 1).as("gap_start"),
        (col("next_lo") - 1).as("gap_end"))
      .orderBy("contig", "gap_start")
  }

  /** Gaps over a sparse synthetic cohort (every third j missing entirely,
    * so real holes exist); the oracle replays islands + complement. */
  val covGaps = Query(
    "q_coverage_gaps",
    s"""WITH $duckG,
      |v AS (
      |  SELECT 'chr' || CAST(1 + (i // 3) % 2 AS VARCHAR) AS contig,
      |    (i // 3) * 30 + 1 AS vstart, (i // 3) * 30 + 10 + (i % 3) AS vend
      |  FROM g WHERE (i // 3) % 3 <> 1),
      |isl AS (
      |  SELECT contig, vstart, vend,
      |    CASE WHEN max(vend) OVER wp IS NULL
      |           OR vstart > max(vend) OVER wp + 1 THEN 1 ELSE 0 END AS new_island
      |  FROM v
      |  WINDOW wp AS (PARTITION BY contig ORDER BY vstart, vend
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |grp AS (
      |  SELECT *, sum(new_island) OVER (PARTITION BY contig ORDER BY vstart, vend
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM isl),
      |ext AS (
      |  SELECT contig, island, min(vstart) AS lo, max(vend) AS hi
      |  FROM grp GROUP BY contig, island),
      |nxt AS (
      |  SELECT contig, hi, lead(lo) OVER (PARTITION BY contig ORDER BY lo) AS next_lo
      |  FROM ext)
      |SELECT contig, CAST(hi + 1 AS BIGINT) AS gap_start,
      |  CAST(next_lo - 1 AS BIGINT) AS gap_end
      |FROM nxt WHERE next_lo IS NOT NULL AND next_lo > hi + 1
      |ORDER BY contig, gap_start""".stripMargin) { (s, d) =>
    val v = s.range(0, cohortN(s, d), 1, sizedParts(cohortN(s, d)))
      .filter(expr("(id div 3) % 3 <> 1"))
      .selectExpr(
        "concat('s', id % 3) AS sample",
        "concat('chr', 1 + (id div 3) % 2) AS contig",
        "(id div 3) * 30 + 1 AS start",
        "(id div 3) * 30 + 10 + id % 3 AS end",
        "'block' AS kind", "array('REF') AS alleles", "CAST(50 AS INT) AS gq")
    coverageGaps(v)
      .select(col("contig"), col("gap_start").cast(LongType).as("gap_start"),
        col("gap_end").cast(LongType).as("gap_end"))
      .orderBy("contig", "gap_start")
  }

  /** Pairwise interval intersection (bedtools-intersect shape): for each
    * unordered sample pair and contig, the total overlapped length and
    * pair count of their reference-block intervals. The Spark side is
    * the BUCKETED interval join (A6/A7 machinery): intervals explode to
    * the stride buckets they span, pairs equi-join on (contig, bucket),
    * and each pair is counted exactly once — in the bucket holding
    * max(start_a, start_b) — so no dedup shuffle is needed. The oracle
    * is the plain quadratic θ-join (fine at fixture scale, never run on
    * Spark's side). At 100 TB the equi-join shuffles on the bucketed
    * key like any fact-fact join; bucket width trades fan-out for
    * per-bucket pair volume. */
  val intervalOverlap = Query(
    "q_interval_overlap",
    // the cohort assigns each position-group's block to exactly one
    // sample, so raw blocks never overlap across samples; extend each
    // block by 15 so same-contig neighboring groups' blocks (different owners) do —
    // the same extension on both engines keeps the oracle exact
    s"""WITH $duckSyntheticV,
       |blk AS (SELECT sample, contig, vstart, vend + 15 AS vend FROM v
       |        WHERE kind = 'block')
       |SELECT a.sample AS sample_a, b.sample AS sample_b, a.contig,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(least(a.vend, b.vend) - greatest(a.vstart, b.vstart) + 1) AS BIGINT)
       |    AS overlap_len
       |FROM blk a JOIN blk b
       |  ON a.contig = b.contig AND a.sample < b.sample
       | AND a.vstart <= b.vend AND b.vstart <= a.vend
       |GROUP BY sample_a, sample_b, a.contig
       |ORDER BY sample_a, sample_b, a.contig""".stripMargin) { (s, d) =>
    val w = 64L
    val blocks = syntheticVariants(s, cohortN(s, d)).filter(col("kind") === "block")
      .select(col("sample"), col("contig"), col("start"),
        (col("end") + 15).as("end"))
    def bucketed(side: String) = blocks
      .withColumn("bucket",
        explode(sequence(expr(s"start div $w"), expr(s"end div $w"))))
      .select(col("sample").as(s"sample_$side"), col("contig"), col("bucket"),
        col("start").as(s"start_$side"), col("end").as(s"end_$side"))
    bucketed("a").join(bucketed("b"), Seq("contig", "bucket"))
      .filter(col("sample_a") < col("sample_b") &&
        col("start_a") <= col("end_b") && col("start_b") <= col("end_a") &&
        col("bucket") === expr(s"greatest(start_a, start_b) div $w"))
      .groupBy("sample_a", "sample_b", "contig")
      .agg(count(lit(1)).as("n_pairs"),
        sum(least(col("end_a"), col("end_b")) -
          greatest(col("start_a"), col("start_b")) + 1).as("overlap_len"))
      .orderBy("sample_a", "sample_b", "contig")
  }

  val queries: Seq[Query] =
    Seq(combineMerge, sampleIndexQuery, gvcfExport, siteStats, mergeBands,
      coverageHist, tiTv, breadth, mendel, concordance, covGaps,
      intervalOverlap, genotypeGvcfQuery, gvcfHeader, rebandMergedQuery,
      combineIncremental, combineWide, genotypeWide, exportWide,
      combineAutoQuery, exportAutoQuery)
}
