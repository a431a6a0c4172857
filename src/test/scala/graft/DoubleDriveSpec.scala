package graft

import org.apache.spark.sql.DataFrame

/** The run-twice gate: every query that writes persistent scratch state
  * (a store directory, a format round-trip dir, a build-once index or
  * cache) is executed TWICE in one session and must return bit-identical
  * rows. This is exactly the driver's own schedule — Bench runs the
  * suite, then Verify runs it again in a fresh process against the SAME
  * temp/cache directories — and it is the schedule that caught the r15
  * `q_sink_store` regression: the deferred-vacuum truncate commit
  * RETIRES the previous generation's files in place, so any read-back
  * that lists the directory instead of the manifest double-counts rows
  * on the second drive. A second-run divergence here means the query's
  * read path depends on filesystem state its own write path does not
  * own — the failure class no single-run oracle can see.
  *
  * Cells are canonicalized by raw IEEE bits (PartitionInvarianceSpec's
  * rule) and compared as a sorted multiset.
  */
object DoubleDriveSpec {
  /** Every SparkEntry query whose implementation depends on persistent
    * scratch state outside the session: store sinks, overwrite
    * round-trip dirs, buildOnce caches (read OR write — a cache READER
    * diverges on the second drive just as a writer does if the publish
    * is broken). The list stays explicit so the gate is readable, but
    * it is no longer hand-trusted: WritePathAuditSpec DERIVES the set
    * mechanically (scratch choke-point observer + fs snapshot diff
    * under a fresh tmpdir) and fails when this list drifts from the
    * derived one in either direction. */
  val writePathQueries: Seq[String] = Seq(
    "q_sink_store",       // VariantStoreSink overwrite + manifest read-back
    "q_source_csv", "q_source_json", "q_source_orc", "q_source_xml",
    "q_source_binary",
    "q_schema_evolution",
    "q_partition_prune", "q_bucketed_join",
    "q_sorted_write",
    "q_store_scan", "q_store_project", "q_store_asof", "q_store_delete",
    "q_combine_incremental",
    "q_ann_ivf", "q_ann_recall",
    "q_dedup_cluster", "q_cluster_rep",
    "q_corpus_clean",     // reads the dedup-cluster label cache (r17 audit find)
    "q_source_vcf")
  // r17 audit finds: q_source_custom REMOVED (RangeVariantSource is a
  // pure generator — no scratch); q_corpus_clean ADDED (it consumes the
  // clusterLabels cache through the session memo, so the hand-kept list
  // never noticed).
}

class DoubleDriveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def writePathQueries = DoubleDriveSpec.writePathQueries

  private def canon(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.map {
      case null                 => "∅"
      case d: java.lang.Double  => "D" + java.lang.Double.doubleToLongBits(d)
      case f: java.lang.Float   => "F" + java.lang.Float.floatToIntBits(f)
      case b: Array[Byte]       => "B" + java.util.Base64.getEncoder.encodeToString(b)
      case x                    => x.toString
    }.mkString("|")).sorted

  test("declared write-path list matches the registered surface") {
    val known = SparkEntry.queries.keySet
    val missing = writePathQueries.filterNot(known)
    assert(missing.isEmpty,
      s"write-path gate names queries that no longer exist: $missing")
  }

  for (name <- writePathQueries)
    test(s"$name returns identical rows when driven twice in one session") {
      val run = SparkEntry.queries(name)
      val first = canon(run(spark, sf))
      val second = canon(run(spark, sf))
      assert(first.nonEmpty, s"$name returned no rows")
      assert(second == first,
        s"$name diverged on the second drive: " +
          s"run1=${first.size} rows, run2=${second.size} rows; " +
          s"first diff: ${second.diff(first).headOption.orElse(first.diff(second).headOption)}")
    }
}
