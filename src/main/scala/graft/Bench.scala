package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: wall time of every declared query at the given
  * scale factor, one JSON line on stdout. Two uncounted warmup runs
  * first (JIT + codegen + parquet footer caches), then queries in sorted
  * name order so per-query numbers are comparable across rounds. */
object Bench {
  // JSON must be locale-independent: a comma-decimal default locale
  // (e.g. de_DE) would turn every f"" float into invalid JSON.
  private def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** The r1 first-green bench total (BENCH_r01.json) every round's 2×
    * gate is read against — meaningful only at the standard sf0.1
    * posture, so the anchor_ratio field is emitted only there. */
  val AnchorSec = 58.95

  /** Per-query times of the PRIOR round's run, parsed from the
    * committed BENCH_full.json before this run overwrites it. The map
    * is flat floats, so the extraction is a bounded regex over the
    * `"queries":{...}` span — no JSON library in the bench path. */
  def priorTimes(json: String): Map[String, Double] = {
    val start = json.indexOf("\"queries\":{")
    if (start < 0) return Map.empty
    val body = json.substring(start + 11, json.indexOf('}', start))
    "\"([^\"]+)\":([0-9.]+)".r.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** Stall-immunity retry rule (r21 verdict #2): ONE re-measure when
    * the first pass is slow in absolute terms (>2 s — the r8 rule) OR
    * relative to the prior round's recorded time for the same query
    * (>3× — catches host stalls landing on sub-2 s queries, where the
    * absolute bar is blind: q_cdc_diff read 2.11 s vs a 0.66 s quiet
    * time in r21 and the phantom survived into PERF). A genuinely slow
    * query stays slow on the re-run, so min-of-two is still honest. */
  def shouldRetry(t1: Double, prior: Option[Double],
      outlierSec: Double = 2.0, ratio: Double = 3.0): Boolean =
    t1 > outlierSec || prior.exists(p => p > 0 && t1 > ratio * p)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-ups cover each input family (lineitem, documents, embeddings)
    // so first-touch parquet-footer/codegen costs don't pollute whichever
    // measured query happens to run first. The last three also
    // materialize their write-once artifacts (IVF buckets, cluster
    // labels, bucketed tables), so the measured numbers are the
    // deterministic build-once/reuse paths regardless of what a prior
    // run left on disk. A warmup failure is NOT swallowed silently — it
    // means a measured query will pay the build (r4's q_corpus_clean
    // mystery), so it goes to stderr for the round audit.
    // q_combine_incremental: its premise is a PRE-EXISTING bucketed
    // store (fixture-cached per sf dir); on a fresh machine the first
    // run pays that build, which is setup, not the incremental path
    // under measurement.
    for (w <- Seq("q_agg_count_by_key", "q_text_stats", "q_similarity_topk",
        "q_ann_ivf", "q_dedup_cluster", "q_bucketed_join", "q_minmax_by",
        "q_combine_incremental", "q_partition_prune"))
      try SparkEntry.queries(w)(spark, sfDir).count() catch {
        case e: Throwable => System.err.println(s"WARMUP FAILED $w: $e")
      }
    // Shared parsed-table cache (r8 verdict item 1b): the 160+ queries
    // re-scan the same ten base tables; cache each once so the per-query
    // numbers measure the OPERATOR, not 160 repetitions of the same cold
    // parquet scan. Spark's CacheManager substitutes the InMemoryRelation
    // into every query's plan by canonical-subplan match, so query code
    // is untouched. This is a bench-harness warm-system choice, not an
    // engine change: at 100 TB the analog is the OS page cache / a warm
    // shuffle service, not caching the corpus.
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      try graft.api.tbl(spark, sfDir, t).cache().count() catch {
        case e: Throwable => System.err.println(s"TABLE CACHE FAILED $t: $e")
      }
    // A measured-query failure must never masquerade as a near-zero
    // (= fast) time: log it AND surface the name in an errors field.
    val errors = scala.collection.mutable.ListBuffer[String]()
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count() catch {
        case e: Throwable =>
          errors += name
          System.err.println(s"MEASURED QUERY FAILED $name: $e")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // SPARK_GRAFT_SKIP: comma-separated query names to exclude — used by
    // the r15f decade drive, where the wide trio's dense site × sample
    // matrix is O(sf²) cells by contract (SCALE.md r15f) and would
    // dominate the run without informing it. Never silent: skipped
    // names are logged AND the JSON's query map simply lacks them, so a
    // reader comparing against the 196-name suite sees the gap.
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    for (s <- skip.toSeq.sorted)
      System.err.println(s"SKIPPED (SPARK_GRAFT_SKIP): $s")
    val names = (SparkEntry.queries.keys.toSet -- skip).toSeq.sorted
    val firstPass = names.zipWithIndex.map { case (name, i) =>
      // Periodically collect accumulated garbage OUTSIDE the timed
      // window so a measured query never pays for its predecessors'
      // heap churn (r8 verdict item 8). Every 8th query, not every
      // query: with the pinned 16g heap a full collection is ~0.4 s, so
      // per-query gc would add a minute of wall-clock for no extra
      // stability.
      if (i % 8 == 0) System.gc()
      name -> timeOne(name)
    }
    // Outlier re-measure (r8 verdict item 8): this box is a shared VM,
    // and consecutive identical-commit runs show rare multi-second host
    // stalls that land on whichever 1–2 queries happen to be running
    // (observed: two adjacent queries +5 s each while the 161-query
    // median moved 57 ms). A query whose first measurement is slow gets
    // ONE re-measure and reports the min — a genuinely slow query stays
    // slow on the re-run, a stall victim recovers, and the other ~95%
    // of queries keep strict single-shot first-run semantics. Both raw
    // times are preserved in BENCH_full.json ("retried") for audit.
    // Prior-round per-query times (committed BENCH_full.json, read
    // BEFORE this run overwrites it): the 3×-prior retry trigger and
    // the control_ratio field below both need them.
    val prior: Map[String, Double] = try {
      val p = java.nio.file.Paths.get("BENCH_full.json")
      if (java.nio.file.Files.exists(p))
        priorTimes(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      else Map.empty
    } catch { case e: Throwable =>
      System.err.println(s"PRIOR BENCH_full.json unreadable: $e"); Map.empty }
    val retried = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    val retryFailed = scala.collection.mutable.ListBuffer[String]()
    val results = firstPass.map { case (name, t1) =>
      if (!shouldRetry(t1, prior.get(name)) || errors.contains(name)) name -> t1
      else {
        System.gc()
        val errsBefore = errors.size
        val t2 = timeOne(name)
        retried(name) = (t1, t2)
        if (errors.size > errsBefore) {
          // The RETRY failed (transient hiccup): the successful
          // first-pass measurement is the official one — reporting
          // min(t1, time-to-failure) would let a failed run masquerade
          // as a fast time, the exact invariant the errors field exists
          // to prevent. The query DID succeed when it counted, so it
          // leaves the errors field — but the failed attempt stays in
          // the audit trail ("retried" keeps both raw times and
          // "retry_failed" names it), so a persistently flaky query is
          // visible in the artifact, not only on stderr.
          errors.remove(errsBefore, errors.size - errsBefore)
          retryFailed += name
          name -> t1
        } else name -> math.min(t1, t2)
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val retr = retried.map { case (k, (t1, t2)) =>
      "\"" + k + "\":[" + f3(t1) + "," + f3(t2) + "]" }.mkString("{", ",", "}")
    val rfail = retryFailed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = f3(results.map(_._2).sum)
    // Self-adjudicating drift fields (r21 verdict #6): anchor_ratio =
    // total vs the r1 anchor (the 2× gate's arithmetic, only meaningful
    // at the standard sf0.1 posture); control_ratio = like-for-like sum
    // vs the PRIOR committed run over the queries both runs measured. A
    // breach with control_ratio ≈ anchor_drift means the host moved, not
    // the engine — the cross-source control rule BASELINE.md documents,
    // now computed in-run instead of by hand.
    val common = results.filter { case (k, _) => prior.contains(k) }
    val ratios = {
      val anchor = if (sfDir.endsWith("sf0.1"))
        s""","anchor_ratio":${f3(results.map(_._2).sum / AnchorSec)}""" else ""
      val control = if (common.nonEmpty) {
        val prev = common.map { case (k, _) => prior(k) }.sum
        s""","control_ratio":${f3(common.map(_._2).sum / prev)},"control_n":${common.size}"""
      } else ""
      anchor + control
    }
    // Measurement-methodology version, so round-over-round comparisons
    // can tell harness changes from engine changes: v1 = cold single-shot
    // per query (r1–r8); v2 = shared base-table cache + >2 s outlier
    // re-measure reporting min (r9+). Bump whenever what "value" measures
    // changes, not for engine or query-set changes.
    val harnessVersion = 2
    val full =
      s"""{"metric":"total","unit":"sec","harness_version":$harnessVersion,"sf":"$sfDir","errors":$errs,"retried":$retr,"retry_failed":$rfail$ratios,"queries":$qs,"value":$total}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_full.json"),
      full.getBytes("UTF-8"))
    // The driver tail-captures only the last ~2000 chars of stdout, and
    // the full per-query map outgrew that in r3 ("parsed": null). Print a
    // line hard-capped at 1750 chars: all scalar fields plus the slowest
    // queries greedily (those are what a perf audit reads); the complete
    // map is in the committed BENCH_full.json.
    val prefix = s"""{"metric":"total","unit":"sec","harness_version":$harnessVersion,"sf":"$sfDir",""" +
      s""""n_queries":${results.size},"errors":$errs$ratios,"queries_full":"BENCH_full.json","queries":{"""
    val suffix = s"""},"value":$total}"""
    // An oversized sfDir path could push the budget negative; the line
    // stays valid JSON either way (entries are just omitted), but clamp
    // and say so rather than silently emitting an empty map.
    val budget = 1750 - prefix.length - suffix.length
    if (budget <= 0) System.err.println(s"BENCH line budget exhausted by sfDir=$sfDir")
    val entries = results.sortBy(-_._2)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
    val kept = new StringBuilder
    for (e <- entries if kept.length + e.length + 1 <= budget)
      kept.append(if (kept.isEmpty) e else "," + e)
    println(prefix + kept + suffix)
    spark.stop()
  }
}
