package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence tool (r17): the 100×-step probe — a sf10-equivalent corpus
  * for the heaviest shuffle movers only, plus a targeted growth
  * measurement main ([[CenturyProbe]]), so the 10×→100× per-family
  * growth exponent can sit next to the decade curve in SCALE.md.
  *
  * Construction = [[ScaleDecade]]'s key-offset copies with ONE
  * deliberate difference: document text is perturbed per copy (every
  * token gets a copy-unique suffix, `n_chars` recomputed), so
  * cross-copy documents are neither exact nor near duplicates.
  * Duplication DENSITY therefore stays at the sf0.1 level while the
  * corpus grows — the decade's byte-identical twins are right for its
  * job (oracle-exact compare on a duplication-rich corpus) but would
  * make a 100-copy dedup measurement quantify duplication richness
  * (pair expansion grows with copies² inside each LSH bucket), not
  * corpus scale. Run the SAME builder at copies=10 for a
  * density-constant 10× point and the 1×→10×→100× exponents are
  * apples-to-apples.
  *
  * Only the probe's input tables are copied (lineitem, orders,
  * documents, embeddings); the rest symlink to the source — the probe
  * is a perf instrument, not a correctness gate (the decade drive owns
  * that), so unscanned tables need not scale.
  *
  *   sbt "runMain graft.ScaleCentury /root/testdata/sf0.1 /tmp/graft_c100 100"
  *   sbt "runMain graft.CenturyProbe /tmp/graft_c100 CENTURY_100x.json"
  */
object ScaleCentury {

  private val keyParents: Map[String, (String, String)] = Map(
    "o_custkey" -> ("customer", "c_custkey"),
    "o_orderkey" -> ("orders", "o_orderkey"),
    "l_orderkey" -> ("orders", "o_orderkey"),
    "l_partkey" -> ("part", "p_partkey"),
    "l_suppkey" -> ("supplier", "s_suppkey"),
    "doc_id" -> ("docvec", ""),
    "vec_id" -> ("docvec", ""))

  private val factTables = Seq("orders", "lineitem", "documents", "embeddings")

  def build(spark: SparkSession, src: String, dest: String, copies: Int): String =
    api.buildOnce(dest, Some("_CENTURY_READY")) { tmp =>
      def maxKey(table: String, col0: String): Long =
        api.tbl(spark, src, table).agg(max(expr(s"cast($col0 as bigint)"))).head.getLong(0)
      val docvecStride = math.max(
        maxKey("documents", "doc_id"), maxKey("embeddings", "vec_id")) + 1L
      val stride: Map[String, Long] = keyParents.map {
        case (k, ("docvec", _)) => k -> docvecStride
        case (k, (t, c)) => k -> (maxKey(t, c) + 1L)
      }
      for (t <- Seq("region", "nation", "customer", "supplier", "part", "events"))
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(s"$tmp/$t.parquet"),
          java.nio.file.Paths.get(s"$src/$t.parquet"))
      for (t <- factTables) {
        val base = api.tbl(spark, src, t)
        val keys = base.columns.filter(keyParents.contains)
        val copiesDf = (0 until copies).map { k =>
          val keyed = keys.foldLeft(base) { (df, c) =>
            df.withColumn(c, col(c) + lit(k * stride(c)))
          }
          if (t == "documents" && k > 0)
            keyed
              .withColumn("text", array_join(
                transform(split(col("text"), " "), w => concat(w, lit(s"_$k"))), " "))
              .withColumn("n_chars", length(col("text")).cast("long"))
          else keyed
        }
        copiesDf.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/_CENTURY_READY"),
        s"src=$src copies=$copies perturbed=documents\n".getBytes("UTF-8"))
      ()
    }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dest = if (args.length > 1) args(1) else "/tmp/graft_c100"
    val copies = if (args.length > 2) args(2).toInt else 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"CENTURY READY: ${build(spark, src, dest, copies)}")
    spark.stop()
  }
}

/** r18 evidence main: drive [[graft.ops.Gvcf.combineAuto]] at a corpus
  * whose derived cohort width (|orders|/50) exceeds the dense admission
  * bound — at /tmp/graft_c334 that is 1,002,000 samples — and prove the
  * three things the r17 verdict asked of the handoff:
  *   (1) the admission rule fires FROM METADATA before execution
  *       (format == "long", decided on the lazy plan);
  *   (2) the long-format execution completes materially under the 257 s
  *       dense median measured at the same width (CENTURY_PROBE_334x);
  *   (3) the results are correct — validated full-width by formula
  *       invariants of the synthetic cohort: every one of the 120 sites
  *       carries exactly `width` rows, the hom-ref rows per site equal
  *       the arithmetic block count (#k in [0,width) with (j+k)%3 == 2),
  *       and no site carries more than 5 distinct genotypes (two
  *       distinct alt letters per site under the (j+1+k%3)%4 scheme →
  *       merged indices 1..2 → {0/0, 0/1, 0/2, 1/1, 2/2}). Path
  *       EQUIVALENCE (long reassembles to the dense bytes) is GvcfSpec's
  *       dense≡long test — here width makes dense infeasible by design.
  *
  *   sbt "runMain graft.AutoCombineProbe /tmp/graft_c334 AUTO_COMBINE_334x.json"
  */
object AutoCombineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_c334")
    val out = if (args.length > 1) args(1) else "AUTO_COMBINE_PROBE.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Gvcf
    // optional 3rd arg: which width-dispatched family to drive —
    // "combine" (default) or "genotype" (the PL-remap path, heavier
    // per row, same admission rule and invariants: block-covered
    // samples re-genotype to 0/0 from banded likelihoods, sites to
    // 0/x or x/x in merged space)
    val op = if (args.length > 2) args(2) else "combine"
    val n = Gvcf.wideN(spark, sfDir)
    val auto =
      if (op == "genotype") Gvcf.genotypeAuto(Gvcf.syntheticVariantsWidePl(spark, n))
      else Gvcf.combineAuto(Gvcf.syntheticVariantsWide(spark, n))
    // (1) admission from metadata: nothing has executed yet
    require(auto.width == n, s"declared width ${auto.width} != cohort $n")
    val expectFormat = if (n > Gvcf.MaxDenseWidth) "long" else "dense"
    require(auto.format == expectFormat,
      s"admission mis-route: width $n -> ${auto.format}, expected $expectFormat")
    // (2)+(3) full-width execution, timed, validated by formula — the
    // validation aggregate depends on the admitted FORMAT (long rows
    // carry per-sample gt; dense rows carry n_samples + a calls array),
    // so a dense-route corpus (width <= MaxDenseWidth) validates too
    // instead of failing on a missing column.
    val t0 = System.nanoTime()
    val agg = (if (auto.format == "long")
      auto.df.groupBy("contig", "pos").agg(
        count(lit(1)).as("rows"),
        sum(when(col("gt") === "0/0", 1L).otherwise(0L)).as("homref"),
        countDistinct("gt").as("ngt"))
    else {
      // dense calls cell: combine emits an ARRAY of "sample:gt:gq"
      // entries, genotype a ';'-joined STRING — normalize first
      val callsArr =
        if (op == "genotype") expr("split(calls, ';')") else col("calls")
      auto.df
        .withColumn("ca", callsArr)
        .select(col("contig"), col("pos"),
          col("n_samples").as("rows"),
          expr("size(filter(ca, c -> c like '%:0/0:%'))")
            .cast("long").as("homref"),
          expr("size(array_distinct(transform(ca, " +
            "c -> split(c, ':')[1])))").cast("long").as("ngt"))
    }).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // #k in [0, n) with k ≡ r (mod 3): floor((n - 1 - r) / 3) + 1
    def blocksAt(j: Long): Long = {
      val r = ((2 - j) % 3 + 3) % 3
      if (r >= n) 0L else (n - 1 - r) / 3 + 1
    }
    val bad = agg.flatMap { row =>
      val (pos, rows, homref, ngt) =
        (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      val j = (pos - 1) / 10
      val exp = blocksAt(j)
      if (rows != n) Some(s"pos $pos rows $rows != width $n")
      else if (homref != exp) Some(s"pos $pos homref $homref != $exp")
      else if (ngt > 5) Some(s"pos $pos ngt $ngt > 5")
      else None
    }
    require(agg.length == 120, s"sites ${agg.length} != 120")
    require(bad.isEmpty, s"invariant failures: ${bad.take(5).mkString("; ")}")
    val json = s"""{"sf":"$sfDir","cpus":$cpus,"op":"$op","width":$n,""" +
      s""""format":"${auto.format}","secs":${"%.1f".formatLocal(java.util.Locale.ROOT, secs)},""" +
      s""""sites":${agg.length},"rows":${agg.map(_.getLong(2)).sum},"invariants":"pass"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

/** r19 evidence main: drive [[graft.ops.Gvcf.exportAuto]] at the 334×
  * corpus (cohort width 1,002,000 > [[graft.ops.Gvcf.MaxDenseWidth]] →
  * the CHUNKED route) and prove the export handoff end to end:
  *   (1) admission from metadata before execution (format == "chunked",
  *       decided on the lazy plan);
  *   (2) full-width execution completes — every row O(chunkSamples),
  *       where the dense exportLines would build ~8 MB strings per site;
  *   (3) the rendered parts are correct by the synthetic cohort's
  *       formulas: per site, exactly ceil(width/chunkSamples) cell
  *       chunks whose cell total is the width; hom-ref cells equal the
  *       arithmetic block count; ≤ 5 distinct genotypes; and the prefix
  *       row pins NS=width (full coverage) and the GT:GQ FORMAT tail.
  * Byte-equality of the stitched lines against exportLines is GvcfSpec's
  * stitch pin — here width makes the dense render infeasible by design.
  *
  *   sbt "runMain graft.AutoExportProbe /tmp/graft_c334 AUTO_EXPORT_334x.json"
  */
object AutoExportProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_c334")
    val out = if (args.length > 1) args(1) else "AUTO_EXPORT_PROBE.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Gvcf
    val chunkSamples = 10000
    val n = Gvcf.wideN(spark, sfDir)
    val auto = Gvcf.exportAuto(Gvcf.syntheticVariantsWide(spark, n),
      chunkSamples = chunkSamples)
    // (1) admission from metadata: nothing has executed yet
    require(auto.width == n, s"declared width ${auto.width} != cohort $n")
    val expectFormat = if (n > Gvcf.MaxDenseWidth) "chunked" else "dense"
    require(auto.format == expectFormat,
      s"admission mis-route: width $n -> ${auto.format}, expected $expectFormat")
    require(auto.format == "chunked",
      s"this probe's corpus must exceed MaxDenseWidth (width $n)")
    val expChunks = (n + chunkSamples - 1) / chunkSamples
    // (2)+(3) full-width execution, timed, validated by formula
    val t0 = System.nanoTime()
    val cellAgg = auto.df.filter(col("chunk_idx") > 0)
      .withColumn("cells", expr("split(part, '\t')"))
      .groupBy("contig", "pos")
      .agg(count(lit(1)).as("chunks"),
        max(col("chunk_idx")).as("maxc"),
        sum(size(col("cells"))).cast("long").as("cells"),
        sum(expr("size(filter(cells, c -> c like '0/0:%'))"))
          .cast("long").as("homref"),
        expr("size(array_distinct(flatten(collect_set(" +
          "array_distinct(transform(cells, c -> split(c, ':')[0]))))))")
          .cast("long").as("ngt"))
      .collect()
    val prefixes = auto.df.filter(col("chunk_idx") === 0)
      .select(col("pos"), col("part")).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // #k in [0, n) with k ≡ r (mod 3): floor((n - 1 - r) / 3) + 1
    def blocksAt(j: Long): Long = {
      val r = ((2 - j) % 3 + 3) % 3
      if (r >= n) 0L else (n - 1 - r) / 3 + 1
    }
    require(cellAgg.length == 120, s"sites ${cellAgg.length} != 120")
    require(prefixes.length == 120, s"prefix rows ${prefixes.length} != 120")
    val badCells = cellAgg.flatMap { row =>
      val (pos, chunks, maxc, cells, homref, ngt) =
        (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4),
          row.getLong(5), row.getLong(6))
      val exp = blocksAt((pos - 1) / 10)
      if (chunks != expChunks) Some(s"pos $pos chunks $chunks != $expChunks")
      else if (maxc != expChunks) Some(s"pos $pos maxc $maxc != $expChunks")
      else if (cells != n) Some(s"pos $pos cells $cells != width $n")
      else if (homref != exp) Some(s"pos $pos homref $homref != $exp")
      else if (ngt > 5) Some(s"pos $pos ngt $ngt > 5")
      else None
    }
    require(badCells.isEmpty,
      s"cell invariant failures: ${badCells.take(5).mkString("; ")}")
    val badPrefix = prefixes.flatMap { row =>
      val (pos, part) = (row.getLong(0), row.getString(1))
      if (!part.contains(s"\tNS=$n\t")) Some(s"pos $pos prefix NS != $n")
      else if (!part.endsWith("\tGT:GQ")) Some(s"pos $pos prefix FORMAT tail")
      else None
    }
    require(badPrefix.isEmpty,
      s"prefix invariant failures: ${badPrefix.take(5).mkString("; ")}")
    val totalRows = cellAgg.map(_.getLong(2)).sum + prefixes.length
    val json = s"""{"sf":"$sfDir","cpus":$cpus,"width":$n,""" +
      s""""format":"${auto.format}","chunk_samples":$chunkSamples,""" +
      s""""secs":${"%.1f".formatLocal(java.util.Locale.ROOT, secs)},""" +
      s""""sites":120,"chunk_rows":$totalRows,"cells":${cellAgg.map(_.getLong(4)).sum},""" +
      s""""invariants":"pass"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

/** r20 evidence main: the chunked export written through a REAL
  * partitioned text sink — the step AUTO_EXPORT_334x validated only in
  * memory. The writer contract under test is [[graft.ops.Gvcf
  * .exportChunks]]'s Scaladoc: "a text writer stitches parts sorted by
  * (contig, pos, chunk_idx) and never materializes a line". The probe
  *   (1) repartitions the chunk rows by site and sorts each partition
  *       by (contig, pos, chunk_idx) — all of a site's chunks land
  *       consecutively in ONE part file; no task ever holds more than
  *       one O(chunkSamples) row (the recorded max_chunk_row_bytes,
  *       ~90 KB, vs the ~9 MB full-width line);
  *   (2) writes them with a text sink (one chunk row per text line,
  *       U+0001-delimited header fields — parts contain tabs, never
  *       control chars);
  *   (3) streams every part file back CHUNK AT A TIME, asserting the
  *       in-file order is exactly (site, 0..maxChunk) with no site
  *       straddling files, and folds each site's bytes (tab-joined in
  *       stream order) into an incremental MD5;
  *   (4) compares all site digests AND line lengths against
  *       [[graft.ops.Gvcf.linesFromChunks]] — the in-memory stitch
  *       witness GvcfSpec pins against the dense exportLines.
  * Byte-identical digests prove a plain sorted text write IS a valid
  * full-width gVCF export at width 1,002,000 — the file content equals
  * the dense render that cannot be materialized per-row at this width.
  *
  *   sbt "runMain graft.AutoExportSinkProbe /tmp/graft_c334 AUTO_EXPORT_334x_sink.json"
  */
object AutoExportSinkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_c334")
    val out = if (args.length > 1) args(1) else "AUTO_EXPORT_SINK_PROBE.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Gvcf
    val chunkSamples = 10000
    val n = Gvcf.wideN(spark, sfDir)
    val auto = Gvcf.exportAuto(Gvcf.syntheticVariantsWide(spark, n),
      chunkSamples = chunkSamples)
    require(auto.format == "chunked",
      s"this probe's corpus must exceed MaxDenseWidth (width $n)")
    val sinkDir = s"${System.getProperty("java.io.tmpdir")}/graft_export_sink_334x"
    val t0 = System.nanoTime()
    auto.df
      .repartition(cpus.toInt, col("contig"), col("pos"))
      .sortWithinPartitions("contig", "pos", "chunk_idx")
      .select(concat_ws("\u0001", col("contig"), col("pos").cast("string"),
        col("chunk_idx").cast("string"), col("part")).as("value"))
      .write.mode("overwrite").text(sinkDir)
    val writeSecs = (System.nanoTime() - t0) / 1e9
    // ---- stream the sink back, one chunk row at a time ----
    val t1 = System.nanoTime()
    val files = new java.io.File(sinkDir).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    val digests = scala.collection.mutable.Map[(String, Long), (String, Long)]()
    var maxRowBytes = 0L
    var bytesOnDisk = 0L
    for (f <- files) {
      bytesOnDisk += f.length()
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        new java.io.FileInputStream(f), java.nio.charset.StandardCharsets.UTF_8),
        1 << 20)
      var site: (String, Long) = null
      var nextChunk = 0L
      var lineBytes = 0L
      var md: java.security.MessageDigest = null
      def finish(): Unit = if (site != null) {
        require(!digests.contains(site), s"site $site straddled part files")
        digests(site) = (md.digest().map("%02x".format(_)).mkString, lineBytes)
      }
      var row = in.readLine()
      while (row != null) {
        val fields = row.split("\u0001", 4)
        require(fields.length == 4, s"malformed sink row in ${f.getName}")
        val s = (fields(0), fields(1).toLong)
        if (s != site) {
          finish()
          site = s; nextChunk = 0L; lineBytes = 0L
          md = java.security.MessageDigest.getInstance("MD5")
        }
        require(fields(2).toLong == nextChunk,
          s"out-of-order chunk at $site: ${fields(2)} != $nextChunk")
        val bytes = fields(3).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        // exact UTF-8 bytes of the sink row: measured part bytes plus
        // the contig/pos/chunk_idx header (pure ASCII -- digits and the
        // fixture contig, so char count IS byte count there) plus the 3
        // delimiters. row.length counts UTF-16 chars (r20 review), the
        // wrong unit for a bytes-held-per-task bound.
        maxRowBytes = math.max(maxRowBytes,
          bytes.length.toLong + fields(0).length + fields(1).length +
            fields(2).length + 3)
        if (nextChunk > 0L) { md.update('\t'.toByte); lineBytes += 1 }
        md.update(bytes); lineBytes += bytes.length
        nextChunk += 1
        row = in.readLine()
      }
      finish()
      in.close()
    }
    val stitchSecs = (System.nanoTime() - t1) / 1e9
    // ---- the in-memory stitch witness ----
    val expected = Gvcf.linesFromChunks(auto.df)
      .select(col("contig"), col("pos"),
        md5(col("line").cast("binary")).as("m"),
        // octet_length, not length: the sink side counts UTF-8 BYTES
        // (r20 review — char count would spuriously fail the length
        // compare on any non-ASCII content even with digests equal)
        expr("octet_length(line)").as("len"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getString(2), r.getInt(3).toLong))
      .toMap
    require(expected.size == 120, s"witness sites ${expected.size} != 120")
    require(digests.size == 120, s"sink sites ${digests.size} != 120")
    val bad = expected.flatMap { case (s, (m, len)) =>
      if (!digests.contains(s)) Some(s"site $s missing from sink")
      else if (digests(s) != ((m, len)))
        Some(s"site $s sink ${digests(s)} != witness ($m, $len)")
      else None
    }
    require(bad.isEmpty, s"stitch mismatches: ${bad.take(5).mkString("; ")}")
    val json = s"""{"sf":"$sfDir","cpus":$cpus,"width":$n,""" +
      s""""chunk_samples":$chunkSamples,"sites":120,"sink_files":${files.length},""" +
      s""""bytes_on_disk":$bytesOnDisk,"max_chunk_row_bytes":$maxRowBytes,""" +
      s""""full_line_bytes":${expected.values.map(_._2).max},""" +
      s""""write_secs":${"%.1f".formatLocal(java.util.Locale.ROOT, writeSecs)},""" +
      s""""stitch_secs":${"%.1f".formatLocal(java.util.Locale.ROOT, stitchSecs)},""" +
      s""""digests_match":true}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), (json + "\n").getBytes("UTF-8"))
    println(json)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(sinkDir))
    spark.stop()
  }
}

/** r19 evidence main: the heap-derived dense admission bound
  * ([[graft.ops.Gvcf.derivedMaxDenseWidth]]) tracks the r17e measured
  * floor. Run this under TWO heap sizes (the r17e bracket endpoints):
  *
  *   java -Xmx4800m ... graft.WidthFloorProbe FLOOR_AUDIT_r19_width_4800.json 153600
  *   java -Xmx9600m ... graft.WidthFloorProbe FLOOR_AUDIT_r19_width_9600.json 300000
  *
  * The optional second arg is the EXPECTED derived bound for that heap —
  * an independent pin that fails if the derivation ever drifts.
  *
  * Each run derives THIS JVM's bound, builds a synthetic cohort at
  * exactly that width, and executes the dense combine full-width — green
  * completion means every admitted width fits its heap. The refusal side
  * is r17e's measurement itself: 300k OOMs at 4.8 GB, and the 4.8 GB
  * derivation (153,600) refuses it; the 9.6 GB derivation admits the
  * full cap — the boundary sits between the measured OOM and green
  * heaps. The audit's starved `spark.memory.fraction = 0.15` is pinned
  * here too, so the floor being exercised is r17e's, not a roomier
  * default-fraction one. */
object WidthFloorProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("WIDTH_FLOOR_PROBE.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.memory.fraction", "0.15")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Gvcf
    val heap = Runtime.getRuntime.maxMemory
    val slots = spark.sparkContext.defaultParallelism
    val derived = Gvcf.defaultMaxDenseWidth(spark)
    // pin the derivation against an INDEPENDENT expectation when the
    // caller supplies one (args(1), the value the invocation was sized
    // for). A bare invocation must not validate against NOTHING (r20
    // advice item): fall back to the plumbing pin — defaultMaxDenseWidth
    // must equal derivedMaxDenseWidth over the locally-read heap/slots.
    // Weaker than a caller expectation (it cannot catch a drifted
    // FORMULA, only drifted plumbing between the two entry points), so
    // say which pin ran.
    args.drop(1).headOption.map(_.toLong) match {
      case Some(expected) =>
        require(derived == expected,
          s"derived bound $derived != invocation's expected $expected " +
            s"(heap=$heap slots=$slots) — the derivation drifted")
      case None =>
        require(derived == Gvcf.derivedMaxDenseWidth(heap, slots),
          s"defaultMaxDenseWidth($derived) != derivedMaxDenseWidth(heap=$heap, " +
            s"slots=$slots) — the two derivation entry points drifted")
        println(s"WidthFloorProbe: no expected-bound arg; plumbing pin only " +
          s"(derived=$derived)")
    }
    val auto = Gvcf.combineAuto(Gvcf.syntheticVariantsWide(spark, derived))
    require(auto.format == "dense" && auto.width == derived,
      s"the derived bound must admit exactly itself: $auto")
    val t0 = System.nanoTime()
    val agg = auto.df
      .select(col("pos"), col("n_samples"), size(col("calls")).as("nc"))
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    require(agg.length == 120, s"sites ${agg.length} != 120")
    require(agg.forall(r => r.getLong(1) == derived && r.getInt(2) == derived),
      "dense combine at the derived width lost samples")
    val json = s"""{"heap_bytes":$heap,"slots":$slots,""" +
      s""""derived_width":$derived,"cap":${Gvcf.MaxDenseWidth},""" +
      s""""bytes_per_sample_slot":${Gvcf.BytesPerSampleSlot},""" +
      s""""secs":${"%.1f".formatLocal(java.util.Locale.ROOT, secs)},""" +
      s""""sites":120,"result":"green"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

/** Times the heavy-mover queries at a given sfDir with full-width
  * execution (`queryExecution.toRdd.count()` — Bench's `df.count()`
  * prunes output columns, which hid the r16 wide-cohort quadratics).
  * Each query runs twice, both timed: exec1 carries one-time costs
  * (codegen, build-once cache construction — for q_dedup_cluster that
  * build IS the operator), exec2 is the steady re-run. One JSON object
  * per run; scripts/century_compare.py fits the growth exponents. */
object CenturyProbe {

  val ProbeQueries = Seq(
    "q_sorted_write",
    "q_dedup_exact", "q_dedup_near", "q_dedup_ngram", "q_dedup_simhash",
    "q_dedup_cluster", "q_seq_pack", "q_combine_wide")

  private def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "CENTURY_PROBE.json"
    // optional explicit query list (the ShuffleAudit/SpillAudit
    // convention) — a width-axis point only needs the wide combine, not
    // a 200M-row sorted write sharing the host
    val names = if (args.length > 2) args.drop(2).toSeq else ProbeQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JIT/codegen floor off the first measured query, then
    // cache the two tables every probe query re-scans (the Bench rule:
    // measure the operator, not repeated cold scans of one corpus)
    try SparkEntry.queries("q_agg_count_by_key")(spark, sfDir).count()
    catch { case e: Throwable => System.err.println(s"WARMUP FAILED: $e") }
    for (t <- Seq("lineitem", "documents", "orders"))
      try api.tbl(spark, sfDir, t).cache().count()
      catch { case e: Throwable => System.err.println(s"TABLE CACHE FAILED $t: $e") }
    val results = names.map { name =>
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (e1, rows) = once()
      val (e2, _) = once()
      System.err.println(s"PROBE $name: exec1=${f3(e1)}s exec2=${f3(e2)}s rows=$rows")
      s""""$name":{"exec1":${f3(e1)},"exec2":${f3(e2)},"rows":$rows}"""
    }
    val json = s"""{"sf":"$sfDir","cpus":$cpus,"queries":{${results.mkString(",")}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
