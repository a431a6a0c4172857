package graft.sources

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming longevity soak — the long-randomized complement of the
  * hand-built streaming-store cases (StreamingSpec's sink/epoch tests,
  * StoreEpochSpec's replay idempotency, RetentionSpec's batch
  * schedule): ONE real MemoryStream query drives 200+ epochs into a
  * VariantStore sink while minor/major compactions, grace flips,
  * explicit vacuums, snapshots, BATCH appends and truncates on the
  * same store (the locked manifest read-modify-write the sink's commit
  * exists for), and a mid-soak restart-from-checkpoint interleave at
  * seeded random points. What a hand-built case cannot
  * see is the INTERACTION surface: an epoch committing right after a
  * splice retired the generations it would have replaced by name, a
  * vacuum between a restart's replayed epoch and its high-water-mark
  * no-op, a snapshot of a store that is mostly retired files.
  *
  * Invariants:
  *   1. **Every epoch lands exactly once.** After each commit, the
  *      generation's own files are read back and must equal the rows
  *      that epoch added (the cheap per-epoch check — an epoch commit
  *      never reorganizes other files).
  *   2. **Maintenance preserves the raw multiset.** After EVERY
  *      maintenance event, all manifest-listed files are re-read and
  *      the raw row multiset must equal the write log — compaction
  *      folds but never drops or duplicates a version; vacuum never
  *      eats a live file. The log RESETS at a batchTruncate (verb 6
  *      empties both store and log), so invariant 2 covers the history
  *      since the last truncate, not all rows ever written.
  *   3. **Resolution stays reference-exact.** After every maintenance
  *      event and at the end, the resolved read (latest version per
  *      key, tombstones dropped) must match a driver-side reference.
  *   4. **Restart is exactly-once.** A stop + restart from the same
  *      checkpoint mid-soak (Spark may replay the last epoch; the
  *      `_EPOCH_HWM` / name-replacement guards must make it a no-op)
  *      leaves invariants 1–3 intact for the rest of the drive.
  *
  * The CI run drives ONE pinned seed at 200 epochs.
  * `GRAFT_SOAK_SEEDS=n` widens to n derived seeds (the
  * GRAFT_RETENTION_SEEDS pattern) — the one-off deep sweep recorded in
  * SCALE.md. */
class StreamSoakSpec extends graft.SparkSpec {

  private val ddl = "key LONG, ver LONG, payload STRING"

  private def manifestFiles(dir: String): Set[String] =
    StoreManifest.readLines(java.nio.file.Paths.get(dir))
      .map(StoreManifest.parse(_).file).toSet

  private def readFiles(dir: String, files: Iterable[String]): Seq[(Long, Long, String)] =
    if (files.isEmpty) Seq.empty
    else spark.read.schema(ddl).parquet(files.map(f => s"$dir/$f").toSeq: _*)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq

  private def rawRows(dir: String): Seq[(Long, Long, String)] =
    readFiles(dir, manifestFiles(dir)).sorted

  private def resolved(dir: String): Seq[(Long, Long, String)] =
    VariantStore.readRange(spark, dir, ddl, Long.MinValue, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq.sortBy(r => (r._1, r._2, r._3))

  private def driveSoak(seed: Long, epochs: Int, canonical: Boolean): Unit = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(s"graft_soak_$seed").toString
    val dir = s"$root/store"
    val chk = s"$root/chk"
    val rnd = new scala.util.Random(seed)
    val input = MemoryStream[(Long, Long, String)]
    // autocompact off: invariant 1 diffs the manifest around ONE epoch
    // commit, which an auto-fold inside the commit would reorganize —
    // this soak owns its maintenance schedule (verb 0 IS compactMinor);
    // the automatic cadence has its own soak in AutoCompactSpec.
    def start() = input.toDF().toDF("key", "ver", "payload")
      .writeStream.format("graft.sources.VariantStoreSink")
      .option("path", dir).option("checkpointLocation", chk)
      .option("autocompact", "false")
      .outputMode("append").start()
    var q = start()

    var log = Vector.empty[(Long, Long, String)] // every row ever appended
    def reference(): Seq[(Long, Long, String)] =
      log.groupBy(_._1).values.map(_.maxBy(r => (r._2, r._3)))
        .filter(_._3 != VariantStore.Tombstone)
        .toSeq.sortBy(r => (r._1, r._2, r._3))
    def fullCheck(what: String, step: Int): Unit = {
      assert(manifestFiles(dir).forall(f => new java.io.File(dir, f).exists()),
        s"[seed $seed] $what at epoch $step: a live generation is missing from disk")
      assert(rawRows(dir) == log.sorted,
        s"[seed $seed] $what at epoch $step: raw multiset diverged from the " +
          s"write log (${rawRows(dir).size} vs ${log.size} rows)")
      assert(resolved(dir) == reference(),
        s"[seed $seed] $what at epoch $step: resolved read diverged")
    }

    val restartAt = 1 + rnd.nextInt(epochs - 1) // exactly one mid-soak restart
    var snapshots = 0
    var maintenance = Map.empty[String, Int].withDefaultValue(0)
    val verbNames = Seq("compactMinor", "compact", "setGrace", "vacuum",
      "snapshot", "batchAppend", "batchTruncate")
    // Batch writes on the SAME store the streaming query owns — the
    // interaction the sink's locked read-modify-write manifest commit
    // exists for (a batch appender merging lines a streaming epoch may
    // be updating). Interleaving here is event-granular (between
    // micro-batches); the in-flight-commit races are SourceSpec's
    // *Impl-seam differentials. ver offsets 7/8 keep batch rows
    // disjoint from epoch rows (i < 3) under the maxBy resolution.
    def batchWrite(epoch: Int, mode: String): Unit = {
      val rows = Seq(
        (rnd.nextInt(20).toLong, epoch * 10L + 7, s"ba$epoch"),
        (rnd.nextInt(20).toLong, epoch * 10L + 8,
          if (rnd.nextInt(100) < 10) VariantStore.Tombstone else s"bb$epoch"))
      rows.toDF("key", "ver", "payload")
        .repartitionByRange(1, $"key").sortWithinPartitions("key")
        .write.format("graft.sources.VariantStoreSink")
        .option("path", dir).mode(mode).save()
      log = (if (mode == "overwrite") Vector.empty[(Long, Long, String)] else log) ++ rows
    }
    def fire(verb: Int, epoch: Int): Unit = {
      verb match {
        case 0 => VariantStore.compactMinor(spark, dir, ddl, keepGenerations = 3)
        case 1 => VariantStore.compact(spark, dir, ddl, numRanges = 2)
        case 2 => VariantStore.setGrace(dir, if (rnd.nextBoolean()) 0L else 3600000L)
        case 3 => // explicit full reclaim: backdate then vacuum(0)
          (Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
            .map(_.getName).toSet -- manifestFiles(dir))
            .filter(_.endsWith(".parquet"))
            .foreach(f => new java.io.File(dir, f)
              .setLastModified(System.currentTimeMillis() - 5000L))
          VariantStore.vacuum(dir, graceMs = 0L)
        case 4 if snapshots < 2 =>
          snapshots += 1
          val dest = s"$root/snap$snapshots"
          VariantStore.snapshot(dir, dest)
          assert(manifestFiles(dest).forall(f => new java.io.File(dest, f).exists()),
            s"[seed $seed] clone not self-contained at epoch $epoch")
          assert(resolved(dest) == reference(),
            s"[seed $seed] clone resolved read diverged at epoch $epoch")
        case 5 => batchWrite(epoch, "append")
        case 6 => // batch truncate retires EVERY generation, including the
          // streaming query's — later epochs append on top of the new
          // baseline, and a replay of a pre-truncate epoch must stay
          // discarded (its rows were deliberately dropped; the _EPOCH_HWM
          // sidecar survives the truncate)
          batchWrite(epoch, "overwrite")
        case _ => ()
      }
      maintenance = maintenance.updated(verbNames(verb), maintenance(verbNames(verb)) + 1)
      fullCheck(verbNames(verb), epoch)
    }
    try {
      for (epoch <- 1 to epochs) {
        val rows = (0 until 1 + rnd.nextInt(3)).map { i =>
          val key = rnd.nextInt(20).toLong
          val payload =
            if (rnd.nextInt(100) < 10) VariantStore.Tombstone
            else s"p$epoch-$i"
          (key, epoch * 10L + i, payload)
        }
        val before = manifestFiles(dir)
        input.addData(rows: _*)
        q.processAllAvailable()
        log = log ++ rows
        // Invariant 1: this epoch's own generation holds exactly its rows
        val added = manifestFiles(dir) -- before
        assert(readFiles(dir, added).sorted == rows.sorted,
          s"[seed $seed] epoch $epoch landed wrong rows")

        if (epoch == restartAt) {
          q.stop()
          q = start()
          maintenance = maintenance.updated("restart", maintenance("restart") + 1)
          fullCheck("restart-from-checkpoint", epoch)
        }
        if (rnd.nextInt(100) < 8) fire(rnd.nextInt(7), epoch)
      }
      // Coverage by construction: any maintenance verb the random
      // schedule starved fires once here, under the live query, each
      // followed by the same full differential — the soak never closes
      // without exercising every verb at least once.
      for (v <- verbNames.indices if maintenance(verbNames(v)) == 0) fire(v, epochs)
    } finally q.stop()
    fullCheck("final", epochs)
    // Soak self-defense, pinned seed only (a derived seed may
    // legitimately starve a verb — the RetentionSpec rule): every
    // maintenance verb must have fired, or the soak quietly stopped
    // soaking.
    if (canonical) {
      val missing = Seq("compactMinor", "compact", "setGrace", "vacuum",
        "snapshot", "restart").filter(maintenance(_) == 0)
      assert(missing.isEmpty,
        s"[seed $seed] soak starved maintenance verbs: $missing " +
          s"(fired: $maintenance) — retune the schedule probabilities")
    }
  }

  test("200-epoch streaming soak: every epoch exactly once through " +
      "compactions, vacuums, grace flips, snapshots, and a restart") {
    driveSoak(20260815L, epochs = 200, canonical = true)
    val n = sys.env.get("GRAFT_SOAK_SEEDS").flatMap(_.toIntOption).getOrElse(0)
    for (i <- 1 to n) driveSoak(20260815L + i * 104729L, epochs = 200, canonical = false)
  }
}
