package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Hand-computed golden results for operator semantics on literal
  * DataFrames (the small, fast complement to the DuckDB oracle gate). */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("multimodal stub decodes deterministic metadata from binary columns") {
    val out = Multimodal.decodeStub(
      Seq((1L, "abcd"), (2L, "a much longer simulated payload")).toDF("doc_id", "text")
        .select($"doc_id", encode($"text", "UTF-8").as("media")))
    val rows = out.orderBy("doc_id")
      .select("doc_id", "n_bytes", "width", "height", "channels")
      .as[(Long, Long, Int, Int, Int)].collect().toSeq
    assert(rows.map(_._2) == Seq(4L, 31L))
    assert(rows.forall { case (_, n, w, h, c) =>
      w == (n % 640 + 1) && h == (n * 31 % 480 + 1) && c == 3 })
    // determinism: same input → same features
    assert(rows == out.orderBy("doc_id")
      .select("doc_id", "n_bytes", "width", "height", "channels")
      .as[(Long, Long, Int, Int, Int)].collect().toSeq)
  }

  test("P6 decode recovers the exact synthesized pixels; resize halves dims") {
    val docs = Seq(3L, 10L).toDF("doc_id")
    val media = Multimodal.syntheticPpm(docs)
    // doc 3: w = 3%8+4 = 7, h = 3%5+3 = 6
    val dec = Multimodal.decodePpm(media).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    def sums(id: Long, w: Int, h: Int, step: Int) = (0 until 3).map { c =>
      (for (y <- 0 until h; x <- 0 until w)
        yield (id * 9349 + (step * y) * 193 + (step * x) * 17 + c * 71) % 256).sum
    }
    assert(dec.head._1 == 3L && dec.head._2 == 7L && dec.head._3 == 6L)
    assert(Seq(dec.head._4, dec.head._5, dec.head._6) == sums(3L, 7, 6, 1))
    // resized: ceil(7/2)=4, ceil(6/2)=3; pixel (x,y) = source (2x,2y)
    val rs = Multimodal.decodePpm(Multimodal.resizeHalf(media)).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rs.head._2 == 4L && rs.head._3 == 3L)
    assert(Seq(rs.head._4, rs.head._5, rs.head._6) == sums(3L, 4, 3, 2))
  }

  test("sessionize splits on gaps strictly greater than 30 minutes") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L), (1L, "2024-01-01 10:30:00", 2L), // exactly 30m → same
      (1L, "2024-01-01 11:00:01", 3L), // 30m1s → new session
      (2L, "2024-01-01 09:00:00", 4L)
    ).toDF("user_id", "s", "event_id").select($"user_id", $"s".cast("timestamp").as("ts"), $"event_id")
    df.createOrReplaceTempView("events_lit")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val prev = lag($"ts", 1).over(w)
    val out = df
      .withColumn("new_s", when(prev.isNull || unix_micros($"ts") - unix_micros(prev) > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum($"new_s").over(run))
      .groupBy("user_id").agg(max($"sid").as("n_sessions"))
      .orderBy("user_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (2L, 1L)))
  }

  test("Observation metrics count filter drops without a second pass") {
    // the production data-quality pattern: one job both filters AND
    // reports what it dropped — no extra scan, metrics ride the action
    val obs = new org.apache.spark.sql.Observation("quality")
    val docs = Seq(
      (1L, "good line"), (2L, ""), (3L, "ok"), (4L, "")
    ).toDF("doc_id", "text")
    val kept = docs
      .observe(obs, count(lit(1)).as("seen"),
        sum(when(length($"text") === 0, 1L).otherwise(0L)).as("empty"))
      .filter(length($"text") > 0)
      .collect()
    assert(kept.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val m = obs.get
    assert(m("seen") == 4L && m("empty") == 2L, s"wrong metrics: $m")
  }

  test("minmax_by argmax key rounds (not truncates) 4-decimal values") {
    // Regression for the cross-engine cast divergence: the cents key
    // must round explicitly — 1.2355 → 123.55 cents → 124 (a bare
    // decimal→long cast would truncate to 123 in Spark while DuckDB
    // rounds, diverging on any value with >2 decimals).
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val df = Seq((1.2355, 7L), (2.9999, 8L), (-1.2355, 9L))
      .toDF("value", "event_id")
      .withColumn("k",
        round($"value".cast(DecimalType(18, 4)) * 100, 0).cast(LongType) *
          10000000000L + $"event_id")
    val ks = df.orderBy("event_id").select("k").as[Long].collect().toSeq
    assert(ks == Seq(124L * 10000000000L + 7L,
      300L * 10000000000L + 8L,
      -124L * 10000000000L + 9L)) // half-away-from-zero on negatives too
  }

  test("minmax_by keeps a NULL arg at the extreme key (the arg_max chimera class)") {
    // r20 review: Spark's max_by returns the value at the max key even
    // when that value is NULL; DuckDB's bare arg_max SKIPS null args
    // and would return the runner-up. The oracle is struct-wrapped
    // (arg_max(struct_pack(e := …), k).e — DuckDB-verified this round)
    // to match the behavior pinned HERE: the extreme row wins, NULL
    // arg and all.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("k", LongType)))
    val ev = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "click", 5L), Row(1L, null, 9L), Row(1L, "view", 1L)), 2), schema)
    val r = ev.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max_by($"event_type", $"k").as("top"),
        org.apache.spark.sql.functions.min_by($"event_type", $"k").as("bottom"))
      .collect().head
    assert(r.isNullAt(1), s"max_by must return the NULL arg at max k: $r")
    assert(r.getString(2) == "view", s"min_by changed: $r")
  }

  test("chunk dedup finds a shared paragraph at different positions") {
    // the shared 80-token paragraph sits at offset 0 in doc 1 and after
    // 13 tokens of unique prefix in doc 2 — content-defined boundaries
    // realign inside the shared region, so interior chunks duplicate
    val para = (1 to 80).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, para + " " + (1 to 9).map(i => s"tailA$i").mkString(" ")),
      (2L, (1 to 13).map(i => s"prefixB$i").mkString(" ") + " " + para),
      (3L, (1 to 50).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Pipeline.sharedChunks(docs)
      .select("chunk", "n_docs").as[(String, Long)].collect().toSeq
    assert(out.nonEmpty, "no duplicated chunk detected in planted shared paragraph")
    assert(out.forall { case (c, n) => n == 2L && c.contains("shared") })
    // determinism: identical result on re-run
    assert(out == Pipeline.sharedChunks(docs)
      .select("chunk", "n_docs").as[(String, Long)].collect().toSeq)
  }

  test("triangle summary counts K4 exactly once per triangle") {
    // K4 (complete graph on 0..3) has C(4,3) = 4 triangles, 6 edges,
    // 4 nodes of degree 3 → 12 wedges; the pendant edge (4-5) adds two
    // degree-1 nodes — zero extra wedges, zero triangles.
    // Duplicate and reversed raw edges must collapse; self-loop dropped.
    val raw = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (1L, 0L), (2L, 2L), (4L, 5L) // reversed dup, self-loop, pendant
    ).toDF("a", "b")
    val row = Extras.triangleSummary(raw)
      .select("n_nodes", "n_edges", "n_wedges", "n_triangles")
      .as[(Long, Long, Long, Long)].head()
    assert(row == ((6L, 7L, 12L, 4L)))
    // triangle-free bipartite graph → zero
    val bip = Seq((0L, 10L), (0L, 11L), (1L, 10L), (1L, 11L)).toDF("a", "b")
    assert(Extras.triangleSummary(bip)
      .select("n_triangles").as[Long].head() == 0L)
  }

  test("frame sampling keeps every 2nd frame and skips the rest unread") {
    // id 9: 9%6+2 = 5 frames → sampled {0, 2, 4}; id 4: 4%6+2 = 6
    // frames → sampled {0, 2, 4}. Frame 0's pixel formula equals the
    // single-image fixture's, so its sums must match decodePpm on
    // syntheticPpm for the same ids — pinning sampler vs decoder.
    val docs = Seq(9L, 4L).toDF("doc_id")
    val frames = Multimodal.sampleFrames(Multimodal.syntheticVideo(docs), 2)
      .select("doc_id", "frame_idx", "sum_r", "sum_g", "sum_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(frames.map(f => (f._1, f._2)) ==
      Seq((4L, 0L), (4L, 2L), (4L, 4L), (9L, 0L), (9L, 2L), (9L, 4L)))
    val f0 = frames.filter(_._2 == 0L).map(f => (f._1, f._3, f._4, f._5)).sorted
    val img = Multimodal.decodePpm(Multimodal.syntheticPpm(docs))
      .select("doc_id", "sum_r", "sum_g", "sum_b")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(f0 == img)
    // stride 1 = every frame
    assert(Multimodal.sampleFrames(Multimodal.syntheticVideo(docs), 1)
      .count() == 5 + 6)
  }

  test("wav chunking recovers exact per-chunk energies from the RIFF payload") {
    // differential vs the sample formula computed directly in Scala
    val ids = Seq(0L, 3L, 4999L)
    val out = Multimodal.chunkWav(Multimodal.syntheticWav(ids.toDF("doc_id")), 1000)
      .select("doc_id", "chunk_idx", "n_samples", "energy")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val want = ids.sorted.flatMap { id =>
      val n = (id % 5000 + 2000).toInt
      (0 until (n + 999) / 1000).map { c =>
        val lo = c * 1000; val hi = math.min(lo + 1000, n)
        val e = (lo until hi).map { i =>
          val s = (id * 7919 + i * 31) % 4096 - 2048; s * s
        }.sum
        (id, c.toLong, (hi - lo).toLong, e)
      }
    }
    assert(out == want)
  }

  test("ewma fixed-point weighted sum matches hand arithmetic") {
    // one series, three points 1.0, 2.0, 4.0 (micro-units 10000/20000/
    // 40000): window [all 3], weights 1,2,4 newest-heaviest →
    // numer = 10000·1 + 20000·2 + 40000·4 = 210000, denom = 7,
    // ewma = 210000/7/10000 = 3.0
    val df = Seq(
      ("click", 7L, "2024-01-01 10:00:00", 1L, 1.0),
      ("click", 7L, "2024-01-01 10:01:00", 2L, 2.0),
      ("click", 7L, "2024-01-01 10:02:00", 3L, 4.0)
    ).toDF("event_type", "user_id", "s", "event_id", "value")
      .select($"event_type", $"user_id", $"s".cast("timestamp").as("ts"),
        $"event_id", $"value")
    val out = Extras.ewmaOf(df)
      .select("event_type", "user_id", "n_events", "ewma")
      .as[(String, Long, Long, Double)].head()
    assert(out == (("click", 7L, 3L, 3.0)))
    // 9-point constant series: the 8-deep frame caps state, EWMA = the
    // constant exactly (Σ c·2ʲ / (2⁸−1) = c)
    val const = (1 to 9).map(i =>
      ("view", 8L, f"2024-01-01 11:00:$i%02d", 100L + i, 2.5))
      .toDF("event_type", "user_id", "s", "event_id", "value")
      .select($"event_type", $"user_id", $"s".cast("timestamp").as("ts"),
        $"event_id", $"value")
    assert(Extras.ewmaOf(const).select("ewma").as[Double].head() == 2.5)
  }

  test("token entropy: uniform doc = log2(n) bits, constant doc = 0") {
    val docs = Seq(
      (1L, "en", "a b c d"),     // 4 distinct: floor(log2 4) = 2 bits each
      (2L, "en", "x x x x x"),   // constant: 0 bits
      (3L, "en", "a a a b")      // tf(a)=3: floor(log2(4/3))=0; tf(b)=1: 2 bits
    ).toDF("doc_id", "lang", "text")
    val out = Pipeline.tokenEntropyOf(docs).orderBy("doc_id")
      .select("doc_id", "n_tokens", "vocab", "total_bits", "bits_per_token")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 4L, 8L, 2.0),
      (2L, 5L, 1L, 0L, 0.0),
      (3L, 4L, 2L, 2L, 0.5)))
  }

  test("containment scores |probe ∩ doc| / |probe| on word 3-grams") {
    // probe doc 0: "a b c d e" → shingles {abc, bcd, cde} (3)
    // corpus doc 10: "x a b c d y" → {xab, abc, bcd, cdy} → hits {abc, bcd}
    // corpus doc 11: "a b c d e" verbatim → hits all 3
    // corpus doc 12: disjoint → no row at all
    val docs = Seq(
      (0L, "a b c d e"),
      (10L, "x a b c d y"),
      (11L, "a b c d e"),
      (12L, "p q r s t")
    ).toDF("doc_id", "text")
    val out = Pipeline.containmentOf(docs, probeBelow = 5)
      .select("pid", "doc_id", "hits", "probe_n", "containment")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
    assert(out == Seq(
      (0L, 10L, 2L, 3L, 0.666667),
      (0L, 11L, 3L, 3L, 1.0)))
  }

  test("feature hashing is a signed bucket-count decomposition of the token stream") {
    // differential vs a direct Scala reference over the same h48 hash
    val docs = Seq((1L, "a b a c"), (2L, "x"), (3L, "a a a a a")).toDF("doc_id", "text")
    val h = docs
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .select($"doc_id", expr(graft.api.h48("t")).as("hv"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = h.groupBy(_._1).map { case (id, rows) =>
      val f = new Array[Long](16)
      rows.foreach { case (_, hv) =>
        f((hv % 16).toInt) += (if ((hv / 16) % 2 == 0) 1L else -1L)
      }
      id -> f.toSeq
    }
    val out = docs
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .select($"doc_id", expr(graft.api.h48("t")).as("hv"))
      .select($"doc_id", ($"hv" % 16).as("bucket"),
        when((expr("hv div 16") % 2) === 0, 1L).otherwise(-1L).as("s"))
      .groupBy("doc_id", "bucket").agg(sum($"s").as("v"))
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct($"bucket", $"v"))).as("m"))
      .select($"doc_id",
        expr("transform(sequence(0, 15), i -> coalesce(m[cast(i as bigint)], 0L))")
          .as("features"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out == want)
    // every token lands in exactly one bucket: L1 of |features| = token count
    assert(out.map { case (id, f) => id -> f.map(math.abs).sum }.toSeq.sorted
      .map(_._2).sum <= h.length) // signs may cancel within a bucket
  }

  test("stratified sample draws exactly the per-language quota, deterministically") {
    val docs = (1 to 23).map(i => (i.toLong, if (i <= 20) "en" else "fr"))
      .toDF("doc_id", "lang").withColumn("text", lit("t"))
    def run() = Pipeline.stratifiedOf(docs)
      .select("lang", "doc_id").as[(String, Long)].collect().toSeq.sorted
    val first = run()
    // quotas: ceil(20/10)=2 en, ceil(3/10)=1 fr
    assert(first.count(_._1 == "en") == 2 && first.count(_._1 == "fr") == 1)
    assert(first == run()) // hash selection is seedless and retry-stable
  }

  test("fixed-point centroid mean is exact and order-independent") {
    val vals = Seq(0.1f, 0.25f, -0.7f, 0.33f, 0.999f, -0.001f)
    val df1 = vals.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "x")
    val df2 = vals.reverse.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "x")
    def fpMean(df: org.apache.spark.sql.DataFrame): Double = df.repartition(5)
      .agg((sum(floor($"x".cast("double") * 16777216.0).cast("long")).cast("double")
        / count(lit(1)) / 16777216.0).as("m")).as[Double].head()
    assert(fpMean(df1) == fpMean(df2))
    assert(math.abs(fpMean(df1) - vals.map(_.toDouble).sum / vals.size) < 1e-6)
  }

  // ---- differentials for the exact-arithmetic stats trio (r14 close):
  // each query's distributed integer-sum + fixed-order IEEE formula is
  // replayed as a direct Scala loop over the collected sf0.001 fixture;
  // equality must be EXACT (the whole claim is that no result depends
  // on partitioning or accumulation order).

  private val sfDiff = "/root/testdata/sf0.001"
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_corr_stats equals a driver-side exact-cents correlation") {
    val rows = graft.api.tbl(spark, sfDiff, "lineitem")
      .select("l_quantity", "l_discount", "l_tax")
      .as[(Double, Double, Double)].collect()
      .map { case (q, d, t) =>
        (math.round(q * 100), math.round(d * 100), math.round(t * 100)) }
    val n = rows.length.toDouble
    def corrOf(xs: Array[Long], ys: Array[Long]): Double = {
      val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
      val sxx = xs.map(v => v * v).sum.toDouble
      val syy = ys.map(v => v * v).sum.toDouble
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
      round6((n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
    }
    val (qs, ds, ts) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    val got = Extras.corrStats.run(spark, sfDiff)
      .as[(Long, Double, Double, Double)].head()
    assert(got == ((rows.length.toLong, corrOf(qs, ds), corrOf(qs, ts), corrOf(ds, ts))))
  }

  test("q_source_drift equals a driver-side exact TV distance") {
    val docs = graft.api.tbl(spark, sfDiff, "documents")
      .filter($"source".isin("src0", "src1"))
      .select("source", "text").as[(String, String)].collect()
    val counts = scala.collection.mutable.Map.empty[String, (Long, Long)]
    var n1 = 0L; var n2 = 0L
    for ((src, text) <- docs; tok <- text.split(" ", -1)) {
      val (a, b) = counts.getOrElse(tok, (0L, 0L))
      if (src == "src0") { counts(tok) = (a + 1, b); n1 += 1 }
      else { counts(tok) = (a, b + 1); n2 += 1 }
    }
    val sdev = counts.valuesIterator.map { case (c1, c2) =>
      math.abs(c1 * n2 - c2 * n1) }.sum
    val tv = round6(sdev.toDouble / (2 * n1.toDouble * n2.toDouble))
    val got = Pipeline.sourceDrift.run(spark, sfDiff)
      .as[(Long, Long, Long, Double)].head()
    assert(got == ((n1, n2, counts.size.toLong, tv)))
  }

  test("q_ks_drift equals a driver-side exact KS statistic") {
    val docs = graft.api.tbl(spark, sfDiff, "documents")
      .filter($"source".isin("src0", "src1"))
      .select("source", "n_chars").as[(String, Long)].collect()
    val l1 = docs.filter(_._1 == "src0").map(_._2).sorted
    val l2 = docs.filter(_._1 == "src1").map(_._2).sorted
    val (n1, n2) = (l1.length.toLong, l2.length.toLong)
    val lengths = (l1 ++ l2).distinct.sorted
    val maxdev = lengths.map { x =>
      val cum1 = l1.count(_ <= x).toLong
      val cum2 = l2.count(_ <= x).toLong
      math.abs(cum1 * n2 - cum2 * n1)
    }.max
    val ks = round6(maxdev.toDouble / (n1.toDouble * n2.toDouble))
    val got = Pipeline.ksDrift.run(spark, sfDiff)
      .as[(Long, Long, Long, Double)].head()
    assert(got == ((n1, n2, lengths.length.toLong, ks)))
  }

  test("q_chi_square cells equal a driver-side exact decomposition") {
    val pairs = graft.api.tbl(spark, sfDiff, "documents")
      .select("lang", "source").as[(String, String)].collect()
    val cells = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowT = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val colT = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nT = pairs.length.toLong
    val want = cells.toSeq.map { case ((lang, src), o) =>
      val (r, c) = (rowT(src), colT(lang))
      val dev = o * nT - r * c
      (lang, src, o,
        round6((r * c).toDouble / nT),
        round6((dev * dev).toDouble / (nT.toDouble * r.toDouble * c.toDouble)))
    }.sortBy(x => (x._2, x._1))
    val got = Pipeline.chiSquare.run(spark, sfDiff)
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(got == want)
  }
}
