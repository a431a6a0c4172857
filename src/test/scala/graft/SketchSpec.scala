package graft

import org.apache.spark.sql.functions._
import graft.functions.SketchAggregates

/** Deterministic sketches (graft.ops.Sketches) + the bounded min-k
  * native aggregate they build on. Unlike HLL/GK these are
  * oracle-checked end-to-end; the specs here pin the aggregate's
  * contract (exact min-k semantics, dedup, bounded state, merge
  * correctness across partitionings) and the estimators' accuracy. */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("minKDistinct returns exactly the k smallest distinct values, sorted") {
    import spark.implicits._
    // duplicates and unordered input; expected = sorted distinct take k
    val vals = Seq(9L, 3L, 3L, 7L, 1L, 1L, 8L, 5L, 5L, 2L, 11L, 4L)
    val got = vals.toDF("v").repartition(5) // force partial + merge path
      .agg(SketchAggregates.minKDistinct(col("v"), 4)).head.getSeq[Long](0)
    assert(got == Seq(1L, 2L, 3L, 4L))
  }

  test("minKDistinct with fewer than k distinct values returns them all") {
    import spark.implicits._
    val got = Seq(5L, 5L, 2L, 2L).toDF("v")
      .agg(SketchAggregates.minKDistinct(col("v"), 10)).head.getSeq[Long](0)
    assert(got == Seq(2L, 5L))
  }

  test("minKDistinct is partitioning-invariant (merge-based determinism)") {
    val df = graft.api.tbl(spark, sf, "lineitem")
      .select(col("l_partkey").cast("long").as("v"))
    val a = df.repartition(3).agg(SketchAggregates.minKDistinct(col("v"), 32))
      .head.getSeq[Long](0)
    val b = df.repartition(17, col("v")).agg(SketchAggregates.minKDistinct(col("v"), 32))
      .head.getSeq[Long](0)
    assert(a == b)
  }

  test("KMV estimate is within 35% of the exact distinct count") {
    val rows = graft.ops.Sketches.distinctKmv.run(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val est = r.getAs[Double]("kmv_estimate")
      assert(math.abs(est - exact) / exact < 0.35,
        s"${r.getAs[String]("l_returnflag")}: est $est vs exact $exact")
    }
  }

  test("log2-bin quantile sketch bounds the discrete median within 2x") {
    // property (200 seeded random lists): the bucket picked at
    // cum >= ceil(n/2) contains the discrete lower median v, so
    // est = 2^(b-1) satisfies est <= v < 2*est — the sketch's error
    // contract, independent of data distribution
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(500)
      val vals = List.fill(n)(1L + (rnd.nextLong() & ((1L << 40) - 1)))
      val v = vals.sorted.apply((n + 1) / 2 - 1) // 1-based ceil(n/2)
      val hist = vals.groupBy(x => java.lang.Long.toBinaryString(x).length)
        .view.mapValues(_.size).toMap
      val cum = hist.keys.toSeq.sorted
        .scanLeft((0, 0)) { case ((_, c), b) => (b, c + hist(b)) }.drop(1)
      val b50 = cum.find(_._2 >= (n + 1) / 2).get._1
      val est = 1L << (b50 - 1)
      assert(est <= v && v < 2 * est, s"est=$est v=$v vals=${vals.take(8)}")
    }
  }

  test("CMS point estimates never underestimate the exact count") {
    val rows = graft.ops.Sketches.sketchCms.run(spark, sf).collect()
    assert(rows.length == 5)
    for (r <- rows)
      assert(r.getAs[Long]("cms_count") >= r.getAs[Long]("exact_count"),
        s"custkey ${r.getAs[Long]("custkey")} underestimated")
  }

  test("native minhash aggregate equals the per-permutation min columns") {
    import graft.ops.Dedup
    val docs = graft.api.tbl(spark, sf, "documents").filter(col("doc_id") < 200)
    val native = Dedup.minhashSignatures(docs)
      .select(col("doc_id"), col("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // reference shape: NumPerms independent min aggregates
    val toked = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .repartition(col("doc_id"))
    val sh = toked
      .select(col("doc_id"), explode(Dedup.shinglesOf(col("toks"))).as("sh"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(sh), 1, 12), 16, 10) as bigint)").as("v"))
    val mins = (0 until Dedup.NumPerms).map(i =>
      min((col("v") * Dedup.minhashA(i) + Dedup.minhashB(i)) % Dedup.MinhashP).as(s"m$i"))
    val ref = sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until Dedup.NumPerms).map(i => col(s"m$i")): _*).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == ref)
  }

  test("Misra-Gries candidates always contain every true heavy hitter") {
    import spark.implicits._
    // 10,000 rows: key 7 appears 1,500 times (15% > 1/16), the rest are
    // 8,500 distinct singletons. With k = 16, key 7 MUST be a candidate
    // under EVERY partitioning (merge shape must not matter).
    val rows = (Seq.fill(1500)(7L) ++ (100000L until 108500L)).toDF("v")
    for (parts <- Seq(1, 3, 17)) {
      val cands = rows.repartition(parts)
        .agg(SketchAggregates.heavyHitterKeys($"v", 16).as("ks"))
        .select(explode($"ks").as("k")).as[Long].collect().toSeq
      assert(cands.length <= 16, s"state bound violated: ${cands.length} candidates")
      assert(cands.contains(7L), s"heavy hitter lost at $parts partitions: $cands")
    }
  }

  test("LSH ANN results are true cosine scores and respect the Hamming gate") {
    // every returned cos_sim must equal the brute-force score for that
    // vec_id (LSH prunes candidates; it must not alter scoring)
    val lsh = graft.ops.Similarity.annLsh.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lsh.nonEmpty)
    val brute = graft.ops.Similarity.similarityTopk.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, cs) <- lsh if brute.contains(id))
      assert(math.abs(cs - brute(id)) < 1e-9, s"vec $id: lsh $cs vs brute ${brute(id)}")
  }
}
