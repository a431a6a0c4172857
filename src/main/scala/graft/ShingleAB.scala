package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence tool (r22 continuation): same-JVM interleaved A/B of the
  * shingle/text kernels — the old interpreted chains (reconstructed
  * verbatim from the pre-kernel tree: `transform(shinglesOf(toks), …)`
  * over a MATERIALIZED token attribute, i.e. the post-barrier shape
  * without charging the exchange to either side) vs the fused native
  * expressions (`graft_shingle_h48[_distinct]`,
  * `graft_shingle_xxh64_distinct`, `graft_token_stats`). The corpus is
  * deterministic, materialized once to parquet so every variant times
  * read + compute through the noop sink (guide §1.4); a `base` variant
  * measures scan + explode floor so kernel cost is the delta above it.
  * Value parity is cross-checked row-for-row first (must print diff=0;
  * TextExpressionsSpec pins the same parity on edge cases).
  *
  * `sbt "runMain graft.ShingleAB [nDocs] [nTokens]"`
  */
object ShingleAB {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nToks = args.drop(1).headOption.map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic ~nToks-word docs over a 997-word vocabulary, with
    // duplicate shingles (vocab reuse) so the distinct variants dedup
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_shingle_ab_${nDocs}_$nToks"
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      spark.range(0, nDocs, 1, 32).selectExpr(
        "id AS doc_id",
        s"array_join(transform(sequence(1, $nToks), " +
          "i -> concat('w', CAST((id * 31 + i * 7) % 997 AS STRING))), ' ') AS text")
        .selectExpr("doc_id", "text", "split(text, ' ') AS toks")
        .write.mode("overwrite").parquet(dir)
    }
    def corpus: DataFrame = spark.read.parquet(dir)

    def h48Of(c: String): String =
      s"cast(conv(substring(md5(cast($c as string)), 1, 12), 16, 10) as bigint)"
    // the pre-r22 chains, verbatim (toks is a materialized attribute)
    def hofH48(df: DataFrame): DataFrame = df
      .select(col("doc_id"), explode(ops.Dedup.shinglesOf(col("toks"))).as("sh"))
      .select(col("doc_id"), expr(h48Of("sh")).as("v"))
    def natH48(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        explode(functions.TextExpressions.shingleH48(col("toks"))).as("v"))
    def hofXxh(df: DataFrame): DataFrame = df
      .select(col("doc_id"), explode(array_distinct(
        transform(ops.Dedup.shinglesOf(col("toks")), s => xxhash64(s)))).as("h"))
    def natXxh(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        explode(functions.TextExpressions.shingleXxh64Distinct(col("toks"))).as("h"))
    def hofStats(df: DataFrame): DataFrame = {
      val t = split(col("text"), " ")
      df.select(col("doc_id"), size(t).cast("long").as("nt"),
        size(filter(t, x => x.isInCollection(Seq("the", "a")))).cast("long").as("ns"))
    }
    def natStats(df: DataFrame): DataFrame = {
      val ts = functions.TextExpressions.tokenStats(col("text"), Seq("the", "a"))
      df.select(col("doc_id"), functions.TextExpressions.tokenStatsTokens(ts).as("nt"),
        functions.TextExpressions.tokenStatsStops(ts).as("ns"))
    }
    def base(df: DataFrame): DataFrame =
      df.select(col("doc_id"), explode(col("toks")).as("t"))

    // the pre-r22b signature pipelines, verbatim: explode + per-doc
    // group aggregate (vs the per-row kernels — same group key as the
    // row, so per-doc group ≡ per-row)
    val mhA = (0 until ops.Dedup.NumPerms).map(ops.Dedup.minhashA)
    val mhB = (0 until ops.Dedup.NumPerms).map(ops.Dedup.minhashB)
    def aggMinhash(df: DataFrame): DataFrame = df
      .select(col("doc_id"), explode(ops.Dedup.shinglesOf(col("toks"))).as("sh"))
      .select(col("doc_id"), expr(h48Of("sh")).as("v"))
      .groupBy("doc_id")
      .agg(functions.SketchAggregates.minhashSig(col("v"), mhA, mhB,
        ops.Dedup.MinhashP).as("sig"))
    def natMinhash(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        functions.TextExpressions.minhashH48(col("toks"), mhA, mhB,
          ops.Dedup.MinhashP).as("sig"))
    def aggSimhash(df: DataFrame): DataFrame = df
      .select(col("doc_id"), explode(col("toks")).as("t"))
      .select(col("doc_id"),
        expr("shiftleft(CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT), 32) " +
          "| CAST(conv(substring(md5(t), 9, 8), 16, 10) AS BIGINT)").as("v"))
      .groupBy("doc_id")
      .agg(functions.SketchAggregates.simhashSig(col("v")).as("sig"))
    def natSimhash(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        functions.TextExpressions.simhashHex(col("toks")).as("sig"))

    // parity cross-check (order within a doc is deterministic in both
    // forms, so a positional join per doc is exact)
    def keyed(df: DataFrame, v: String): DataFrame = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(monotonically_increasing_id())))
      .select(col("doc_id"), col("rn"), col(v))
    val d1 = keyed(hofH48(corpus), "v").withColumnRenamed("v", "a")
      .join(keyed(natH48(corpus), "v").withColumnRenamed("v", "b"), Seq("doc_id", "rn"), "full")
      .filter(!(col("a") <=> col("b"))).count()
    val d2 = keyed(hofXxh(corpus), "h").withColumnRenamed("h", "a")
      .join(keyed(natXxh(corpus), "h").withColumnRenamed("h", "b"), Seq("doc_id", "rn"), "full")
      .filter(!(col("a") <=> col("b"))).count()
    val d3 = hofStats(corpus).withColumnRenamed("nt", "at").withColumnRenamed("ns", "as")
      .join(natStats(corpus), "doc_id")
      .filter(!(col("at") <=> col("nt")) || !(col("as") <=> col("ns"))).count()
    val d4 = aggMinhash(corpus).withColumnRenamed("sig", "a")
      .join(natMinhash(corpus).withColumnRenamed("sig", "b"), Seq("doc_id"), "full")
      .filter(!(col("a") <=> col("b"))).count()
    val d5 = aggSimhash(corpus).withColumnRenamed("sig", "a")
      .join(natSimhash(corpus).withColumnRenamed("sig", "b"), Seq("doc_id"), "full")
      .filter(!(col("a") <=> col("b"))).count()
    println(s"PARITY h48 diff=$d1 xxh_distinct diff=$d2 token_stats diff=$d3 " +
      s"minhash diff=$d4 simhash diff=$d5 (all must be 0)")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "base_explode" -> (() => base(corpus)),
      "h48_hof" -> (() => hofH48(corpus)),
      "h48_native" -> (() => natH48(corpus)),
      "xxh_dist_hof" -> (() => hofXxh(corpus)),
      "xxh_dist_native" -> (() => natXxh(corpus)),
      "stats_hof" -> (() => hofStats(corpus)),
      "stats_native" -> (() => natStats(corpus)),
      "minhash_agg" -> (() => aggMinhash(corpus)),
      "minhash_native" -> (() => natMinhash(corpus)),
      "simhash_agg" -> (() => aggSimhash(corpus)),
      "simhash_native" -> (() => natSimhash(corpus)))
    val rounds = 4
    for (r <- 1 to rounds; (name, mk) <- variants) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"AB round$r $name%-16s $sec%.3f s")
    }
    spark.stop()
  }
}
