package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence tool (r22): same-JVM interleaved A/B of the GenotypeGVCFs
  * per-row remap — the old interpreted higher-order-function chain
  * (limap/pairs/mpl/argmin/sort, reconstructed here verbatim from the
  * r21 tree) vs the codegen-native graft_pl_regenotype — and of the
  * merged-alts projection (array_sort(array_distinct(flatten(…))) chain
  * vs graft_merged_alts). Rows stream from a deterministic generator
  * common to every variant (the noop sink times the projection, guide
  * §1.4); a `base` variant measures the generator alone so the remap
  * cost is the A/B delta above it. Also cross-checks value equality of
  * the two forms row-for-row (must print diff=0).
  *
  * `sbt "runMain graft.RemapAB [nRows]"`
  */
object RemapAB {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // representative coverage-row shapes: 2/3 sites (6-entry PL, 2 local
    // alleles), 1/3 blocks (null PL), 4 merged alleles
    def gen: DataFrame = spark.range(0, n, 1, 32).selectExpr(
      "CASE WHEN id % 3 = 2 THEN 'block' ELSE 'site' END AS kind",
      "CAST(id % 90 + 10 AS INT) AS gq",
      "CASE WHEN id % 3 = 2 THEN array(substr('ACGT', CAST(id % 4 AS INT) + 1, 1)) " +
        "ELSE array(substr('ACGT', CAST(id % 4 AS INT) + 1, 1), " +
        "substr('ACGT', CAST((id + 1) % 4 AS INT) + 1, 1)) END AS alleles",
      "CASE WHEN id % 3 = 2 THEN CAST(NULL AS ARRAY<INT>) " +
        "ELSE transform(sequence(0, 5), j -> CAST(CASE WHEN j = CAST(id % 3 AS INT) " +
        "THEN 0 ELSE (j + 1) * 10 + id % 7 END AS INT)) END AS pl",
      "array(substr('ACGT', CAST(id % 4 AS INT) + 1, 1), " +
        "substr('ACGT', CAST((id + 1) % 4 AS INT) + 1, 1), " +
        "substr('ACGT', CAST((id + 2) % 4 AS INT) + 1, 1), '<NON_REF>') AS malleles",
      // nested alt-slice sets for the merged-alts A/B (2 distinct slices)
      "array(array(substr('ACGT', CAST(id % 4 AS INT) + 1, 1)), " +
        "array(substr('ACGT', CAST((id + 1) % 4 AS INT) + 1, 1))) AS altsets")
      .withColumn("lall", expr("concat(alleles, array('<NON_REF>'))"))

    // the r21 interpreted chain, verbatim
    def hofRemap(df: DataFrame): DataFrame = df
      .withColumn("limap", expr(
        """transform(malleles, m ->
          |  CASE WHEN array_position(lall, m) > 0
          |       THEN CAST(array_position(lall, m) - 1 AS INT)
          |       ELSE size(lall) - 1 END)""".stripMargin))
      .withColumn("pairs", expr(
        "flatten(transform(sequence(0, size(malleles) - 1), " +
          "b -> transform(sequence(0, b), a -> array(a, b))))"))
      .withColumn("mpl", expr(
        """CASE WHEN kind = 'block' OR pl IS NULL THEN
          |  transform(pairs, p -> coalesce(gq, 0) * (CAST(p[0] > 0 AS INT) + CAST(p[1] > 0 AS INT)))
          |ELSE
          |  transform(pairs, p -> coalesce(try_element_at(pl, CAST(
          |    (greatest(limap[p[0]], limap[p[1]]) * (greatest(limap[p[0]], limap[p[1]]) + 1)) div 2
          |      + least(limap[p[0]], limap[p[1]]) + 1 AS INT)), 999999))
          |END""".stripMargin))
      .withColumn("g", expr("CAST(array_position(mpl, array_min(mpl)) - 1 AS INT)"))
      .withColumn("gt_new", expr("concat(pairs[g][0], '/', pairs[g][1])"))
      .withColumn("spl", array_sort(col("mpl")))
      .withColumn("gq_new", expr("least(try_element_at(spl, 2) - try_element_at(spl, 1), 99)"))
      .select("gt_new", "gq_new")

    def nativeRemap(df: DataFrame): DataFrame = df
      .withColumn("pk", graft.functions.GvcfExpressions.plRegenotype(
        col("malleles"), col("lall"), col("pl"), col("kind"), col("gq")))
      .withColumn("gt_new", expr(
        "concat(CAST(pk & 1048575 AS STRING), '/', " +
          "CAST(shiftright(pk, 20) & 1048575 AS STRING))"))
      .withColumn("gq_new", expr("CAST(shiftright(pk, 40) AS INT)"))
      .select("gt_new", "gq_new")

    def hofAlts(df: DataFrame): DataFrame = df.select(
      concat(array_sort(array_distinct(flatten(col("altsets")))),
        array(lit("<NON_REF>"))).as("alts"))

    def nativeAlts(df: DataFrame): DataFrame = df.select(
      graft.functions.GvcfExpressions.mergedAlts(col("altsets"), "<NON_REF>").as("alts"))

    def base(df: DataFrame): DataFrame = df.select("kind", "gq", "pl", "malleles", "lall")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "base" -> (() => base(gen)),
      "remap_hof" -> (() => hofRemap(gen)),
      "remap_native" -> (() => nativeRemap(gen)),
      "alts_hof" -> (() => hofAlts(gen)),
      "alts_native" -> (() => nativeAlts(gen)))

    // equality cross-check first (and a warm-up for every shape)
    val both = nativeRemap(gen).withColumnRenamed("gt_new", "ngt")
      .withColumnRenamed("gq_new", "ngq")
    val h = hofRemap(gen)
    val joined = h.join(both)
    val diff = h.select(col("gt_new").as("hgt"), col("gq_new").as("hgq"))
      .withColumn("rid", monotonically_increasing_id())
      .join(both.withColumn("rid", monotonically_increasing_id()), "rid")
      .filter(col("hgt") =!= col("ngt") || col("hgq") =!= col("ngq"))
      .count()
    val adiff = hofAlts(gen).withColumn("rid", monotonically_increasing_id())
      .join(nativeAlts(gen).withColumnRenamed("alts", "nalts")
        .withColumn("rid", monotonically_increasing_id()), "rid")
      .filter(expr("array_join(alts, ',') != array_join(nalts, ',')"))
      .count()
    println(s"REMAP diff rows = $diff; ALTS diff rows = $adiff (both must be 0)")

    val rounds = 4
    for (r <- 1 to rounds; (name, mk) <- variants) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"AB round$r $name%-13s ${sec}%.3f s")
    }
    spark.stop()
  }
}
