package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence tool (r22 batch 2): same-JVM interleaved A/B of the dense
  * per-site calls assembly — `transform(sort_array(collect-shaped
  * array), s -> s.c)` (the r21 interpreted HOF pair, verbatim) vs the
  * codegen-native graft_sorted_call_vals — and of the export cell merge
  * (the 5-HOF transform/array_except/sort_array chain vs
  * graft_export_cells). Arrays are generated directly at a given cohort
  * width so the kernel cost dominates; the `base` variant times the
  * generator alone (noop sink, guide §1.4). Value equality of the two
  * forms is cross-checked row-for-row first (must print diff=0).
  *
  * `sbt "runMain graft.AssemblyAB [nRows] [width]"`
  */
object AssemblyAB {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val w = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // w-wide array rows overflow the default 4096-row reader batch
      .config("spark.sql.parquet.columnarReaderBatchSize", "128")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one w-wide calls array + a 2/3-covered esd + the sorted cohort
    // list per row — the shapes combineSites/exportLines aggregate into.
    // Materialized ONCE to parquet so the timed variants are read +
    // kernel, not the (interpreted, expensive) generator.
    def genRaw: DataFrame = spark.range(0, n, 1, 32).selectExpr(
      // unsorted (i, c) entries, ties impossible (distinct i)
      s"transform(sequence(0, $w - 1), j -> named_struct(" +
        s"'i', CAST((j * 7919 + id) % $w AS BIGINT), " +
        "'c', concat('s', j, ':0/1:', (id + j) % 100))) AS x",
      // covered subset in sample order (every 3rd sample missing)
      s"filter(transform(sequence(0, $w - 1), j -> named_struct(" +
        "'k', concat('s', lpad(CAST(j AS STRING), 6, '0')), " +
        "'g', CAST(j % 100 AS INT), " +
        "'call', concat('0/1:', j % 100))), e -> e.g % 3 > 0) AS esd",
      s"transform(sequence(0, $w - 1), j -> " +
        "concat('s', lpad(CAST(j AS STRING), 6, '0'))) AS samples")

    val path = s"/tmp/assembly_ab_${n}_$w"
    genRaw.write.mode("overwrite").parquet(path)
    def gen: DataFrame = spark.read.parquet(path)

    def hofCalls(df: DataFrame): DataFrame =
      df.select(expr("transform(sort_array(x), s -> s.c)").as("calls"))
    def nativeCalls(df: DataFrame): DataFrame =
      df.select(graft.functions.GvcfExpressions.sortedCallVals(col("x")).as("calls"))

    def hofCells(df: DataFrame): DataFrame = df.select(expr(
      """transform(sort_array(concat(
        |  transform(esd, x -> struct(x.k AS k, x.call AS v)),
        |  transform(array_except(samples, transform(esd, x -> x.k)),
        |    n -> struct(n AS k, './.:.' AS v)))), x -> x.v)""".stripMargin).as("cells"))
    def nativeCells(df: DataFrame): DataFrame = df.select(
      graft.functions.GvcfExpressions.exportCells(
        col("esd"), col("samples"), "./.:.").as("cells"))

    def base(df: DataFrame): DataFrame = df.select("x", "esd", "samples")

    // equality cross-check (and warm-up)
    val cdiff = hofCalls(gen).withColumn("rid", monotonically_increasing_id())
      .join(nativeCalls(gen).withColumnRenamed("calls", "ncalls")
        .withColumn("rid", monotonically_increasing_id()), "rid")
      .filter(expr("array_join(calls, ';') != array_join(ncalls, ';')"))
      .count()
    val ediff = hofCells(gen).withColumn("rid", monotonically_increasing_id())
      .join(nativeCells(gen).withColumnRenamed("cells", "ncells")
        .withColumn("rid", monotonically_increasing_id()), "rid")
      .filter(expr("array_join(cells, ';') != array_join(ncells, ';')"))
      .count()
    println(s"CALLS diff rows = $cdiff; CELLS diff rows = $ediff (both must be 0)")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "base" -> (() => base(gen)),
      "calls_hof" -> (() => hofCalls(gen)),
      "calls_native" -> (() => nativeCalls(gen)),
      "cells_hof" -> (() => hofCells(gen)),
      "cells_native" -> (() => nativeCells(gen)))
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
