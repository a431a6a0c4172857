package graft

import org.apache.spark.sql.functions._

/** Custom DSv2 source: row generation, predicate pushdown into the
  * scan (narrowed range visible in the scan description), and
  * partition planning. */
class SourceSpec extends SparkSpec {
  import spark.implicits._

  private def src(lo: Long, hi: Long, parts: Int = 8) =
    spark.read.format("graft.sources.RangeVariantSource")
      .option("lo", lo.toString).option("hi", hi.toString)
      .option("partitions", parts.toString).load()

  test("generates exactly the requested range with arithmetic columns") {
    val rows = src(10, 15).orderBy("pos")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(10L, 11L, 12L, 13L, 14L))
    assert(rows.forall { case (p, gq, d) => gq == (p * 2654435761L) % 100 && d == p % 64 })
  }

  test("pos range predicates push into the source (narrowed scan)") {
    val df = src(0, 1000000).filter($"pos" >= 999990L && $"pos" < 999995L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeVariantScan[999990, 999995)"),
      s"pushdown did not narrow the scan:\n${plan.take(1200)}")
    assert(df.count() == 5) // generated 5 rows, not filtered from 1M
  }

  test("non-range predicates stay as residual filters") {
    val df = src(0, 100).filter($"gq" > 50L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeVariantScan[0, 100)")) // un-narrowed
    assert(df.count() == src(0, 100).collect().count(_.getLong(1) > 50))
  }

  test("empty and inverted ranges produce no rows, no crash") {
    assert(src(50, 50).count() == 0)
    assert(src(0, 1000).filter($"pos" >= 900L && $"pos" < 100L).count() == 0)
  }
}
