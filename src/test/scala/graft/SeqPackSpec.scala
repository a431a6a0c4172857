package graft

import org.apache.spark.sql.functions._
import graft.ops.Pipeline

/** Differential guard for the two-level sequence-packing prefix sum
  * (r16 rework of q_seq_pack): on any input, `packAssignments`'s
  * shard-local cumsum + broadcast boundary stitch must equal the naive
  * single-window global cumsum EXACTLY, row for row. The fixture oracle
  * only sees dense doc_ids at one scale; this spec drives the shapes
  * that stress the boundary arithmetic — ids straddling shard edges,
  * sparse/clustered id gaps, documents longer than many pack windows,
  * empty documents at shard boundaries, languages with a single
  * document, and seeded random streams wide enough to span hundreds of
  * shards. */
class SeqPackSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: driver-side per-language running sum in doc_id
    * order — the definitionally-correct single-stream offsets. */
  private def reference(rows: Seq[(String, Long, Long)]): Set[(String, Long, Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (lang, docs) =>
      var off = 0L
      docs.sortBy(_._2).map { case (_, id, n) =>
        val r = (lang, id, n, off, off / Pipeline.PackWindow)
        off += n
        r
      }
    }.toSet

  private def engine(rows: Seq[(String, Long, Long)]): Set[(String, Long, Long, Long, Long)] =
    Pipeline.packAssignments(
        rows.toDF("lang", "doc_id", "n_tokens").repartition(7))
      .as[(String, Long, Long, Long, Long)].collect().toSet

  private def check(rows: Seq[(String, Long, Long)], label: String): Unit = {
    val exp = reference(rows)
    val got = engine(rows)
    assert(got == exp,
      s"$label diverged: missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }

  test("ids straddling shard edges and documents spanning many pack windows") {
    // width floor is 256: place docs at 254..258 (both sides of the
    // first shard edge) and give the edge doc 10 windows' worth of
    // tokens so its successor's offset crosses shards AND packs at once
    val rows = Seq(
      ("en", 0L, 100L), ("en", 254L, 50L), ("en", 255L, 20480L),
      ("en", 256L, 1L), ("en", 257L, 0L), ("en", 258L, 2047L),
      ("en", 511L, 5L), ("en", 512L, 5L))
    check(rows, "shard-edge stream")
  }

  test("sparse and clustered id gaps leave empty shards that must not shift offsets") {
    // shards 1..n-1 empty between id clusters; the stitch's cumsum over
    // PRESENT shard rows must still produce the dense stream offsets
    val rows = Seq(
      ("de", 10L, 7L), ("de", 11L, 9L),
      ("de", 90000L, 13L), ("de", 90001L, 1L),
      ("de", 500000L, 2048L), ("de", 500001L, 3L))
    check(rows, "sparse-gap stream")
  }

  test("single-document languages and zero-token documents") {
    val rows = Seq(
      ("fr", 300L, 0L), ("ja", 0L, 2048L), ("ko", 999999L, 1L))
    check(rows, "degenerate languages")
  }

  test("seeded random streams spanning hundreds of shards match the reference") {
    val rnd = new scala.util.Random(20260815)
    // id span ~200k → ~780 shards at the 256 floor; token counts mix
    // zeros, typical docs, and window-crossing giants; 4 skewed langs
    val langs = Seq("en", "en", "en", "zh", "de", "pt") // en-heavy skew
    val ids = scala.collection.mutable.Set[Long]()
    val rows = (1 to 4000).map { _ =>
      var id = rnd.nextLong(200000L)
      while (ids(id)) id = rnd.nextLong(200000L)
      ids += id
      val n = rnd.nextInt(8) match {
        case 0 => 0L
        case 1 => rnd.nextLong(50000L) // multi-window giant
        case _ => rnd.nextLong(400L)
      }
      (langs(rnd.nextInt(langs.size)), id, n)
    }
    check(rows, "seeded random stream")
    // and the packed aggregate (the query's output shape) agrees too
    val agg = Pipeline.packAssignments(rows.toDF("lang", "doc_id", "n_tokens"))
      .groupBy("lang", "pack_id").agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    val refAgg = reference(rows).groupBy(r => (r._1, r._5))
      .map { case ((l, p), g) => (l, p, g.size.toLong) }.toSet
    assert(agg == refAgg, "per-pack aggregate diverged")
  }

  test("a wide id span engages the 65536-shard cap without changing results") {
    // id_span > 2^16·256 ⇒ width > 256 (the cap path): same offsets
    val rows = Seq(
      ("en", 0L, 5L), ("en", 20000000L, 7L), ("en", 40000000L, 11L),
      ("zh", 39999999L, 2L))
    check(rows, "cap-path stream")
  }
}
