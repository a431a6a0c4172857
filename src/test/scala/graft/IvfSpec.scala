package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Ivf

/** Nearest-centroid assignment semantics (r2 verdict item 2: "IVF" must
  * assign by distance, not trust the label column). */
class IvfSpec extends SparkSpec {

  private def vec(x: Float): Seq[Float] = Seq.fill(64)(x)

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def embDf(rows: (Long, Seq[Float], Int)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
      embSchema)

  test("vectors go to the nearest centroid even when their label disagrees") {
    // two tight clusters near 0.0 and 1.0; vec 5 is labeled 0 but sits at 0.9
    val e = embDf(
      (0L, vec(0.0f), 0), (1L, vec(0.1f), 0), (2L, vec(0.05f), 0),
      (3L, vec(1.0f), 1), (4L, vec(0.95f), 1),
      (5L, vec(0.9f), 0)) // mislabeled: nearest centroid is cluster 1's
    val cents = Ivf.trainCentroids(e)
    val asg = Ivf.assignToNearest(e, cents)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asg(0L) == 0 && asg(1L) == 0 && asg(2L) == 0)
    assert(asg(3L) == 1 && asg(4L) == 1)
    assert(asg(5L) == 1, s"mislabeled vector was not reassigned by distance: $asg")
  }

  test("argmin ties break toward the lower centroid label") {
    // identical centroids (labels 0 and 1): everything must land in 0
    val e = embDf(
      (0L, vec(0.5f), 0), (1L, vec(0.5f), 1),
      (2L, vec(0.4f), 0), (3L, vec(0.4f), 1))
    val asg = Ivf.assignToNearest(e, Ivf.trainCentroids(e))
      .select("vec_id", "bucket").collect().map(_.getInt(1))
    assert(asg.forall(_ == 0), "tie did not break to the lower label")
  }

  test("search returns the brute-force top-k when nprobe covers all buckets") {
    val d = "/root/testdata/sf0.001"
    val brute = graft.ops.Similarity.similarityTopk.run(spark, d)
      .collect().map(_.getLong(0))
    val ivfAll = Ivf.search(spark, d, probeVecId = 0L, nprobe = 100, k = 10)
      .collect().map(_.getLong(0))
    assert(ivfAll.sameElements(brute),
      s"nprobe=all IVF ${ivfAll.toSeq} != brute force ${brute.toSeq}")
  }
}
