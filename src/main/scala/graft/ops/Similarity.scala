package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api._

/** Similarity search over the `embeddings` table (north-star: ANN for
  * training-data pipelines). Brute-force cosine top-k is the baseline;
  * IVF (coarse-quantizer label buckets + nprobe) is the scale path.
  *
  * Determinism across engines (SURVEY §2 rules): float→double casts are
  * exact; all reductions over vectors are SEQUENTIAL left folds in array
  * order (Spark `aggregate`, DuckDB `list_reduce`), so double rounding is
  * bit-identical; elementwise centroid means go through exact
  * DECIMAL(27,12) sums + one IEEE division.
  *
  * Scale notes (100 TB): brute-force is one broadcast of the probe +
  * a map-side fold + TakeOrdered — no shuffle of the corpus. IVF prunes
  * the corpus to nprobe buckets before the fold; bucket assignment is a
  * broadcast join. Never an all-pairs cross join.
  */
object Similarity {

  /** Sequential dot product / norm via the native codegen'd expressions
    * (graft.functions.VectorExpressions) — identical left-to-right double
    * accumulation as the DuckDB list_reduce oracles. */
  private def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.dotp(a, b)

  private def norm(a: Column): Column = sqrt(graft.functions.VectorExpressions.norm2(a))

  private[ops] def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB: sequential left-fold sum over a double list (matches Spark's
    * aggregate fold bit-for-bit: 0.0 + x1 == x1). private[ops]: the
    * hybrid-retrieval fusion oracle (Pipeline.hybridRrf) reuses the same
    * fold so its cosine leg can never diverge from q_similarity_topk's. */
  private[ops] def duckFoldSum(listExpr: String): String =
    s"list_reduce($listExpr, (acc, x) -> acc + x)"

  private[ops] def duckDot(a: String, b: String): String =
    duckFoldSum(s"list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))")

  private[ops] def duckNorm(a: String): String =
    s"sqrt(${duckFoldSum(s"list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")})"

  /** Dim-prefix variants (matryoshka truncation): fold over the first n
    * elements only, same sequential order as Spark's slice + aggregate. */
  private def duckDotN(a: String, b: String, n: Int): String =
    duckFoldSum(s"list_transform(range(1, ${n + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))")

  private def duckNormN(a: String, n: Int): String =
    s"sqrt(${duckFoldSum(s"list_transform(range(1, ${n + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))")})"

  /** C2 — brute-force cosine top-10 for probe vec_id=0: broadcast probe,
    * fold per row, TakeOrderedAndProject. The 100 TB plan is scan +
    * broadcast + per-partition heap — zero shuffle of the corpus. */
  val similarityTopk = Query(
    "q_similarity_topk",
    s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
       |p AS (SELECT v AS pv FROM e WHERE vec_id = 0)
       |SELECT vec_id,
       |  round(${duckDot("v", "pv")} / (${duckNorm("v")} * ${duckNorm("pv")}), 6) AS cos_sim
       |FROM e, p
       |WHERE vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id
       |LIMIT 10""".stripMargin) { (s, d) =>
    val e = tbl(s, d, "embeddings")
    val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("pv"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), round(cosine(col("embedding"), col("pv")), 6).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id"))
      .limit(10)
  }

  /** DuckDB twin of the fixed-point mean the native `vecFixedSum`
    * aggregate computes (exact power-of-two quantize → integer sum →
    * one division; order-independent and engine-exact). */
  private def duckFixedPointMean(x: String): String =
    s"CAST(sum(CAST(floor(CAST($x AS DOUBLE) * 16777216.0) AS BIGINT)) AS DOUBLE) / count(*) / 16777216.0"

  /** C3 — per-label elementwise mean embedding (the IVF coarse
    * quantizer's training step), order-independent via fixed-point sums. */
  val centroidByLabel = Query(
    "q_centroid_by_label",
    s"""SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       |  ${duckFixedPointMean("embedding[dim + 1]")} AS centroid_val
       |FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS dim)
       |GROUP BY label, dim
       |ORDER BY label, dim""".stripMargin) { (s, d) =>
    // ONE native array-typed aggregate per label (no 64× posexplode
    // before the shuffle); same fixed-point arithmetic, then the dense
    // vector unpacks to (dim, val) rows AFTER the aggregate.
    tbl(s, d, "embeddings")
      .groupBy("label")
      .agg(graft.functions.VectorAggregates.vecFixedSum(
          col("embedding").cast(ArrayType(DoubleType))).as("sums"),
        count(lit(1)).as("n"))
      .select(col("label").cast(LongType).as("label"),
        posexplode(transform(col("sums"),
          s => s.cast(DoubleType) / col("n") / 16777216.0)).as(Seq("dim", "centroid_val")))
      .select(col("label"), col("dim").cast(LongType).as("dim"), col("centroid_val"))
      .orderBy("label", "dim")
  }

  /** IVF ANN against the real materialized index ([[Ivf]], r2 verdict
    * item 2): vectors assigned to their NEAREST label-seeded centroid
    * (not trusting `label`), index written once bucket-partitioned,
    * probe searches nprobe=2 buckets via a DPP-pruned join. Centroids
    * are fixed-point-exact, every distance a sequential fold — the
    * oracle reproduces the plan CTE by CTE, including the assignment
    * (`row_number` argmin with label tie-break). */
  val annIvf = Query(
    "q_ann_ivf",
    s"""WITH e AS (SELECT vec_id, label, embedding AS v FROM embeddings),
       |dims AS (SELECT unnest(generate_series(0, 63)) AS dim),
       |cent AS (
       |  SELECT label, dim, ${duckFixedPointMean("v[dim + 1]")} AS c
       |  FROM e, dims GROUP BY label, dim),
       |cvec AS (SELECT label, list(c ORDER BY dim) AS cv FROM cent GROUP BY label),
       |asg AS (
       |  SELECT vec_id, v, bucket FROM (
       |    SELECT e.vec_id, e.v, c.label AS bucket,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${duckFoldSum("list_transform(range(1, 65), i -> (c.cv[i] - CAST(e.v[i] AS DOUBLE)) * (c.cv[i] - CAST(e.v[i] AS DOUBLE)))")},
       |        c.label) AS rn
       |    FROM e, cvec c) WHERE rn = 1),
       |p AS (SELECT v AS pv FROM e WHERE vec_id = 0),
       |sel AS (
       |  SELECT label AS bucket FROM cvec, p
       |  ORDER BY ${duckFoldSum("list_transform(range(1, 65), i -> (cv[i] - CAST(pv[i] AS DOUBLE)) * (cv[i] - CAST(pv[i] AS DOUBLE)))")}, label
       |  LIMIT 2)
       |SELECT vec_id,
       |  round(${duckDot("v", "pv")} / (${duckNorm("v")} * ${duckNorm("pv")}), 6) AS cos_sim
       |FROM asg, sel, p
       |WHERE asg.bucket = sel.bucket AND vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id
       |LIMIT 10""".stripMargin) { (s, d) =>
    Ivf.search(s, d, probeVecId = 0L, nprobe = 2, k = 10)
  }

  /** Embedding-cosine near-dup candidates: label-blocked pair generation
    * (the blocking key bounds the quadratic term — never all-pairs),
    * top-20 most-similar pairs. */
  val dedupEmbed = Query(
    "q_dedup_embed",
    s"""WITH e AS (SELECT vec_id, label, embedding AS v FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round(${duckDot("a.v", "b.v")} / (${duckNorm("a.v")} * ${duckNorm("b.v")}), 6) AS cos_sim
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |ORDER BY cos_sim DESC, vec_a, vec_b
       |LIMIT 20""".stripMargin) { (s, d) =>
    // Per-vector work (double cast + norm) happens ONCE per row below an
    // exchange barrier; only the O(pairs) dot product runs per pair.
    val e = tbl(s, d, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .repartition(col("label"))
    val a = e.select(col("vec_id").as("vec_a"), col("label"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_a"), col("vec_b"))
      .limit(20)
  }

  private def duckD2(cv: String, v: String): String =
    duckFoldSum(s"list_transform(range(1, 65), i -> ($cv[i] - CAST($v[i] AS DOUBLE)) * ($cv[i] - CAST($v[i] AS DOUBLE)))")

  /** Shared oracle CTE prefix: embeddings, label-seeded centroid vectors
    * (the quantizer's seed), and the argmin assignment — the exact CTEs
    * q_ann_ivf uses, factored for reuse. */
  private val duckIvfPrefix =
    s"""e AS (SELECT vec_id, label, embedding AS v FROM embeddings),
       |dims AS (SELECT unnest(generate_series(0, 63)) AS dim),
       |cent AS (
       |  SELECT label, dim, ${duckFixedPointMean("v[dim + 1]")} AS c
       |  FROM e, dims GROUP BY label, dim),
       |cvec AS (SELECT label, list(c ORDER BY dim) AS cv FROM cent GROUP BY label)""".stripMargin

  /** K-means (Lloyd) training for the IVF quantizer, 2 iterations from
    * the label-seeded means: assign → exact fixed-point means → assign →
    * means. Output: per surviving bucket its member count, first centroid
    * coordinate, and centroid norm². The oracle replays both iterations
    * CTE by CTE with the identical argmin and fold arithmetic. */
  val kmeansIter = Query(
    "q_kmeans_iter",
    s"""WITH $duckIvfPrefix,
       |a1 AS (
       |  SELECT vec_id, v, bucket FROM (
       |    SELECT e.vec_id, e.v, c.label AS bucket,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${duckD2("c.cv", "e.v")}, c.label) AS rn
       |    FROM e, cvec c) WHERE rn = 1),
       |c1 AS (
       |  SELECT bucket AS label, dim, ${duckFixedPointMean("v[dim + 1]")} AS c
       |  FROM a1, dims GROUP BY bucket, dim),
       |cv1 AS (SELECT label, list(c ORDER BY dim) AS cv FROM c1 GROUP BY label),
       |a2 AS (
       |  SELECT vec_id, v, bucket FROM (
       |    SELECT e.vec_id, e.v, c.label AS bucket,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${duckD2("c.cv", "e.v")}, c.label) AS rn
       |    FROM e, cv1 c) WHERE rn = 1),
       |c2 AS (
       |  SELECT bucket AS label, dim, ${duckFixedPointMean("v[dim + 1]")} AS c
       |  FROM a2, dims GROUP BY bucket, dim),
       |cv2 AS (SELECT label, list(c ORDER BY dim) AS cv FROM c2 GROUP BY label),
       |n2 AS (SELECT bucket, count(*) AS n FROM a2 GROUP BY bucket)
       |SELECT CAST(cv2.label AS BIGINT) AS bucket, n2.n AS n,
       |  round(cv2.cv[1], 6) AS c0,
       |  round(${duckFoldSum("list_transform(cv2.cv, x -> x * x)")}, 6) AS cnorm2
       |FROM cv2 JOIN n2 ON n2.bucket = cv2.label
       |ORDER BY bucket""".stripMargin) { (s, d) =>
    val e = tbl(s, d, "embeddings")
    Ivf.lloydIterate(e, Ivf.trainCentroids(e), 2)
      .select(col("label").cast(LongType).as("bucket"), col("n"),
        round(element_at(col("cv"), 1), 6).as("c0"),
        round(aggregate(col("cv"), lit(0.0), (acc, x) => acc + x * x), 6).as("cnorm2"))
      .orderBy("bucket")
  }

  /** Recall@10 of the materialized IVF index (nprobe=2) against exact
    * brute-force top-10, for the first 20 vectors as probes — the
    * quality metric every ANN deployment tracks next to its latency.
    * Spark side searches the REAL index (bucket-partitioned files from
    * Ivf.buildIndex); the oracle recomputes assignment + both top-10s. */
  val annRecall = Query(
    "q_ann_recall",
    s"""WITH $duckIvfPrefix,
       |asg AS (
       |  SELECT vec_id, v, bucket FROM (
       |    SELECT e.vec_id, e.v, c.label AS bucket,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${duckD2("c.cv", "e.v")}, c.label) AS rn
       |    FROM e, cvec c) WHERE rn = 1),
       |p AS (SELECT vec_id AS pid, v AS pv FROM e WHERE vec_id < 20),
       |sel AS (
       |  SELECT pid, label AS bucket FROM (
       |    SELECT p.pid, c.label,
       |      row_number() OVER (PARTITION BY p.pid ORDER BY ${duckD2("c.cv", "p.pv")}, c.label) AS rn
       |    FROM cvec c, p) WHERE rn <= 2),
       |brute AS (
       |  SELECT pid, vec_id FROM (
       |    SELECT p.pid, e.vec_id,
       |      row_number() OVER (PARTITION BY p.pid ORDER BY
       |        ${duckDot("e.v", "p.pv")} / (${duckNorm("e.v")} * ${duckNorm("p.pv")}) DESC, e.vec_id) AS rn
       |    FROM e, p WHERE e.vec_id <> p.pid) WHERE rn <= 10),
       |ivf AS (
       |  SELECT pid, vec_id FROM (
       |    SELECT s.pid, a.vec_id,
       |      row_number() OVER (PARTITION BY s.pid ORDER BY
       |        ${duckDot("a.v", "p.pv")} / (${duckNorm("a.v")} * ${duckNorm("p.pv")}) DESC, a.vec_id) AS rn
       |    FROM asg a JOIN sel s ON a.bucket = s.bucket JOIN p ON p.pid = s.pid
       |    WHERE a.vec_id <> s.pid) WHERE rn <= 10)
       |SELECT b.pid AS vec_id, CAST(count(i.vec_id) AS BIGINT) AS n_hits,
       |  round(CAST(count(i.vec_id) AS DOUBLE) / 10, 6) AS recall
       |FROM brute b LEFT JOIN ivf i ON b.pid = i.pid AND b.vec_id = i.vec_id
       |GROUP BY b.pid
       |ORDER BY vec_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val dir = Ivf.buildIndex(s, d)
    val e = tbl(s, d, "embeddings")
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("pid"), col("embedding").as("pv"))
    val sel = graft.api.pathTbl(s, s"$dir/centroids")
      .crossJoin(broadcast(probes))
      .select(col("pid"), col("label").as("bucket"), Ivf.d2ToProbe.as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("pid").orderBy(col("d2"), col("bucket"))))
      .filter(col("rn") <= 2).select("pid", "bucket")
    val ivfTop = graft.api.pathTbl(s, s"$dir/vectors")
      .join(broadcast(sel), "bucket")
      .join(broadcast(probes), Seq("pid"))
      .filter(col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"), cosine(col("embedding"), col("pv")).as("cs"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("pid").orderBy(desc("cs"), col("vec_id"))))
      .filter(col("rn") <= 10)
      .select(col("pid"), col("vec_id"), lit(1).as("hit"))
    val brute = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"), cosine(col("embedding"), col("pv")).as("cs"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("pid").orderBy(desc("cs"), col("vec_id"))))
      .filter(col("rn") <= 10)
      .select("pid", "vec_id")
    brute.join(ivfTop, Seq("pid", "vec_id"), "left")
      .groupBy(col("pid").as("vec_id"))
      .agg(count(col("hit")).as("n_hits"),
        round(count(col("hit")).cast(DoubleType) / 10, 6).as("recall"))
      .orderBy("vec_id")
  }

  /** Symmetric per-vector int8 quantization: scale = max|x|, code_i =
    * round(x_i * 127 / scale) ∈ [-127, 127] — the 4× storage compression
    * every 100 TB embedding store runs (float32 → int8 + one scale).
    * Every step is identical IEEE double arithmetic in both engines;
    * code sums are exact BIGINTs and the reconstruction error a
    * sequential fold. */
  val embedQuantize = Query(
    "q_embed_quantize",
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale,
       |    list_transform(v, x ->
       |      CASE WHEN list_max(list_transform(v, y -> abs(y))) = 0 THEN 0
       |           ELSE CAST(round(x * 127 / list_max(list_transform(v, y -> abs(y)))) AS BIGINT)
       |      END) AS code
       |  FROM e)
       |SELECT vec_id, round(scale, 6) AS scale_r,
       |  CAST(${duckFoldSum("code")} AS BIGINT) AS sum_code,
       |  CAST(${duckFoldSum("list_transform(code, c -> CAST(abs(c) AS DOUBLE))")} AS BIGINT) AS sum_abs_code,
       |  round(${duckFoldSum("list_transform(range(1, 65), i -> abs(v[i] - code[i] * scale / 127))")}, 6) AS recon_err
       |FROM q
       |ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = tbl(s, d, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      // barrier: materialize v before the lambdas below reference it
      // repeatedly (CollapseProject would re-inline the cast transform).
      .repartition(col("vec_id"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
    e.withColumn("code", transform(col("v"), x =>
        when(col("scale") === 0, lit(0L))
          .otherwise(round(x * 127 / col("scale")).cast(LongType))))
      .select(col("vec_id"), round(col("scale"), 6).as("scale_r"),
        aggregate(col("code"), lit(0L), (acc, c) => acc + c).as("sum_code"),
        aggregate(col("code"), lit(0L), (acc, c) => acc + abs(c)).as("sum_abs_code"),
        round(aggregate(
          zip_with(col("v"), col("code"), (x, c) => abs(x - c * col("scale") / 127)),
          lit(0.0), (acc, t) => acc + t), 6).as("recon_err"))
      .orderBy("vec_id")
  }

  /** Top-k neighbor search over the QUANTIZED codes: rank by the exact
    * integer dot product of int8 codes against probe vec_id=0 — the
    * memory-bandwidth-bound inner loop of a compressed vector store,
    * and (being all-integer) bit-exact across engines with no rounding
    * discipline needed at all. */
  val similarityQuantized = Query(
    "q_similarity_quantized",
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id,
       |    list_transform(v, x ->
       |      CASE WHEN list_max(list_transform(v, y -> abs(y))) = 0 THEN 0
       |           ELSE CAST(round(x * 127 / list_max(list_transform(v, y -> abs(y)))) AS BIGINT)
       |      END) AS code
       |  FROM e),
       |p AS (SELECT code AS pc FROM q WHERE vec_id = 0)
       |SELECT vec_id,
       |  CAST(${duckFoldSum("list_transform(range(1, 65), i -> CAST(code[i] * pc[i] AS DOUBLE))")} AS BIGINT) AS dot_q
       |FROM q, p
       |WHERE vec_id <> 0
       |ORDER BY dot_q DESC, vec_id
       |LIMIT 10""".stripMargin) { (s, d) =>
    val codes = tbl(s, d, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      .repartition(col("vec_id"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
      .select(col("vec_id"), transform(col("v"), x =>
        when(col("scale") === 0, lit(0L))
          .otherwise(round(x * 127 / col("scale")).cast(LongType))).as("code"))
    val probe = codes.filter(col("vec_id") === 0).select(col("code").as("pc"))
    codes.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      // codegen'd integer multiply-accumulate (graft_dotl) — HOF lambdas
      // would evaluate interpreted, one boxed call per element.
      .select(col("vec_id"),
        graft.functions.VectorExpressions.dotl(col("code"), col("pc")).as("dot_q"))
      .orderBy(desc("dot_q"), col("vec_id"))
      .limit(10)
  }

  /** Pairwise centroid cosine matrix: the RIGHT way to do all-pairs at
    * 100 TB — reduce first (K fixed-point-exact centroids), then the
    * quadratic step runs on K rows, not the corpus. K² = 45 pairs here;
    * the join is a broadcast nested loop over kilobytes. */
  val centroidPairs = Query(
    "q_centroid_pairs",
    s"""WITH e AS (SELECT label, embedding AS v FROM embeddings),
       |dims AS (SELECT unnest(generate_series(0, 63)) AS dim),
       |cent AS (
       |  SELECT label, dim, ${duckFixedPointMean("v[dim + 1]")} AS c
       |  FROM e, dims GROUP BY label, dim),
       |cvec AS (SELECT label, list(c ORDER BY dim) AS cv FROM cent GROUP BY label)
       |SELECT CAST(a.label AS BIGINT) AS l1, CAST(b.label AS BIGINT) AS l2,
       |  round(${duckDot("a.cv", "b.cv")} /
       |        (${duckNorm("a.cv")} * ${duckNorm("b.cv")}), 6) AS cos_sim
       |FROM cvec a JOIN cvec b ON a.label < b.label
       |ORDER BY l1, l2""".stripMargin) { (s, d) =>
    val cents = Ivf.trainCentroids(tbl(s, d, "embeddings"))
    val a = cents.select(col("label").as("l1"), col("cv").as("cv1"))
    val b = cents.select(col("label").as("l2"), col("cv").as("cv2"))
    a.join(b, col("l1") < col("l2"))
      .select(col("l1").cast(LongType).as("l1"), col("l2").cast(LongType).as("l2"),
        round(cosine(col("cv1"), col("cv2")), 6).as("cos_sim"))
      .orderBy("l1", "l2")
  }

  private val LshBits = 8

  /** Random-hyperplane (SimHash-for-vectors) LSH ANN — the second scale
    * path next to IVF: an 8-bit signature from fixed ±1 hyperplanes (md5
    * of (plane, dim) decides the sign — engine-portable, no RNG), probe
    * expands to all buckets within Hamming distance 2 (multi-probe LSH),
    * cosine top-10 inside the probed buckets. Plan shape at 100 TB: the
    * hyperplane matrix is one broadcast literal row, signatures are a
    * map-side projection (materialize them once, like [[Ivf.buildIndex]],
    * to amortize), and the probe is a broadcast — the corpus never
    * shuffles and never all-pairs. */
  val annLsh = Query(
    "q_ann_lsh",
    s"""WITH hp AS (
       |  SELECT list(h ORDER BY j) AS hps FROM (
       |    SELECT j, list_transform(range(0, 64), i ->
       |      CASE WHEN substring(md5(CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)
       |             IN ('0','1','2','3','4','5','6','7')
       |        THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS h
       |    FROM range(0, $LshBits) t(j))),
       |sig AS (
       |  SELECT vec_id, embedding AS v,
       |    CAST(list_sum(list_transform(range(0, $LshBits), j ->
       |      CASE WHEN list_reduce(list_transform(range(1, 65), i ->
       |          hps[j + 1][i] * CAST(embedding[i] AS DOUBLE)), (a, b) -> a + b) >= 0
       |        THEN 1 << j ELSE 0 END)) AS BIGINT) AS bucket
       |  FROM embeddings, hp),
       |p AS (SELECT v AS pv, bucket AS pb FROM sig WHERE vec_id = 0)
       |SELECT s.vec_id,
       |  round(${duckDot("s.v", "p.pv")} / (${duckNorm("s.v")} * ${duckNorm("p.pv")}), 6) AS cos_sim
       |FROM sig s, p
       |WHERE s.vec_id <> 0 AND bit_count(CAST(xor(s.bucket, p.pb) AS BIGINT)) <= 2
       |ORDER BY cos_sim DESC, s.vec_id
       |LIMIT 10""".stripMargin) { (s, d) =>
    val hp = s.range(1).select(expr(
      s"""transform(sequence(0, ${LshBits - 1}), j ->
         |  transform(sequence(0, 63), i ->
         |    IF(substring(md5(concat(cast(j as string), ':', cast(i as string))), 1, 1)
         |         IN ('0','1','2','3','4','5','6','7'),
         |       cast(1.0 as double), cast(-1.0 as double))))""".stripMargin).as("hps"))
    val sig = tbl(s, d, "embeddings")
      .crossJoin(broadcast(hp))
      .select(col("vec_id"), col("embedding"), expr(
        s"""aggregate(sequence(0, ${LshBits - 1}), cast(0 as bigint), (acc, j) ->
           |  acc + IF(aggregate(zip_with(element_at(hps, j + 1), embedding,
           |                              (h, x) -> h * cast(x as double)),
           |                     cast(0.0 as double), (a, b) -> a + b) >= 0.0D,
           |           shiftleft(cast(1 as bigint), j), cast(0 as bigint)))""".stripMargin)
        .as("bucket"))
    val probe = sig.filter(col("vec_id") === 0)
      .select(col("embedding").as("pv"), col("bucket").as("pb"))
    sig.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .filter(expr("bit_count(bucket ^ pb) <= 2"))
      .select(col("vec_id"), round(cosine(col("embedding"), col("pv")), 6).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id"))
      .limit(10)
  }

  /** Matryoshka truncation quality: recall@10 of cosine ranking on the
    * 16-dim embedding PREFIX against the full 64-dim ranking, per probe
    * (first 20 vectors). The 4× dimension cut is the standard
    * matryoshka/MRL storage trade; this is its acceptance metric. Both
    * rankings are broadcast-probe map-side folds + per-probe top-10 —
    * the corpus never shuffles, so the measurement itself runs at
    * corpus scale. */
  val embedTruncate = Query(
    "q_embed_truncate",
    s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
       |p AS (SELECT vec_id AS pid, v AS pv FROM e WHERE vec_id < 20),
       |fullr AS (
       |  SELECT pid, vec_id FROM (
       |    SELECT p.pid, e.vec_id,
       |      row_number() OVER (PARTITION BY p.pid ORDER BY
       |        ${duckDot("e.v", "p.pv")} / (${duckNorm("e.v")} * ${duckNorm("p.pv")}) DESC, e.vec_id) AS rn
       |    FROM e, p WHERE e.vec_id <> p.pid) WHERE rn <= 10),
       |tr AS (
       |  SELECT pid, vec_id FROM (
       |    SELECT p.pid, e.vec_id,
       |      row_number() OVER (PARTITION BY p.pid ORDER BY
       |        ${duckDotN("e.v", "p.pv", 16)} /
       |        (${duckNormN("e.v", 16)} * ${duckNormN("p.pv", 16)}) DESC, e.vec_id) AS rn
       |    FROM e, p WHERE e.vec_id <> p.pid) WHERE rn <= 10)
       |SELECT f.pid AS vec_id, CAST(count(t.vec_id) AS BIGINT) AS n_hits,
       |  round(CAST(count(t.vec_id) AS DOUBLE) / 10, 6) AS recall
       |FROM fullr f LEFT JOIN tr t ON f.pid = t.pid AND f.vec_id = t.vec_id
       |GROUP BY f.pid
       |ORDER BY vec_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = tbl(s, d, "embeddings")
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("pid"), col("embedding").as("pv"))
    // ONE corpus pass scoring BOTH metrics, two rank windows over the
    // same (pid) exchange, intersection via a flag — the old shape
    // built full-dim and truncated top-10s as separate branches and
    // left-joined them, re-running the broadcast scoring pass per
    // branch (4 scans; at 100 TB the corpus pass IS the cost).
    val ranked = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"),
        cosine(col("embedding"), col("pv")).as("cs_full"),
        cosine(slice(col("embedding"), 1, 16), slice(col("pv"), 1, 16)).as("cs_tr"))
      .withColumn("rn_f", row_number().over(
        Window.partitionBy("pid").orderBy(desc("cs_full"), col("vec_id"))))
      .withColumn("rn_t", row_number().over(
        Window.partitionBy("pid").orderBy(desc("cs_tr"), col("vec_id"))))
    ranked.filter(col("rn_f") <= 10)
      .groupBy(col("pid").as("vec_id"))
      .agg(count(when(col("rn_t") <= 10, 1)).as("n_hits"),
        round(count(when(col("rn_t") <= 10, 1)).cast(DoubleType) / 10, 6).as("recall"))
      .orderBy("vec_id")
  }

  /** kNN CLASSIFICATION — the labeling composition the similarity ops
    * exist for: every 50th vector plays the unlabeled probe, its label
    * is predicted by majority vote over the 5 nearest labeled vectors
    * (cosine; round-6 scores so rank boundaries are engine-identical;
    * vote ties break to the smallest label — fully deterministic).
    * Brute-force scoring here because the probe set is the BROADCAST
    * side (fixed-size by construction) — the corpus never shuffles; at
    * real scale the neighbor search swaps to the IVF path (q_ann_ivf)
    * without touching the vote/predict stage. The output carries the
    * probe's true label beside the prediction — the holdout-accuracy
    * frame a labeling pipeline reports on. */
  val knnClassify = Query(
    "q_knn_classify",
    s"""WITH e AS (SELECT vec_id, embedding AS v, label FROM embeddings),
       |p AS (SELECT vec_id AS probe_id, v AS pv, label AS true_label
       |      FROM e WHERE vec_id % 50 = 0),
       |scored AS (
       |  SELECT probe_id, true_label, e.vec_id, e.label,
       |    round(${duckDot("v", "pv")} / (${duckNorm("v")} * ${duckNorm("pv")}), 6) AS sim
       |  FROM e, p WHERE e.vec_id % 50 <> 0
       |  QUALIFY row_number() OVER (PARTITION BY probe_id
       |    ORDER BY sim DESC, e.vec_id) <= 5),
       |votes AS (
       |  SELECT probe_id, true_label, label, CAST(count(*) AS BIGINT) AS n_votes
       |  FROM scored GROUP BY probe_id, true_label, label
       |  QUALIFY row_number() OVER (PARTITION BY probe_id
       |    ORDER BY n_votes DESC, label) = 1)
       |SELECT probe_id, CAST(label AS BIGINT) AS pred_label, n_votes,
       |  CAST(true_label AS BIGINT) AS true_label
       |FROM votes ORDER BY probe_id""".stripMargin) { (s, d) =>
    val e = tbl(s, d, "embeddings")
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("label").as("true_label"))
    val byProbe = Window.partitionBy("probe_id")
    e.filter(col("vec_id") % 50 =!= 0)
      .crossJoin(broadcast(probes))
      .select(col("probe_id"), col("true_label"), col("vec_id"), col("label"),
        round(cosine(col("embedding"), col("pv")), 6).as("sim"))
      .withColumn("rn", row_number().over(byProbe.orderBy(desc("sim"), col("vec_id"))))
      .filter(col("rn") <= 5)
      .groupBy("probe_id", "true_label", "label")
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(byProbe.orderBy(desc("n_votes"), col("label"))))
      .filter(col("vr") === 1)
      .select(col("probe_id"), col("label").cast(LongType).as("pred_label"),
        col("n_votes"), col("true_label").cast(LongType).as("true_label"))
      .orderBy("probe_id")
  }

  /** MMR diversity reranking (maximal marginal relevance, λ = 0.7) —
    * the rerank stage between retrieval and a context window: from the
    * top-20 cosine candidates of probe 0, greedily pick 5, each step
    * maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked,
    * so near-duplicate passages can't crowd the context. The corpus is
    * touched exactly once (the relevance TakeOrdered; at real scale
    * that leg swaps to the IVF path like q_knn_classify's); the
    * pairwise round-6 cosines over the ≤20-row pool are computed in
    * Spark, then BOTH bounded frames (≤20 cands, ≤380 sims) collect to
    * the driver and the inherently-sequential greedy runs there — the
    * Ivf-centroid class of documented K-row collect. (The previous
    * shape unrolled the recursion into five declarative anti-join +
    * argmax stages; correct, but each stage referenced the growing
    * selection twice, so Spark scheduled ~20 micro-jobs over 20-row
    * inputs — 2 s of pure scheduling. Greedy selection over a
    * fixed-size pool is driver work by construction.) The MMR
    * arithmetic is two IEEE double ops on round-6 scores — identical
    * in JVM and DuckDB — and the oracle replays the same five stages
    * as chained CTEs, so the hash match proves every pick and
    * tie-break.
    *
    * NOTE: building this query EXECUTES Spark jobs (localCheckpoint +
    * two bounded collects) at DataFrame-construction time — any
    * plan-only consumer iterating all queries triggers the corpus
    * TakeOrdered as a side effect (PlanDump already special-cases
    * this name; new tooling must too). */
  val mmrRerank = Query(
    "q_mmr_rerank",
    s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
       |p AS (SELECT v AS pv FROM e WHERE vec_id = 0),
       |cands AS (
       |  SELECT vec_id,
       |    round(${duckDot("v", "pv")} / (${duckNorm("v")} * ${duckNorm("pv")}), 6) AS rel,
       |    v
       |  FROM e, p WHERE vec_id <> 0
       |  QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id) <= 20),
       |sims AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b,
       |    round(${duckDot("x.v", "y.v")} / (${duckNorm("x.v")} * ${duckNorm("y.v")}), 6) AS sim
       |  FROM cands x JOIN cands y ON x.vec_id <> y.vec_id),
       |s1 AS (SELECT vec_id, rel, 1 AS rank, rel AS mmr
       |       FROM cands ORDER BY rel DESC, vec_id LIMIT 1),
       |r2 AS (SELECT c.vec_id, c.rel, 0.7 * c.rel - 0.3 * max(s.sim) AS mmr
       |       FROM cands c JOIN sims s ON s.a = c.vec_id
       |         AND s.b IN (SELECT vec_id FROM s1)
       |       WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)
       |       GROUP BY c.vec_id, c.rel ORDER BY mmr DESC, c.vec_id LIMIT 1),
       |s2 AS (SELECT * FROM s1 UNION ALL SELECT vec_id, rel, 2, mmr FROM r2),
       |r3 AS (SELECT c.vec_id, c.rel, 0.7 * c.rel - 0.3 * max(s.sim) AS mmr
       |       FROM cands c JOIN sims s ON s.a = c.vec_id
       |         AND s.b IN (SELECT vec_id FROM s2)
       |       WHERE c.vec_id NOT IN (SELECT vec_id FROM s2)
       |       GROUP BY c.vec_id, c.rel ORDER BY mmr DESC, c.vec_id LIMIT 1),
       |s3 AS (SELECT * FROM s2 UNION ALL SELECT vec_id, rel, 3, mmr FROM r3),
       |r4 AS (SELECT c.vec_id, c.rel, 0.7 * c.rel - 0.3 * max(s.sim) AS mmr
       |       FROM cands c JOIN sims s ON s.a = c.vec_id
       |         AND s.b IN (SELECT vec_id FROM s3)
       |       WHERE c.vec_id NOT IN (SELECT vec_id FROM s3)
       |       GROUP BY c.vec_id, c.rel ORDER BY mmr DESC, c.vec_id LIMIT 1),
       |s4 AS (SELECT * FROM s3 UNION ALL SELECT vec_id, rel, 4, mmr FROM r4),
       |r5 AS (SELECT c.vec_id, c.rel, 0.7 * c.rel - 0.3 * max(s.sim) AS mmr
       |       FROM cands c JOIN sims s ON s.a = c.vec_id
       |         AND s.b IN (SELECT vec_id FROM s4)
       |       WHERE c.vec_id NOT IN (SELECT vec_id FROM s4)
       |       GROUP BY c.vec_id, c.rel ORDER BY mmr DESC, c.vec_id LIMIT 1),
       |s5 AS (SELECT * FROM s4 UNION ALL SELECT vec_id, rel, 5, mmr FROM r5)
       |SELECT CAST(rank AS BIGINT) AS rank, vec_id, rel, round(mmr, 6) AS mmr
       |FROM s5 ORDER BY rank""".stripMargin) { (s, d) =>
    val e = tbl(s, d, "embeddings")
    val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("pv"))
    val cands = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("pv")), 6).as("rel"), col("embedding"))
      .orderBy(desc("rel"), col("vec_id")).limit(20)
      .localCheckpoint()
    // Bounded collects: ≤20 pool rows + ≤380 pairwise sims, regardless
    // of corpus size. Scores are round-6 BEFORE collection so the
    // driver-side greedy works on exactly the doubles the oracle sees.
    val simRows = cands.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(cands.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"), round(cosine(col("va"), col("vb")), 6).as("sim"))
      .collect()
    val sim = simRows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // DESC-with-NaN-first ordering, matching Spark's desc() and DuckDB's
    // ORDER BY ... DESC (both sort NaN as the largest double): negating
    // the value would send NaN LAST under Scala's default double
    // ordering and diverge from the oracle on a zero-norm embedding
    // (r19 review). TotalOrdering ranks NaN above +Inf, like both
    // engines — but it also ranks −0.0 BELOW +0.0, which both engines
    // treat as EQUAL (falling through to the vec_id tie-break), so
    // zeros are canonicalized inside the comparator only (r19j carry,
    // closed r20; emitted values stay raw — both sides compute them
    // from the same rounded doubles).
    val descNanFirst = Ordering.Double.TotalOrdering.reverse
    def canon(x: Double): Double = if (x == 0.0) 0.0 else x // −0.0 → +0.0
    val pool = cands.select(col("vec_id"), col("rel")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, rel) => (canon(rel), id) }(
        Ordering.Tuple2(descNanFirst, Ordering.Long))
    // Guarded for degenerate pools (< 5 candidates, or none at all): the
    // greedy emits min(5, |pool|) rows, matching the declarative shape's
    // graceful degradation on tiny fixtures.
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    if (pool.nonEmpty) picked += ((1, pool.head._1, pool.head._2, pool.head._2))
    for (k <- 2 to math.min(5, pool.length)) {
      val selIds = picked.map(_._2).toSet
      val (id, rel, mmr) = pool.iterator
        .filterNot { case (id, _) => selIds(id) }
        .map { case (id, rel) =>
          (id, rel, 0.7 * rel - 0.3 * selIds.iterator.map(sid => sim((id, sid))).max)
        }
        .minBy { case (id, _, mmr) => (canon(mmr), id) }(
          Ordering.Tuple2(descNanFirst, Ordering.Long))
      picked += ((k, id, rel, mmr))
    }
    import s.implicits._
    picked.toSeq.toDF("rank", "vec_id", "rel", "mmr")
      .select(col("rank").cast(LongType).as("rank"), col("vec_id"), col("rel"),
        round(col("mmr"), 6).as("mmr"))
      .orderBy("rank")
  }

  val queries: Seq[Query] =
    Seq(similarityTopk, centroidByLabel, annIvf, dedupEmbed, kmeansIter, annRecall,
      embedQuantize, similarityQuantized, centroidPairs, annLsh, embedTruncate,
      knnClassify, mmrRerank)
}
