package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api._

/** Near-duplicate detection over `documents` (north-star LLM-pipeline
  * operators, SURVEY §2C C6): MinHash+LSH, SimHash, and exact n-gram
  * Jaccard.
  *
  * Determinism: all hashing is `xxhash64` (fixed Spark seed 42) composed
  * with fixed odd-multiplier affine permutations — no randomness anywhere,
  * so results are stable across runs/partitionings. MinHash/SimHash have
  * no cheap SQL oracle (engine hash functions differ); they are covered
  * by unit tests with planted near-duplicates (split-invariance style,
  * SURVEY §5.2). n-gram Jaccard is pure set arithmetic and oracle-backed.
  *
  * Scale notes (100 TB): signatures are one scan + one groupBy(doc);
  * LSH banding turns the quadratic pair search into a bucket groupBy on
  * (band, bandhash) with per-member pair expansion ([[bucketPairs]]) —
  * candidate volume is controlled by (bands, rows), the signature
  * pipeline runs ONCE (a bands self-join would re-run it per side:
  * AQE broadcasts one side, so no exchange is shared), and per-row
  * state is O(bucket width), never O(width²). The exact-Jaccard op
  * scores ONLY LSH-banding survivors ([[bucketPairs]] candidates), so
  * its cost is bounded by candidate volume, not any block's size².
  */
object Dedup {

  /** Candidate pairs from LSH buckets WITHOUT a self-join: group by the
    * bucket key, collect the members once, then explode each member
    * against the bucket remainder (`b.doc_id > a.doc_id` ≙ the join's
    * `x.doc_id < y.doc_id`; `distinct` dedups pairs matching in several
    * buckets). Two bounds matter at 100 TB:
    *   - the signature pipeline runs ONCE (the r8 rework — a self-join
    *     re-ran it per side because AQE broadcast one side);
    *   - per-ROW memory is O(bucket width) — the collected member list
    *     and one member's pair fan-out — NOT the O(width²) a whole-
    *     bucket flatten would materialize in a single unsafe row.
    * The residual bound is the collect_list itself: bucket width ≈ the
    * largest near-duplicate cluster. That is the standard contract —
    * run exact dedup (q_dedup_exact) BEFORE near-dedup so mass-
    * duplicated boilerplate collapses first — but the contract is now
    * ENFORCED, not assumed: a bucket wider than [[MaxBucketWidth]] is
    * truncated to its [[MaxBucketWidth]] lowest doc_ids (sort_array
    * makes the kept set a pure function of content), so one degenerate
    * band key (all-empty documents, a template page repeated millions
    * of times) caps at MaxBucketWidth²/2 pairs instead of going
    * quadratic in the bucket. The SAME cap is mirrored in every
    * bucketPairs-backed oracle (QUALIFY row_number ≤ MaxBucketWidth per
    * bucket), so engine and oracle stay value-identical even if a
    * corpus ever produces a bucket wider than the cap. Width is
    * organic-cluster-scale at every tested sf (DedupSpec plants a hot
    * bucket to pin the bound); truncation trades recall ONLY inside a
    * pathological bucket, where the survivors are near-identical
    * boilerplate anyway. */
  val MaxBucketWidth = 4096

  /** SCORED pair stream: a pair appears once PER SHARED BUCKET (a doc
    * pair colliding in k bands/chunks yields k rows), already projected
    * to `(doc_a, doc_b[, m])` where `m` is the mode's pair metric
    * (match32 = equal-position count for MinHash est-Jaccard; hamming =
    * 128-bit xor popcount; ids = no metric — see
    * [[graft.functions.PairExpressions]]). r22b batch 3: the expansion
    * used to be `transform(filter(ds, b -> b.doc_id > a.doc_id), …)` —
    * two interpreted lambdas per bucket member — emitting pair structs
    * that CARRIED both signatures (~300 B/pair for 32-perm MinHash) to a
    * later metric projection; the native kernel computes the metric
    * inside the expansion loop, so pair rows are 24 B and the signature
    * payloads never materialize per pair (pair volume, not doc count,
    * is the term that grows at 100 TB). Pair domain and metric null
    * semantics are the lambda chain's verbatim (PairExpressionsSpec).
    * Consumers still dedup AFTER this projection (a metric is a pure
    * function of the pair, so distinct-on-(ids, m) ≡ distinct-on-ids),
    * and top-k consumers skip the pair exchange entirely via
    * TakeOrdered(k·maxBuckets) + dedup (see q_dedup_near; the r15c
    * duplication-decade audit: 556→128, 386→15, 581→94 MB). */
  private[graft] def bucketPairs(bucketed: DataFrame, keys: Seq[String],
      mode: String, maxWidth: Int = MaxBucketWidth): DataFrame = {
    val expanded = bucketed.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig")))).as("ds0"))
      .filter(size(col("ds0")) > 1)
      .select(slice(col("ds0"), 1, maxWidth).as("ds"))
      .select(col("ds"), posexplode(col("ds")).as(Seq("i", "a")))
      .select(explode(graft.functions.PairExpressions.bucketPairs(
        col("ds"), col("a"), mode)).as("p"))
    if (mode == "ids")
      expanded.select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
    else
      expanded.select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.m").as("m"))
  }

  val NumPerms = 32 // MinHash signature length
  val BandRows = 2  // rows per LSH band → 16 bands

  /** The LSH banding expression — per band, the ':'-joined stringified
    * signature rows — shared by both banding consumers (q_dedup_near's
    * signature-carrying explode and q_dedup_ngram's id-only explode) so
    * the bucketing rule cannot drift between them while each still
    * hash-matches its own oracle (r19 review). */
  private def bandExpr(nBands: Int): Column =
    expr(s"transform(sequence(0, ${nBands - 1}), " +
      s"b -> array_join(transform(sequence(1, $BandRows), " +
      s"r -> cast(element_at(sig, b * $BandRows + r) as string)), ':'))")

  /** THE oracle-side signature pipeline, shared verbatim by the
    * q_dedup_near and q_dedup_ngram oracles: corpus → word-3-gram
    * shingles → 48-bit md5 hash values (`vals.v`, the same leaf the
    * engine's [[minhashSignatures]] uses) → MinHash permutation minima →
    * per-doc signature list. One definition, so the shingle rule, the
    * hex polynomial, and the permutation constants (12289/9973/2³¹−1,
    * mirroring [[minhashA]]/[[minhashB]]/[[MinhashP]]) cannot drift
    * between the two dedup oracles. */
  private def duckSigCtes: String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id, substring(md5(unnest(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
      |    ELSE [array_to_string(t, ' ')] END)), 1, 12) AS hx
      |  FROM toks),
      |vals AS (
      |  SELECT doc_id, CAST(list_sum(list_transform(range(1, 13), j ->
      |    CAST(strpos('0123456789abcdef', substring(hx, j, 1)) - 1 AS BIGINT)
      |      << (4 * (12 - j)))) AS BIGINT) AS v
      |  FROM sh),
      |perm AS (
      |  SELECT doc_id, i, min((v * (12289 + 2 * i) + (9973 * i + 7)) % 2147483647) AS m
      |  FROM vals, range($NumPerms) r(i) GROUP BY doc_id, i),
      |sig AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM perm GROUP BY doc_id)""".stripMargin

  /** Word 3-gram shingles from a token-array column. IMPORTANT: pass a
    * MATERIALIZED attribute (a column that crossed an exchange), not an
    * inline `split(...)` expression — Catalyst inlines expressions into
    * the per-index lambda, re-tokenizing once per element (O(words²) per
    * row; measured 20× slowdown in the r2 bench). */
  def shinglesOf(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => array_join(slice(toks, i, lit(3)), " ")))
      .otherwise(array(array_join(toks, " ")))

  /** MinHash permutation constants: perm i maps the 48-bit shingle value
    * v to (Ai·v + Bi) mod P. Ai ≤ 15 bits keeps Ai·v < 2⁶³ (no BIGINT
    * overflow in either engine); P = 2³¹−1 (Mersenne prime). Fixed
    * arbitrary odd multipliers — pairwise-distinct affine maps are all
    * MinHash needs. */
  val MinhashP = 2147483647L
  def minhashA(i: Int): Long = 12289L + 2L * i
  def minhashB(i: Int): Long = 9973L * i + 7L

  /** doc_id → MinHash signature (array of NumPerms longs), ONE per-row
    * pass inside the scan stage (no explode, no aggregate, no exchange
    * — r22b batch 2, see the kernel note below). The base hash is the
    * first 12 hex digits of md5(shingle) read as a 48-bit integer —
    * byte-identical in Spark (`conv(hex,16,10)`) and DuckDB (digit
    * polynomial) — and the "permutations" are the portable affine maps
    * above, so the whole LSH pipeline is oracle-checkable while paying
    * only ONE md5 per shingle (an earlier draft salted md5 per
    * permutation: 32× the hashing, 3× the query time). A 48-bit base
    * aliases two of ~16M distinct shingles with probability ~1e-4 —
    * far below MinHash's own estimation variance, and identically in
    * both engines. */
  def minhashSignatures(docs: DataFrame): DataFrame =
    // ONE per-row native kernel (graft_minhash_h48, r22b batch 2):
    // shingle → h48 → per-permutation minima fused into a single pass.
    // The pre-r22b shape was explode(shingles) + a per-doc group
    // aggregate (graft_minhash_sig) — but the group key IS the row's
    // own doc_id (unique by fixture contract, and every downstream
    // consumer assumes it), so per-doc group ≡ per-row and the whole
    // explode + partial/final aggregate + buffer exchange disappears:
    // the signature is computed inside the scan stage. Values are the
    // aggregate's update arithmetic verbatim (TextExpressionsSpec pins
    // signature parity); the isNotNull filter replicates the old
    // explode's null-text drop (split(NULL) explodes to zero rows).
    // (duplicate shingles cannot change a min, so no distinct needed)
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextExpressions.minhashH48(split(col("text"), " "),
          (0 until NumPerms).map(minhashA), (0 until NumPerms).map(minhashB),
          MinhashP).as("sig"))

  // (the explode-based shingleVals helper — (doc_id, per-shingle h48)
  // rows behind a repartition barrier — is gone, r22b: both former
  // consumers run per-row kernels now, minhashSignatures above and
  // dedupNgramWith's survivor shingle sets via graft_shingle_h48_distinct)

  /** C6 — MinHash + LSH banding near-dup candidates: band the signature,
    * equi-join on (band, concatenated band rows), estimate Jaccard as
    * the matching-signature fraction. Top-20 candidate pairs. The md5
    * permutations make the whole pipeline — signatures, banding,
    * candidate set, estimates — reproducible in ANSI SQL, so this is
    * hash-compared against DuckDB like every relational query (it was
    * property-test-only while the permutations were engine-specific
    * xxhash64). */
  val dedupNear = Query(
    "q_dedup_near",
    s"""WITH $duckSigCtes,
      |bands AS (
      |  SELECT doc_id, sig, b,
      |    array_to_string(list_transform(range(1, $BandRows + 1),
      |      r -> CAST(sig[$BandRows*b+r] AS VARCHAR)), ':') AS bh
      |  FROM sig, range(${NumPerms / BandRows}) rb(b)
      |  QUALIFY row_number() OVER (PARTITION BY b, bh ORDER BY doc_id) <= $MaxBucketWidth),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.sig AS sa, y.sig AS sb
      |  FROM bands x JOIN bands y ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id)
      |SELECT doc_a, doc_b,
      |  round(CAST(len(list_filter(range(1, ${NumPerms + 1}), i -> sa[i] = sb[i])) AS DOUBLE) / $NumPerms, 6) AS est_jaccard
      |FROM cand
      |ORDER BY est_jaccard DESC, doc_a, doc_b
      |LIMIT 20""".stripMargin) { (s, d) =>
    val sigs = minhashSignatures(tbl(s, d, "documents"))
    val nBands = NumPerms / BandRows
    // band key derives from ALL BandRows signature rows (not a hardcoded
    // first-two), so changing BandRows cannot silently weaken the banding.
    // The signature rides the banding exchange once per band (the bucket
    // task needs both members' values for est_jaccard), so it travels as
    // array<int> — every MinHash minimum is < 2³¹−1 by construction
    // (mod MinhashP), the cast is lossless, int equality ≡ long
    // equality, and the exchange halves.
    val bands = sigs.select(col("doc_id"),
      col("sig").cast("array<int>").as("sig"),
      posexplode(bandExpr(nBands)).as(Seq("band", "bh")))
    // signatures computed ONCE, pairs expanded per bucket, per-row state
    // O(bucket width) — see bucketPairs for the full scale contract
    // No global pair-dedup exchange at all: a pair appears at most once
    // per band (≤ nBands rows), and duplicates are EQUAL under the total
    // order (est_jaccard, doc_a, doc_b) — so the 20th DISTINCT pair's
    // first occurrence lies within the first 20·nBands rows (≤ 19·nBands
    // rows of better-or-equal distinct pairs + its own ≤ nBands−1 earlier
    // copies precede it). TakeOrdered(20·nBands) — per-partition heaps,
    // K rows to the driver, zero shuffle — then dedup the K rows and cut
    // to 20. Bit-identical to distinct-then-top-20 (the r15c audit's
    // pair-dedup exchange was 190+ MB on the duplication corpus; now 0).
    // match count computed INSIDE the pair-expansion kernel (r22b
    // batch 3, mode match32 — graft_match_count's rule verbatim), so
    // pair rows never carry the signatures
    bucketPairs(bands, Seq("band", "bh"), "match32")
      .select(col("doc_a"), col("doc_b"),
        round(col("m").cast(DoubleType) / NumPerms, 6).as("est_jaccard"))
      .orderBy(desc("est_jaccard"), col("doc_a"), col("doc_b"))
      .limit(20 * nBands)
      .distinct()
      .orderBy(desc("est_jaccard"), col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** SimHash: 64-bit signature where bit k is the sign of the sum of
    * (±1) contributions of token-hash bit k. Near-dups = small Hamming
    * distance; candidate pairs share at least one of four 16-bit chunks
    * (chunk blocking ≙ LSH banding for Hamming space).
    *
    * Perf (r2 verdict fix): the old shape — explode + a 64-column
    * aggregate + a 64-deep bitwiseOR fold — blew past the JIT method
    * limit into interpreted eval (29.6 s at sf0.1, 32% of the whole
    * bench). Now the signature is pure per-row array math: token hashes
    * materialize once as ONE array column, each signature bit is an
    * allocation-free integer fold over that array, and the 64 bits
    * assemble with a single OR fold. No explode, no aggregate node —
    * the only exchange is the repartition barrier below, which both
    * sides of the LSH self-join then reuse (ReusedExchange). Integer
    * sums are order-independent, so the signature is bit-identical to
    * the old grouped version (DedupSpec planted-dup tests unchanged). */
  def simhashSignatures(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        // ENFORCED lane bound (r20): the packed 16-bit lanes in
        // simhashExpr wrap past 65,535 tokens, so the token stream is
        // clamped to its first [[SimhashMaxTokens]] hashes BEFORE the
        // fold (and size(hs) below is the clamped count, keeping the
        // majority rule exact over the kept prefix). For a longer doc
        // the signature is the simhash of its 65,535-token prefix —
        // a documented, deterministic recall trade (prefix ≈ doc for
        // near-dup purposes) instead of the silent lane wrap that
        // previously corrupted the whole signature (e.g. one token
        // repeated 70k times drove its lane counts to 70000 mod 2^16
        // = 4464 < n/2, flipping every majority bit).
        slice(transform(split(col("text"), " "), t => xxhash64(t)),
          1, SimhashMaxTokens).as("hs"))
      // exchange barrier: hs must be a materialized attribute, else
      // CollapseProject inlines split+xxhash into all 64 folds below
      // (the r2 shingle lesson — see shinglesOf).
      .repartition(col("doc_id"))
      .select(col("doc_id"), expr(simhashExpr).as("simhash"))

  /** Carry-safe token bound for [[simhashSignatures]]'s packed 16-bit
    * lanes: documents longer than this are clamped to their first
    * 65,535 tokens (prefix simhash). [[simhashHexSignatures]] does NOT
    * clamp — its native aggregate counts in 64-bit lanes. */
  val SimhashMaxTokens = 65535

  /** Packed-lane bit counting: word j (j = 0..15) accumulates
    * `(h >> j) & 0x0001000100010001` over all token hashes, so its four
    * 16-bit lanes count bits j, j+16, j+32, j+48 — 16 folds of 2 integer
    * ops per token instead of 64 folds (or a 64-column aggregate). Lanes
    * are carry-safe up to 65,535 tokens/doc — ENFORCED by the
    * [[SimhashMaxTokens]] clamp in [[simhashSignatures]] (the expression
    * itself must only ever see a clamped `hs`). The fold accumulator
    * starts at −2⁶³, not 0: the four maxed lanes sum to exactly 2⁶⁴−1,
    * which overflows SIGNED 64-bit once the top lane (bits 48–63)
    * exceeds 32,767 — under ANSI mode the unbiased r19 fold CRASHED
    * there (found while enforcing the clamp; the documented 65,535
    * bound was wrong for the top lane). Biased, the monotone sum spans
    * [−2⁶³, 2⁶³−1] exactly; the bias only flips bit 63, undone by one
    * `^ 32768` when extracting the top lane. Sign-extension from the
    * arithmetic shift only touches bits ≥ 64-j ≥ 49 > 48 = the highest
    * mask bit, so negative hashes are safe. Bit k of the signature is
    * set iff 2*count_k > n_tokens (≡ the ±1 sum being > 0). The
    * `transform(array(...), ws -> ...)` wrapper binds the 16 fold
    * results ONCE as a lambda variable — referencing a plain alias 64
    * times would re-inline (and re-run) all 16 folds per reference
    * (CollapseProject, the r2 shingle lesson). */
  private val simhashExpr =
    """element_at(transform(array(
      |    transform(sequence(0, 15), j ->
      |      aggregate(hs, shiftleft(CAST(1 AS BIGINT), 63),
      |        (acc, h) -> acc + (shiftright(h, j) & 281479271743489L)))),
      |  ws -> aggregate(
      |    transform(sequence(0, 63), k ->
      |      IF(2 * (CASE WHEN k div 16 = 3
      |              THEN (shiftright(element_at(ws, (k % 16) + 1), 48) & 65535) ^ 32768
      |              ELSE shiftright(element_at(ws, (k % 16) + 1), 16 * (k div 16)) & 65535
      |              END) > size(hs),
      |         shiftleft(CAST(1 AS BIGINT), k), 0L)),
      |    0L, (acc, x) -> acc | x)), 1)""".stripMargin

  /** Portable 64-bit SimHash signature as a 16-char hex STRING, built
    * from md5 token hashes so DuckDB can replay it bit-for-bit: token →
    * first 16 md5 hex digits; per (doc, digit position j) count each of
    * the digit's 4 bits across tokens; signature digit j = the 4
    * majority bits reassembled (bit r set iff 2·count_r > n_tokens).
    * Explode-by-digit keeps every step codegen'd (no higher-order
    * lambdas in the hot path) at a bounded 16× row fan-out; the two
    * aggregations are partial+final. `simhashSignatures` above stays the
    * scale path (one per-row fold, zero fan-out, engine-specific
    * xxhash64) — same algorithm, different hash leaf; this variant
    * exists so the LSH chunk-blocking pipeline is oracle-checkable. */
  def simhashHexSignatures(docs: DataFrame): DataFrame =
    // ONE per-row native kernel (graft_simhash_hex, r22b batch 2): token
    // → md5 prefix → 64 majority lanes → hex digits, fused into a single
    // pass inside the scan stage. The r14 shape (explode per token, the
    // md5/conv projection, then the graft_simhash_sig 65-long-buffer
    // group aggregate) was already one corpus pass, but materialized a
    // per-TOKEN row stream through Generate + aggregate hash probes and
    // shipped per-doc buffers across a groupBy(doc_id) exchange — and
    // the group key is the row's own doc_id (unique by fixture
    // contract), so per-doc group ≡ per-row and all three nodes
    // disappear. Same majority rule, same digit order, bit-identical
    // signatures (TextExpressionsSpec pins kernel-vs-aggregate parity;
    // DedupSpec's planted dups and the q_dedup_simhash oracle
    // hash-match unchanged). The isNotNull filter replicates the old
    // explode's null-text drop.
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextExpressions.simhashHex(split(col("text"), " ")).as("sig"))

  /** SimHash near-dup candidates: 16-bit-chunk-blocked pairs (4-hex-char
    * substring equality ≙ Hamming LSH banding) ranked by Hamming
    * distance, computed digit-wise from the hex signatures. Fully
    * oracle-backed now that the signature is md5-derived (it was
    * property-test-only while it used engine-specific xxhash64). */
  val dedupSimhash = Query(
    "q_dedup_simhash",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |tok AS (
      |  SELECT doc_id, len(t) AS n, substring(md5(unnest(t)), 1, 16) AS hx
      |  FROM toks),
      |dig AS (
      |  SELECT doc_id, n, j, strpos('0123456789abcdef', substring(hx, j, 1)) - 1 AS dv
      |  FROM tok, range(1, 17) r(j)),
      |perdigit AS (
      |  SELECT doc_id, j,
      |    CASE WHEN 2 * sum(dv & 1) > any_value(n) THEN 1 ELSE 0 END
      |    + CASE WHEN 2 * sum((dv >> 1) & 1) > any_value(n) THEN 2 ELSE 0 END
      |    + CASE WHEN 2 * sum((dv >> 2) & 1) > any_value(n) THEN 4 ELSE 0 END
      |    + CASE WHEN 2 * sum((dv >> 3) & 1) > any_value(n) THEN 8 ELSE 0 END AS digit
      |  FROM dig GROUP BY doc_id, j),
      |sig AS (
      |  SELECT doc_id,
      |    string_agg(substring('0123456789abcdef', digit + 1, 1), '' ORDER BY j) AS sig
      |  FROM perdigit GROUP BY doc_id),
      |chunks AS (
      |  SELECT doc_id, sig, c, substring(sig, 4 * c + 1, 4) AS chunk
      |  FROM sig, range(4) rc(c)
      |  QUALIFY row_number() OVER (PARTITION BY c, chunk ORDER BY doc_id) <= $MaxBucketWidth),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.sig AS sa, y.sig AS sb
      |  FROM chunks x JOIN chunks y ON x.c = y.c AND x.chunk = y.chunk
      |                            AND x.doc_id < y.doc_id)
      |SELECT doc_a, doc_b,
      |  CAST(list_sum(list_transform(range(1, 17), j ->
      |    bit_count(xor(strpos('0123456789abcdef', substring(sa, j, 1)) - 1,
      |                  strpos('0123456789abcdef', substring(sb, j, 1)) - 1)))) AS BIGINT)
      |    AS hamming
      |FROM cand
      |ORDER BY hamming, doc_a, doc_b
      |LIMIT 20""".stripMargin) { (s, d) =>
    val sigs = simhashHexSignatures(tbl(s, d, "documents"))
    // Pack the 16-hex-char signature into two 32-bit halves ONCE per doc
    // (5k conv calls) so the per-PAIR Hamming is two xor+bit_count's of
    // codegen'd integer math. The previous digit-wise form ran a 16-step
    // higher-order lambda of locate/substring per candidate pair — at
    // 191k LSH collision pairs on this corpus that was the query's
    // dominant cost, and pair volume (not doc count) is what grows at
    // 100 TB. Identical value: popcount(xor) decomposes over hex digits.
    val chunks = sigs.select(col("doc_id"),
      struct(
        expr("CAST(conv(substring(sig, 1, 8), 16, 10) AS BIGINT)").as("hi"),
        expr("CAST(conv(substring(sig, 9, 8), 16, 10) AS BIGINT)").as("lo"))
        .as("sig"),
      posexplode(expr("transform(sequence(0, 3), c -> substring(sig, 4 * c + 1, 4))"))
        .as(Seq("c", "chunk")))
    // Zero-shuffle pair ranking (same argument as q_dedup_near): a pair
    // collides in at most 4 chunks and its copies are equal under
    // (hamming, doc_a, doc_b), so TakeOrdered(20·4) + dedup + cut-to-20
    // is bit-identical to distinct-then-top-20 with no pair exchange.
    // Hamming (bit_count(hi⊕hi) + bit_count(lo⊕lo)) computed INSIDE the
    // pair-expansion kernel (r22b batch 3, mode hamming).
    bucketPairs(chunks, Seq("c", "chunk"), "hamming")
      .select(col("doc_a"), col("doc_b"), col("m").cast(LongType).as("hamming"))
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      .limit(20 * 4)
      .distinct()
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** Exact word-3-gram Jaccard similarity scored on LSH-survivor pairs —
    * the verification-grade near-dup measure, with the pair DOMAIN taken
    * from MinHash banding ([[bucketPairs]]) rather than coarse
    * (lang, source) blocks. The earlier blocked form was O(block²): at
    * 100 TB an `en`/`web` block is most of the corpus and the join is
    * quadratic death (r8 verdict); LSH candidates bound the scored set
    * by bucket-collision volume instead. The intersect runs over 48-bit
    * shingle HASHES (the same portable md5-derived `h48` leaf the
    * signature uses), not 3-gram strings — integer set ops, and one
    * corpus scan feeds signature + shingle set via a single aggregate.
    * Exactness: Jaccard over the hash sets equals Jaccard over the
    * shingle strings up to 48-bit collisions (~1e-4 over ~16M shingles,
    * identically in both engines — see [[minhashSignatures]]). */
  val dedupNgram = Query(
    "q_dedup_ngram",
    s"""WITH $duckSigCtes,
      |shset AS (SELECT doc_id, list_distinct(list(v)) AS s FROM vals GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, b,
      |    array_to_string(list_transform(range(1, $BandRows + 1),
      |      r -> CAST(sig[$BandRows*b+r] AS VARCHAR)), ':') AS bh
      |  FROM sig, range(${NumPerms / BandRows}) rb(b)
      |  QUALIFY row_number() OVER (PARTITION BY b, bh ORDER BY doc_id) <= $MaxBucketWidth),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id)
      |SELECT doc_a, doc_b,
      |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
      |FROM cand JOIN shset a ON cand.doc_a = a.doc_id
      |          JOIN shset b ON cand.doc_b = b.doc_id
      |WHERE len(list_intersect(a.s, b.s)) > 0
      |ORDER BY jaccard DESC, doc_a, doc_b
      |LIMIT 20""".stripMargin) { (s, d) =>
    // persist, not localCheckpoint (r22, DedupNgramAB decade A/B:
    // persist 3.5/3.9/3.5 s vs ckpt 5.7/4.5/4.3 s vs none 4.9/4.1/4.3 s
    // interleaved at /tmp/graft_sf1; ties at sf0.1): localCheckpoint is
    // EAGER — it runs the subtree as an extra build-time job and pins
    // its blocks before the consuming job starts — while persist reuses
    // blocks lazily inside the consuming job. Both pin K-row-class
    // blocks for the session (identical leak profile); results
    // cross-checked identical (DIFF = 0 both corpora).
    dedupNgramWith(tbl(s, d, "documents"),
      _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** The q_dedup_ngram pipeline with a pluggable materialization
    * barrier for the two reused K-row-class frames (candidate pairs,
    * survivor shingle sets) — the declared query passes `persist`
    * (see the A/B note above); [[graft.DedupNgramAB]] times the
    * alternatives (no barrier / localCheckpoint) against it (r21
    * verdict #4).
    *
    * Two-job LSH verify (the standard shape): job 1 = signature
    * pipeline → banding → collision pairs; job 2 = re-shingle ONLY
    * candidate docs (broadcast semi-join pushes the doc_id filter below
    * the shingle explode) and score exactly. The candidate set is
    * collision-bounded — tiny next to the corpus — so it takes the
    * barrier (documented lineage break, K-row class) and the expensive
    * signature pipeline runs exactly ONCE; the verification scan does
    * near-zero CPU outside the surviving docs. (A single-plan variant
    * sharing one aggregate was tried: per-branch column pruning makes
    * the three consumers' subtrees non-identical, so ReusedExchange
    * never fires and the corpus is scanned 3×.) */
  private[graft] def dedupNgramWith(docs: DataFrame,
      barrier: DataFrame => DataFrame): DataFrame = {
    val sigs = minhashSignatures(docs)
    val nBands = NumPerms / BandRows
    // This consumer needs only the PAIR IDS, so the signature does not
    // ride the banding exchange at all — bucketPairs' struct gets a
    // zero-byte-class placeholder sig (sort_array still orders by
    // doc_id first, so the cap keeps the same lowest ids).
    val bands = sigs.select(col("doc_id"), lit(0).as("sig"),
      posexplode(bandExpr(nBands)).as(Seq("band", "bh")))
    // id-only projection BEFORE the distinct: this consumer never reads
    // the signatures, so the pair-dedup exchange ships 16 B/pair
    // (bucketPairs). The distinct is REQUIRED here — multi-band
    // collisions would otherwise score (and emit) a pair repeatedly.
    val cands = barrier(bucketPairs(bands, Seq("band", "bh"), "ids")
      .distinct())
    val candIds = cands.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    // barrier: used twice (probe side + broadcast side), and the
    // output is K-row class (one row per SURVIVOR doc, bounded by
    // 2x candidate pairs). Without it each side re-runs the filtered
    // scan + shingle pass.
    // r22b: the per-doc distinct shingle set comes from ONE per-row
    // kernel (graft_shingle_h48_distinct) instead of explode +
    // groupBy(doc_id) collect_set — per-doc group ≡ per-row (doc_id
    // unique), downstream only takes array_intersect/size, so the
    // set-order difference (first-occurrence vs collect_set's
    // accumulation order) is invisible. The isNotNull filter replicates
    // the old explode's null-text drop.
    // sets are SORTED (canonical order — same distinct set, and ∩-size
    // is order-free) so the per-pair scorer below is an allocation-free
    // merge walk instead of array_intersect's per-evaluation hash sets
    // + result array (pair volume is the term that grows; r22b batch 3)
    val sets = barrier(docs.join(broadcast(candIds), Seq("doc_id"), "leftsemi")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextExpressions.shingleH48DistinctSorted(
          split(col("text"), " ")).as("shset")))
    val setsA = sets.select(col("doc_id").as("doc_a"), col("shset").as("sa"))
    val setsB = sets.select(col("doc_id").as("doc_b"), col("shset").as("sb"))
    // = size(array_intersect(sa, sb)) on distinct inputs (parity pinned
    // in TextExpressionsSpec)
    val inter = graft.functions.TextExpressions.sortedIntersectCount(col("sa"), col("sb"))
    cands.join(setsA, "doc_a").join(setsB, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        inter.as("ni"), size(col("sa")).as("na"), size(col("sb")).as("nb"))
      .filter(col("ni") > 0)
      .select(col("doc_a"), col("doc_b"),
        round(col("ni").cast(DoubleType) / (col("na") + col("nb") - col("ni")), 6).as("jaccard"))
      .orderBy(desc("jaccard"), col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** Edit-distance near-dup on short strings: part-name pairs ranked by
    * Levenshtein distance (identical definition in both engines — exact
    * integer oracle). Blocking key is (brand, 4-char name prefix) —
    * classic prefix blocking; candidates whose first edit falls inside
    * the prefix are sacrificed, which bounds the quadratic term hard
    * (the same recall-for-scale trade every blocking scheme makes). */
  val dedupEditDistance = Query(
    "q_dedup_editdist",
    """SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand
      | AND substring(a.p_name, 1, 4) = substring(b.p_name, 1, 4)
      | AND a.p_partkey < b.p_partkey
      |ORDER BY edit_dist, part_a, part_b
      |LIMIT 20""".stripMargin) { (s, d) =>
    // Reduce-then-expand: the name domain is tiny (64 distinct names vs
    // 20k rows at sf0.1), so Levenshtein runs once per distinct ordered
    // name pair within a block (~10^3 evaluations) instead of once per
    // id pair (~10^6). The id-pair expansion afterwards is pure
    // broadcast-join fan-out feeding TakeOrdered — no distance math on
    // the hot path. Same output as the naive pair join, same oracle.
    val p = tbl(s, d, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_name"),
        substring(col("p_name"), 1, 4).as("pfx"))
    val names = p.select(col("p_brand"), col("pfx"), col("p_name")).distinct()
    val npairs = names.select(col("p_brand"), col("pfx"), col("p_name").as("name_a"))
      .join(names.select(col("p_brand"), col("pfx"), col("p_name").as("name_b")),
        Seq("p_brand", "pfx"))
      .select(col("p_brand"), col("pfx"), col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast(LongType).as("edit_dist"))
    val idsA = p.select(col("p_brand"), col("pfx"), col("p_name").as("name_a"),
      col("p_partkey").as("part_a"))
    val idsB = p.select(col("p_brand"), col("pfx"), col("p_name").as("name_b"),
      col("p_partkey").as("part_b"))
    idsA.join(broadcast(npairs), Seq("p_brand", "pfx", "name_a"))
      .join(idsB, Seq("p_brand", "pfx", "name_b"))
      .filter(col("part_a") < col("part_b"))
      .select(col("part_a"), col("part_b"), col("edit_dist"))
      .orderBy(col("edit_dist"), col("part_a"), col("part_b"))
      .limit(20)
  }

  /** Minimum-label propagation connected components (Pregel shape): each
    * node starts as its own representative; every round each node takes
    * the min rep over itself and its neighbors until fixpoint. The
    * converged rep (min doc_id reachable) is unique, so the result is
    * independent of partitioning and iteration order.
    *
    * Scale notes: each round is ONE equi-join + ONE partial+final min
    * aggregate — no all-pairs anywhere; rounds = component diameter
    * (near-dup clusters are shallow). The driver-side loop is algorithm
    * control flow (a convergence check per round), not per-row work; the
    * per-round `localCheckpoint` truncates lineage so plan depth stays
    * constant — at cluster scale you'd swap in a reliable checkpoint dir.
    *
    * @param nodes single-column `doc_id`; @param edges `doc_a`/`doc_b`. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val e2 = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    // Seed = the first propagation round folded into initialization:
    // every node starts at min(self, direct neighbors) instead of self,
    // saving one full driver round (initial rep=id makes round 1's
    // neighbor-rep lookup the identity anyway).
    var lab = nodes.select(col("doc_id"), col("doc_id").as("rep"))
      .union(e2.select(col("src").as("doc_id"), col("dst").as("rep")))
      .groupBy("doc_id").agg(min("rep").as("rep"))
      .localCheckpoint()
    // Labels only ever decrease, so the fixpoint test is one tiny
    // aggregate — sum(rep) unchanged — instead of a self-join per round.
    var prevSum = Option.empty[Long]
    var converged = false
    var rounds = 0
    // pointer jumping converges in O(log diameter); 64 rounds covers any
    // graph this universe can hold — the guard only protects against a
    // logic regression turning into an infinite driver loop.
    while (!converged && rounds < 64) {
      rounds += 1
      val viaNbr = e2.join(lab.withColumnRenamed("doc_id", "dst"), "dst")
        .select(col("src").as("doc_id"), col("rep"))
      // Checkpoint before the self-join below: both sides then share one
      // clean leaf (Catalyst's constraint rewrite rejects a self-joined
      // Union), and lineage stays constant-depth across rounds.
      val propagated = lab.select("doc_id", "rep").union(viaNbr)
        .groupBy("doc_id").agg(min("rep").as("rep"))
        .localCheckpoint(eager = false) // materialized by the sum below
      // Double pointer jump: rep -> rep² -> rep⁴, quartering label-chain
      // lengths per round (fewer driver rounds = fewer jobs; each jump is
      // one tiny equi-join). Same fixpoint (min reachable id): a rep's
      // own label only ever points lower, so jumps never overshoot.
      val j1 = propagated
        .join(propagated.select(col("doc_id").as("rep"), col("rep").as("rep2")), "rep")
        .select(col("doc_id"), col("rep2").as("rep"))
        .localCheckpoint(eager = false)
      val next = j1
        .join(j1.select(col("doc_id").as("rep"), col("rep").as("rep2")), "rep")
        .select(col("doc_id"), col("rep2").as("rep"))
      // sum over ZERO rows is SQL NULL — getLong would NPE on an empty
      // node set (r19 review); 0 is a fine fixed-point witness there
      val row = next.agg(sum("rep")).head
      val s = if (row.isNullAt(0)) 0L else row.getLong(0)
      converged = prevSum.contains(s)
      prevSum = Some(s)
      lab = next
    }
    lab
  }

  /** Near-dup candidate edges: same (lang, source) block AND at least one
    * shared distinct word-3-gram — the q_dedup_ngram pair condition
    * relaxed to candidate level. Both consumers feed
    * [[connectedComponents]], which needs CONNECTIVITY, not pairs — so
    * each inverted-index posting group emits a SPANNING STAR (every
    * member → the group's min doc_id, df−1 edges) instead of the clique
    * (C(df,2) pairs): within a group both edge sets connect exactly the
    * same member set, so the transitive closure over the union of
    * groups — the components — is identical, while edge volume drops
    * from sum(df²) to sum(df). The difference is decisive exactly where
    * near-dedup earns its keep: on a duplication-dense corpus (SCALE.md
    * r15c duplication decade) df scales with the copy count and the
    * clique form's 16.6 s label build collapses to the linear star
    * form. Min-star edges also cut component diameter: the group min is
    * directly adjacent to every member, so label propagation converges
    * in fewer rounds. */
  private[graft] def candidateEdges(docs: DataFrame): DataFrame = {
    // group on the 8-byte xxhash64 of the shingle, not the shingle
    // string: narrower shuffle rows and cheaper key compares. A 64-bit
    // collision could only ADD a spurious candidate edge, with
    // probability ~(distinct shingles)²/2⁶⁵ — ≈1e-9 at sf0.1 and still
    // <1e-3 per billion shingles, far below any practical concern for
    // candidate generation (near-dup recall/precision tolerances dwarf
    // it).
    // r22: `graft_shingle_xxh64_distinct` fuses shingle + xxhash64 +
    // per-doc dedup into one kernel (identical values to the
    // array_distinct(transform(...)) chain — TextExpressionsSpec), so
    // the corpus-wide repartition(doc_id) barrier exchange is gone (the
    // kernel evaluates split once per row; see shingleVals). The
    // min-per-group star edges come from ONE window over the posting
    // exchange instead of groupBy + self-join: the join form shipped the
    // postings across (lang, source, h) TWICE (once into the mins
    // aggregate, once as the probe side) — the window computes the same
    // group min over a single exchange. Null keys: a null lang/source
    // posting never joined (equi-join semantics), so the window form
    // filters them explicitly; h is never null (xxhash64(NULL) = seed).
    import org.apache.spark.sql.expressions.Window
    val postings = docs
      .filter(col("lang").isNotNull && col("source").isNotNull)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(graft.functions.TextExpressions.shingleXxh64Distinct(
          split(col("text"), " "))).as("h"))
    postings
      .withColumn("m",
        min(col("doc_id")).over(Window.partitionBy(col("lang"), col("source"), col("h"))))
      .filter(col("doc_id") =!= col("m"))
      .select(col("m").as("doc_a"), col("doc_id").as("doc_b"))
      .distinct()
  }

  /** Write-once-per-(session, sf) materialized cluster labels — the
    * dedup INDEX a production pipeline maintains next to the corpus
    * (same pattern as Ivf.buildIndex): compute components once, park
    * them in parquet, and every consumer (cluster report, corpus
    * cleaning) reuses the materialization instead of re-running the
    * iterative join rounds.
    *
    * Two layers of reuse: a JVM-level memo (keyed by session × dataset,
    * so a stopped session's DataFrames are never handed to a new one)
    * guarantees the iterative build runs at most once per process even
    * if the filesystem cache is unavailable; the parquet materialization
    * underneath gives cross-process reuse and is what a cluster
    * deployment would keep in the lake next to the corpus. */
  // Keyed by session OBJECT (reference identity — can't collide the way
  // identityHashCode strings could, and an entry is only ever served to
  // the exact session that built it), with explicit eviction of stopped
  // sessions on every access. A WeakHashMap cannot provide the lifecycle
  // here: the cached DataFrame strongly references its session, which is
  // the map key — the value→key anti-pattern the WeakHashMap javadoc
  // warns about — so weak entries would never clear. The inner map
  // stores lazily-evaluated thunks: only the cheap closure insertion
  // happens under any map lock, and the multi-second component build
  // runs outside it (the lazy val's own monitor still guarantees
  // exactly-once per key).
  private val ccMemo =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, () => DataFrame]]()

  def clusterLabels(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    // scratch choke point BEFORE the memo: every caller depends on the
    // persistent label cache even when this session already paid the
    // build, so the write-path audit must see all of them
    graft.ScratchObserver.touch()
    // evict memo entries of stopped sessions — their DataFrames are
    // unusable, and holding them would leak across session cycles in a
    // long-lived JVM
    val it = ccMemo.keySet.iterator()
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
    val perSession = ccMemo.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[String, () => DataFrame]())
    perSession.computeIfAbsent(d, _ => {
      lazy val built: DataFrame = {
        val dir = s"${System.getProperty("java.io.tmpdir")}/graft_cc_" +
          s"${d.replaceAll("[^a-zA-Z0-9]", "_")}_" +
          graft.api.contentFingerprint(s"$d/documents.parquet")
        if (new java.io.File(dir, "_SUCCESS").exists()) s.read.parquet(dir)
        else {
          val docs = tbl(s, d, "documents")
          val lab = connectedComponents(docs.select("doc_id"), candidateEdges(docs))
          // atomic publish (buildOnce): a concurrent builder can never
          // serve a half-written label set
          scala.util.Try(graft.api.buildOnce(dir, marker = Some("_SUCCESS")) {
              tmp => lab.write.mode("overwrite").parquet(tmp) })
            .map(p => s.read.parquet(p))
            // if the scratch dir is unwritable, serve the checkpointed
            // in-memory result — correctness never depends on the cache
            .getOrElse(lab.localCheckpoint())
        }
      }
      () => built
    })()
  }

  /** The shared recursive-CTE prefix of the three cluster oracles
    * (q_dedup_cluster / q_corpus_clean / q_cluster_rep): the shingle
    * rule — INCLUDING [[shinglesOf]]'s <3-token whole-text branch,
    * which the three inline copies had dropped while [[duckSigCtes]]
    * kept it (r19 review: a 1–2-token duplicate pair clustered in the
    * engine but not in the oracle) — plus blocked candidate edges and
    * min-label connected components. One definition, so the rule
    * cannot drift between the engine and any of the three oracles. */
  private def duckClusterCtes: String =
    """s AS (
      |  SELECT doc_id, lang, source,
      |    list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3
      |      THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
      |        i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))
      |      ELSE [array_to_string(string_split(text, ' '), ' ')] END) AS sh
      |  FROM documents),
      |e0 AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db
      |  FROM s a JOIN s b ON a.lang = b.lang AND a.source = b.source
      |                   AND a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.sh, b.sh)) >= 1),
      |edges AS (SELECT da AS a, db AS b FROM e0
      |          UNION ALL SELECT db, da FROM e0),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM s
      |  UNION
      |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b),
      |lab AS (SELECT id AS doc_id, min(r) AS rep FROM reach GROUP BY id)""".stripMargin

  /** Duplicate-cluster assignment — the step after candidate generation
    * in every production dedup pipeline: candidate pairs → connected
    * components → one canonical representative (min doc_id) per cluster.
    * Emits the non-singleton clusters with their sorted member list. */
  val dedupCluster = Query(
    "q_dedup_cluster",
    s"""WITH RECURSIVE $duckClusterCtes
      |SELECT rep, count(*) AS n_docs,
      |  array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), ',') AS members
      |FROM lab GROUP BY rep HAVING count(*) > 1
      |ORDER BY rep""".stripMargin) { (s, d) =>
    clusterLabels(s, d).groupBy("rep")
      .agg(count(lit(1)).as("n_docs"),
        array_join(transform(sort_array(collect_list(col("doc_id"))),
          x => x.cast(StringType)), ",").as("members"))
      .filter(col("n_docs") > 1)
      .orderBy("rep")
  }

  /** The end-to-end corpus-cleaning accounting every LLM data pipeline
    * runs before training: integer-exact filters (length, stopword
    * density), exact-dup detection on normalized text, and near-dup
    * cluster membership (non-representatives dropped), with one reason
    * per document by fixed priority. Emits per-(lang, reason) document
    * and token counts — the "what survived and why" report. All
    * predicates are integer/string-exact, so the oracle replays every
    * stage including the recursive component computation. */
  val corpusClean = Query(
    "q_corpus_clean",
    s"""WITH RECURSIVE base AS (
      |  SELECT doc_id, lang, source, text,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_filter(string_split(text, ' '),
      |                         t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop,
      |    lower(trim(text)) AS norm
      |  FROM documents),
      |$duckClusterCtes,
      |ex AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY norm) AS mdoc FROM base),
      |r AS (
      |  SELECT b.lang, b.n_tokens,
      |    CASE WHEN b.n_tokens < 20 THEN 'too_short'
      |         WHEN 10 * b.n_stop > b.n_tokens THEN 'low_quality'
      |         WHEN ex.mdoc <> b.doc_id THEN 'exact_dup'
      |         WHEN lab.rep <> b.doc_id THEN 'near_dup'
      |         ELSE 'kept' END AS reason
      |  FROM base b JOIN ex ON ex.doc_id = b.doc_id
      |              JOIN lab ON lab.doc_id = b.doc_id)
      |SELECT lang, reason, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
      |FROM r GROUP BY lang, reason
      |ORDER BY lang, reason""".stripMargin) { (s, d) =>
    cleanReasons(tbl(s, d, "documents"), clusterLabels(s, d))
      .groupBy("lang", "reason")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).cast(LongType).as("sum_tokens"))
      .orderBy("lang", "reason")
  }

  /** Per-document drop/keep verdict with one reason by fixed priority
    * (too_short > low_quality > exact_dup > near_dup > kept). Exposed
    * separately so planted-fixture tests can exercise every branch. */
  def cleanReasons(docs: DataFrame): DataFrame =
    cleanReasons(docs, connectedComponents(docs.select("doc_id"), candidateEdges(docs)))

  /** As above with precomputed cluster labels (doc_id, rep). */
  def cleanReasons(docs: DataFrame, lab: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Exact-dup grouping keys on md5(norm), NOT norm itself: the window
    // exchange would otherwise carry (and its sort compare) the full
    // lowercased document text — corpus-sized shuffle at 100 TB for a
    // grouping a 16-byte digest expresses identically (md5 collisions
    // are below any practical corpus size; the oracle partitions by the
    // raw norm and hash-matches). Column pruning then drops the text
    // from the exchange entirely.
    // r22: both counts from ONE native byte pass over the text
    // (`graft_token_stats` — no split array, no interpreted filter
    // lambda; values pinned against the size(split)/size(filter) chain
    // by TextExpressionsSpec). The two extractions share one packed-long
    // eval under codegen subexpression elimination.
    val ts = graft.functions.TextExpressions.tokenStats(col("text"), Seq("the", "a"))
    val base = docs.select(col("doc_id"), col("lang"),
      graft.functions.TextExpressions.tokenStatsTokens(ts).as("n_tokens"),
      graft.functions.TextExpressions.tokenStatsStops(ts).as("n_stop"),
      md5(lower(trim(col("text")))).as("normh"))
      .withColumn("mdoc", min(col("doc_id")).over(Window.partitionBy(col("normh"))))
    base.join(lab, "doc_id")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        when(col("n_tokens") < 20, "too_short")
          .when(col("n_stop") * 10 > col("n_tokens"), "low_quality")
          .when(col("mdoc") =!= col("doc_id"), "exact_dup")
          .when(col("rep") =!= col("doc_id"), "near_dup")
          .otherwise("kept").as("reason"))
  }

  /** Quality-aware canonicalization — the production refinement of
    * "keep min doc_id": within each duplicate cluster keep the LONGEST
    * member (ties → lowest doc_id), the heuristic real pipelines use
    * (the longer copy is usually the less-truncated one). One argmax
    * aggregate over the cluster labels joined to doc lengths.
    *
    * The argmax key (r20 rewrite): the pre-r20 scalar `n_chars·10⁹ −
    * doc_id` stopped encoding (longest, then lowest id) once doc_id ≥
    * 10⁹ — exactly the regime a 100 TB corpus lives in — and, worse,
    * engine and oracle shared the formula so the correctness gate could
    * never see the drift. Now the two sides encode the SAME total order
    * (n_chars DESC, doc_id ASC) through two INDEPENDENT mechanisms:
    * Spark uses `max_by` over a (n_chars, −doc_id) struct (lexicographic
    * struct ordering, collision-free for all BIGINTs), DuckDB uses
    * `arg_max` over the 128-bit HUGEINT `n_chars·2⁶³ − doc_id` (exact —
    * doc_id < 2⁶³ by type, so distinct (n_chars, doc_id) never collide).
    * A shared-formula bug can no longer hide: either side drifting
    * hash-mismatches the gate. */
  val clusterRep = Query(
    "q_cluster_rep",
    s"""WITH RECURSIVE $duckClusterCtes,
      |q AS (
      |  SELECT lab.rep, lab.doc_id, d.n_chars,
      |    d.n_chars::HUGEINT * 9223372036854775808::HUGEINT - lab.doc_id AS key
      |  FROM lab JOIN documents d USING (doc_id))
      |SELECT rep, CAST(count(*) AS BIGINT) AS n_docs,
      |  arg_max(doc_id, key) AS keep_doc,
      |  CAST(max(n_chars) AS BIGINT) AS keep_chars
      |FROM q GROUP BY rep HAVING count(*) > 1
      |ORDER BY rep""".stripMargin) { (s, d) =>
    val docs = tbl(s, d, "documents").select(col("doc_id"), col("n_chars"))
    clusterLabels(s, d)
      .join(docs, "doc_id")
      .groupBy("rep")
      .agg(count(lit(1)).as("n_docs"),
        max_by(col("doc_id"),
          struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("keep_doc"),
        max(col("n_chars")).as("keep_chars"))
      .filter(col("n_docs") > 1)
      .orderBy("rep")
  }

  val queries: Seq[Query] =
    Seq(dedupNear, dedupSimhash, dedupNgram, dedupEditDistance, dedupCluster,
      corpusClean, clusterRep)
}
