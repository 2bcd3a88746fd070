package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines
  * (SURVEY.md §2C1-C5) over `documents` / `embeddings`.
  *
  * Scale design (100 TB lens): no candidate-generation step is
  * all-pairs. Exact dedup is one hash-groupBy shuffle;
  * n-gram Jaccard generates candidates by an inverted-index join on
  * shared shingles; MinHash-LSH and SimHash generate candidates by
  * banded bucket joins whose key cardinality grows with the corpus
  * (skew-resistant, salt-ready); expensive exact verification runs
  * only on candidate pairs. The single intentionally-quadratic
  * operator is `dedup_embedding` — the bounded brute-force
  * verification baseline the ANN operators are judged against
  * (see Similarity.scala for the LSH/IVF scale paths).
  */
object Dedup {

  /** Distinct character n-gram shingles of a text column, via the
    * native kernel (graft.functions.ShinglesExpr — the
    * transform+array_distinct form interprets every substring
    * through CodegenFallback lambdas; the kernel is one Java loop).
    * Requires GraftFunctions registration (GraftSession does it;
    * operator entry points re-register defensively). */
  def shingles(textCol: String, n: Int): Column =
    expr(s"graft_shingles($textCol, $n)")

  // 16-char shingles (~3 words): discriminative enough that posting
  // lists stay short on small-vocabulary corpora. 8-char shingles
  // measured 13k distinct values over 1.35M occurrences at sf0.1 —
  // ~100-doc posting lists that defeat any candidate prefilter.
  val ShingleN = 16
  val JaccardThreshold = 0.8

  // ---- dedup_exact: content-hash dedup, one shuffle ----
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_doc_id"))

  private val dedupExactSql: String =
    """SELECT md5(text) AS h, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keep_doc_id""".stripMargin

  /** Exploded 64-bit-hashed distinct shingles: (doc_id, gh), via the
    * fused graft_hash_shingles kernel — no shingle strings are ever
    * materialized, and longs shuffle/sort/join far cheaper than
    * 16-char strings. Candidate-side consumers (MinHash perms, LSH
    * bands) are complete under any consistent shingle identity;
    * verification intersects the real shingle STRINGS via
    * [[shingleArrays]], so results are exact up to 64-bit xxhash
    * collisions (see the kernel's doc for the honest bound). */
  def hashedShingleRows(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // repartition BEFORE the CPU-heavy shingling: a small input
    // (one parquet file = one partition) would otherwise pin the
    // whole kernel+explode on a single core; the shuffle moves only
    // the raw text, a fraction of the shingle volume it unlocks
    docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(expr(s"graft_hash_shingles(text, $ShingleN)")).as("gh"))
  }

  /** Persisted hashed-shingle relation (the MinHash path's base —
    * the PPJoin path keeps its own doc-level array relation). Its
    * consumers shuffle on DIFFERENT keys, so exchange reuse never
    * applies and the shingling pass would be recomputed per branch.
    * Spark's cache manager dedups by logical plan, so repeated
    * operator calls in one session share the entry; entries are
    * LRU-evictable storage, but long sessions sweeping MANY dirs
    * should clearCache between campaigns. At warehouse scale this
    * cache becomes a materialized shingle TABLE (write once, reuse
    * across the whole dedup campaign) rather than executor memory. */
  def cachedHashedShingleRows(docs: DataFrame): DataFrame =
    hashedShingleRows(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Per-doc distinct shingle ARRAY (not exploded): (doc_id, gs) —
    * the verification-side relation. One row per document keeps the
    * exact-verify joins document-cardinality (candidate pairs x two
    * array lookups) instead of shingle-cardinality: the round-2
    * exploded-string verify shuffled the full 1.4M-row shingle
    * relation on (doc_id, g) to score 257 candidate pairs. */
  def shingleArrays(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"), shingles("text", ShingleN).as("gs"))
  }

  /** Exact Jaccard for the candidate pairs: join the two doc-level
    * shingle arrays and intersect the real strings. Both arrays are
    * distinct by construction, so size(array_intersect) IS |A∩B|.
    *
    * The shingle kernel runs ONLY on documents that appear in a
    * candidate pair (semi-join prune first): verification cost is
    * proportional to the candidate set, not the corpus. `cand` must
    * be persisted by the caller — it feeds the id prune AND the pair
    * join, and its lineage is the whole candidate-generation plan. */
  private def verifyJaccard(cand: DataFrame, docs: DataFrame): DataFrame = {
    val ids = cand.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct()
    // repartition AFTER the prune, BEFORE the kernel: the semi join
    // broadcasts `ids` into the narrow scan, which would leave the
    // shingling and the intersects below on the scan's (single-file)
    // partitioning — serialized on one core
    val arrs = shingleArrays(docs.join(ids, Seq("doc_id"), "left_semi").repartition(col("doc_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cand
      .join(arrs.as("x"), col("doc_a") === col("x.doc_id"))
      .join(arrs.as("y"), col("doc_b") === col("y.doc_id"))
      .withColumn("inter", size(array_intersect(col("x.gs"), col("y.gs"))))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (size(col("x.gs")) + size(col("y.gs")) - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- dedup_ngram_jaccard: exact set-Jaccard via prefix filter ----
  // A naive inverted-index join explodes on high-frequency shingles
  // (every pair sharing "the quic" becomes a candidate — O(n²) rows
  // on same-domain corpora). The PPJoin prefix filter keeps exactness
  // at a fraction of the cost: order each doc's shingles by global
  // rarity and index only the first |x| - ceil(t*|x|) + 1 of them —
  // any pair with J >= t provably shares a PREFIX shingle, and rare
  // shingles have tiny postings lists, so the candidate join stays
  // linear-ish at any corpus size.
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // Global shingle rarity as a count-min sketch: ONE bounded-size
    // aggregate (eps 1e-4, ~1 MB — broadcastable at any corpus
    // size), collected once like the IVF centroids. Rarity ranks
    // then come from a per-document local sort inside the
    // graft_ppjoin_prefix kernel — prefix construction does ZERO
    // corpus-wide shuffles (round 2 shuffled the full exploded
    // shingle relation twice, by hash for frequency and by doc for
    // rank). CMS estimates are globally CONSISTENT, which is all the
    // prefix filter's completeness needs; see PpjoinKernels.
    // Candidate generation runs entirely on 64-bit shingle HASHES
    // (graft_hash_shingles fuses shingling+hashing, no string
    // materialization; longs join far cheaper than 16-char strings;
    // completeness holds under any consistent shingle identity, up
    // to 64-bit xxhash collisions — see the kernel's doc for the
    // honest bound). Verification below intersects the real
    // strings, so any surviving candidate is scored exactly.
    graft.functions.GraftFunctions.register(spark)
    val hashed = docs.repartition(col("doc_id"))
      .select(col("doc_id"), expr(s"graft_hash_shingles(text, $ShingleN)").as("ghs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      hashed.select(explode(col("ghs")).as("gh"))
        .select(expr("count_min_sketch(gh, 0.0001d, 0.99d, 42)")).head.getAs[Array[Byte]](0))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ppjoin_prefix",
      args => graft.functions.PpjoinPrefixExpr(args.head, sketch, JaccardThreshold),
      "built-in")
    val prefix = hashed
      .select(col("doc_id"), size(col("ghs")).as("n"),
        explode(expr("graft_ppjoin_prefix(ghs)")).as("p"))
      .select(col("doc_id"), col("p.gh").as("gh"), col("p.rn").as("rn"), col("n"))
      // persisted: the self-join references prefix from both sides,
      // and AQE's broadcast-build threads would otherwise re-run the
      // prefix kernel chain serially per reference
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // PPJoin candidate pruning (Xiao et al.), both filters directly
    // in the join condition so pruned rows never reach the distinct:
    //  - length filter: J >= t forces min(n_a,n_b) >= t * max(n_a,n_b)
    //    (J <= n_small/n_large when the small set is fully contained);
    //  - positional filter: for a shared prefix shingle at global-
    //    order positions (rn_a, rn_b), overlap <= 1 + min(n_a - rn_a,
    //    n_b - rn_b); J >= t needs overlap >= ceil(t/(1+t)*(n_a+n_b)).
    //    A qualifying pair's FIRST shared prefix shingle always
    //    passes the bound, so filtering per matched row + distinct
    //    keeps candidate generation complete.
    // The 1e-9 slack keeps double rounding from over-pruning at
    // exact-integer boundaries (e.g. t*(n_a+n_b) landing on an int):
    // a slightly LOW threshold only admits extra candidates.
    val t = JaccardThreshold
    val alpha = ceil(lit(t / (1 + t)) * (col("a.n") + col("b.n")) - lit(1e-9))
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id") &&
        least(col("a.n"), col("b.n")) >= lit(t) * greatest(col("a.n"), col("b.n")) - lit(1e-9) &&
        lit(1) + least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")) >= alpha)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      // persisted: verification consumes cand twice (id prune + pair
      // join) and its lineage is the whole prefix-join plan
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    verifyJaccard(cand, docs)
  }

  /** The ngram-Jaccard oracle, embeddable as a CTE body (nested WITH
    * is legal in a parenthesized CTE subquery) — Curation's
    * dedup_clusters oracle builds its component closure on it. */
  private[operators] def dedupNgramJaccardSqlForCte: String = dedupNgramJaccardSql

  private val dedupNgramJaccardSql: String =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), $ShingleN) AS g
       |  FROM documents, UNNEST(range(1, length(text) - ${ShingleN - 2})) AS t(i)
       |), pair AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
       |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1)
       |SELECT doc_a, doc_b,
       |  CAST(inter AS DOUBLE) / (x.n + y.n - inter) AS jaccard
       |FROM pair JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
       |WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= $JaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- dedup_minhash_lsh: MinHash signatures + banded LSH ----
  val MinhashPerms = 64
  val LshBands = 16 // 16 bands x 4 rows

  /** (doc_id, sig): 64-perm MinHash signature via explode +
    * 64 min-aggregates. Each shingle is materialized ONCE and hashed
    * 64 times inside a partially-aggregated (map-side combined)
    * groupBy — one shuffle of 64 longs per doc.
    *
    * (The tempting one-projection nested-`transform` form is a trap:
    * Catalyst's projection collapse inlines the shingle-array
    * expression into the per-seed lambda, recomputing the shingling
    * 64x per document — measured 100x slower at sf0.1.) */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    // One kernel hash per shingle (gh), then 64 cheap fixed-width
    // re-hashes xxhash64(gh, k) — hashing the 16-char string 64x was
    // the dominant signature cost; re-hashing the 8-byte long is a
    // fraction of it. (An affine h*A_k+B_k permutation would be
    // cheaper still but ANSI mode rejects wraparound multiply.)
    val hashed = cachedHashedShingleRows(docs)
    val aggs = (0 until MinhashPerms).map(k =>
      min(xxhash64(col("gh"), lit(k))).as(s"mh_$k"))
    hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until MinhashPerms).map(k => col(s"mh_$k")): _*).as("sig"))
  }

  /** Candidate pairs from banded buckets, verified with EXACT
    * Jaccard on the shingle sets — only candidates pay the
    * verification cost. */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val rows = MinhashPerms / LshBands
    val docs = Tables.documents(spark, dir)
    val bands = minhashSignatures(docs)
      .select(col("doc_id"), explode(sequence(lit(0), lit(LshBands - 1))).as("band"), col("sig"))
      .select(col("doc_id"), col("band"),
        xxhash64(col("band"), slice(col("sig"), col("band") * rows + 1, lit(rows))).as("bh"))
    // persist: the self-join would otherwise run the 64-aggregate
    // signature computation once per side
    val bandsCached = bands.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = bandsCached.as("a")
      .join(bandsCached.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    verifyJaccard(cand, docs)
  }

  // ---- dedup_simhash: 64-bit SimHash + banded hamming search ----
  val SimhashBands = 4 // 4 bands x 16 bits: catches hamming <= 3
  val HammingMax = 3

  /** (doc_id, sim): 64-bit SimHash over whitespace-token xxhash64s.
    * Explode + 64 conditional-sum aggregates (map-side combined, one
    * shuffle of 64 longs per doc) instead of per-row nested-array
    * folds — same output, none of the per-token array allocation. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val tok = TextOps.whitespaceTokens(docs) // shared `\S+` segmentation
      .withColumn("h", xxhash64(col("term")))
    val bitSums = (0 until 64).map(i =>
      sum(when(expr(s"(shiftright(h, $i) & 1) = 1"), 1L).otherwise(-1L)).as(s"b_$i"))
    val sim = (0 until 64)
      .map(i => when(col(s"b_$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sim.as("sim"))
  }

  /** Pigeonhole band join: pairs within hamming <= 3 must agree on
    * at least one of the 4 16-bit bands; exact popcount(xor) filters
    * the candidates. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val sigs = simhashSignatures(Tables.documents(spark, dir))
    val bands = sigs.select(col("doc_id"), col("sim"),
        explode(sequence(lit(0), lit(SimhashBands - 1))).as("band"))
      .withColumn("bits", expr("shiftrightunsigned(sim, band * 16) & 65535"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= HammingMax)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- dedup_embedding: exact cosine pairs (brute-force baseline) ----
  val CosineThreshold = 0.4

  /** Left-associative Σ va[i]*vb[i] via the native codegen'd kernel
    * (graft.functions.VecDotExpr) — the same IEEE op sequence as the
    * oracle's list_reduce, so results are bit-identical across
    * engines, but a plain Java loop instead of Spark's interpreted
    * higher-order functions.
    *
    * (Two alternatives measured worse: aggregate(zip_with(...)) is
    * CodegenFallback — interpreted lambda per element, ~10x slower
    * on the pair join; an unrolled flat 64-term element_at chain
    * blows past codegen method limits and deoptimizes, ~4x slower.) */
  def dot(va: String, vb: String): Column =
    expr(s"vec_dot($va, $vb)")

  /** Σ (va[i]-vb[i])², same kernel treatment. */
  def sqDist(va: String, vb: String): Column =
    expr(s"vec_sqdist($va, $vb)")

  /** (vec_id, v, nrm): embeddings as doubles with L2 norms. The
    * element-wise double promotion + left-to-right summation makes
    * the cosine a fixed IEEE op sequence — bit-identical to the
    * oracle. */
  def embeddingsWithNorm(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(dot("v", "v")))
  }

  /** va/vb are SQL column references (e.g. "a.v"), resolved in the
    * calling plan; norms are passed as Columns. */
  def cosine(va: String, vb: String, na: Column, nb: Column): Column =
    dot(va, vb).divide(na * nb)

  /** EXACT all-pairs cosine dedup — intentionally quadratic: this is
    * the bounded verification baseline for the ANN scale paths
    * (Similarity.scala), not the 100 TB route. */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddingsWithNorm(spark, dir)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine("a.v", "b.v", col("a.nrm"), col("b.nrm")))
      .filter(col("cos") >= CosineThreshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(col("cos"), 6).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  private val dedupEmbeddingSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_transform(v, x -> x * x), (a, p) -> a + p)) AS nrm
       |  FROM e)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round(list_reduce(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
       |        (x, y) -> x + y) / (a.nrm * b.nrm), 6) AS cosine
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE list_reduce(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
       |      (x, y) -> x + y) / (a.nrm * b.nrm) >= $CosineThreshold
       |ORDER BY vec_a, vec_b""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("dedup_exact", Some(dedupExactSql), dedupExact),
    GraftQuery("dedup_ngram_jaccard", Some(dedupNgramJaccardSql), dedupNgramJaccard),
    GraftQuery("dedup_minhash_lsh", None, dedupMinhashLsh),
    GraftQuery("dedup_simhash", None, dedupSimhash),
    GraftQuery("dedup_embedding", Some(dedupEmbeddingSql), dedupEmbedding))
}
