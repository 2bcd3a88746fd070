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

  /** Exploded distinct shingles: (doc_id, g). The base relation for
    * candidate generation and exact-overlap verification. */
  def shingleRows(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // repartition BEFORE the CPU-heavy shingling: a small input
    // (one parquet file = one partition) would otherwise pin the
    // whole explode+dedup on a single core; the shuffle moves only
    // the raw text, a fraction of the shingle volume it unlocks
    docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(shingles("text", ShingleN)).as("g"))
  }

  /** Persisted shingle relation. The dedup plans reference it from
    * 3-4 branches that shuffle on DIFFERENT keys (g for candidate
    * postings, doc_id for sizes/verification), so exchange reuse
    * never applies and the shingling pass — the single most
    * expensive projection — would be recomputed per branch. Spark's
    * cache manager dedups by logical plan, so repeated operator
    * calls in one session share the entry. At warehouse scale this
    * cache becomes a materialized shingle TABLE (write once, reuse
    * across the whole dedup campaign) rather than executor memory. */
  def cachedShingleRows(docs: DataFrame): DataFrame =
    shingleRows(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Exact |A∩B| for the given candidate pairs via a join on the
    * exploded shingles — no arrays shuffled, only matching rows. */
  private def verifyJaccard(cand: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    cand
      .join(sh.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sh.as("y"), col("doc_b") === col("y.doc_id") && col("x.g") === col("y.g"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("sa.n") + col("sb.n") - col("inter"))).as("jaccard"))
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
    import org.apache.spark.sql.expressions.Window
    val sh = cachedShingleRows(Tables.documents(spark, dir))
    // Candidate generation runs on the 64-bit shingle HASH: the
    // prefix filter is complete under ANY consistent global shingle
    // order (rarity order is just the best one), so hashing cannot
    // lose pairs — and longs shuffle/sort/join far cheaper than
    // 16-char strings. Exactness is untouched: verification below
    // intersects the real shingle strings.
    val shh = sh.select(col("doc_id"), xxhash64(col("g")).as("gh"))
    val freq = shh.groupBy(col("gh")).agg(count(lit(1)).as("f"))
    // doc sizes via a partial-aggregated groupBy join — cheaper than
    // a second count-over-partition window pass
    val sizes = shh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val ranked = shh.join(freq, "gh").join(sizes, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("f"), col("gh"))))
    val prefix = ranked
      .filter(col("rn") <= col("n") - ceil(col("n") * JaccardThreshold) + 1)
      .select(col("doc_id"), col("gh"))
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cand, sh)
  }

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
    val sh = cachedShingleRows(docs)
    // One string hash per shingle, then 64 cheap fixed-width
    // re-hashes xxhash64(h, k) — hashing the 16-char string 64x was
    // the dominant signature cost; re-hashing the 8-byte long is a
    // fraction of it. (An affine h*A_k+B_k permutation would be
    // cheaper still but ANSI mode rejects wraparound multiply.)
    val hashed = sh.withColumn("h", xxhash64(col("g")))
    val aggs = (0 until MinhashPerms).map(k =>
      min(xxhash64(col("h"), lit(k))).as(s"mh_$k"))
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
    verifyJaccard(cand, cachedShingleRows(docs))
  }

  // ---- dedup_simhash: 64-bit SimHash + banded hamming search ----
  val SimhashBands = 4 // 4 bands x 16 bits: catches hamming <= 3
  val HammingMax = 3

  /** (doc_id, sim): 64-bit SimHash over whitespace-token xxhash64s.
    * Explode + 64 conditional-sum aggregates (map-side combined, one
    * shuffle of 64 longs per doc) instead of per-row nested-array
    * folds — same output, none of the per-token array allocation. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val tok = docs
      .repartition(col("doc_id")) // spread tokenization off the single input split
      .select(col("doc_id"), explode(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("t"))
      .withColumn("h", xxhash64(col("t")))
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
