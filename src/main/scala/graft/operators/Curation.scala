package graft.operators

import graft.{Exact, GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs AFTER the
  * signals exist: duplicate-cluster resolution (pairs → components →
  * canonical keeper), deterministic stratified sampling, and TF-IDF
  * term salience. All three are SQL-expressible and DuckDB-oracled.
  */
object Curation {

  // ---- dedup_clusters: pair list → connected components ----

  /** Minimum-label connected components over an (a, b) edge list via
    * label propagation WITH POINTER JUMPING: every vertex starts
    * labeled min(self, min neighbor); each round takes the min label
    * in its neighborhood (propagate) and then shortcuts through its
    * own label's label (jump: lab(v) := lab(lab(v)) — safe because a
    * label is always a same-component vertex id, so composing labels
    * never leaves the component and never raises the min). The jump
    * is the doubling trick a graph library uses: distance-to-root
    * halves per round, so convergence needs ~log2(diameter) rounds
    * instead of diameter — a 200-vertex chain resolves in 8 rounds
    * where plain propagation needs 199. Fixpoint = per-component min
    * vertex id, identical to plain propagation (the jump cannot
    * change the fixpoint, only reach it sooner).
    *
    * Scale design: the edge list is DUP PAIRS — proportional to the
    * duplicate volume, orders of magnitude below the corpus — and
    * each round is two shuffle joins on vertex-cardinality labels
    * (neighbor min, then the jump's label self-join). The per-round
    * driver work is ONE observed metric (the convergence test);
    * labels never collect. `maxIters` caps rounds, and with the
    * jump's log-convergence the default covers diameters up to
    * ~2^20 — the cap exists to fail loudly on a logic regression,
    * not to bound real inputs. */
  def connectedComponents(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    // Both edge directions come from a single explode over `edges`,
    // so the (possibly expensive) upstream pair pipeline is
    // referenced exactly once per plan; the round-3 union referenced
    // it from both branches. ONE eager checkpoint materializes the
    // pipeline up front; every round (and every reference within a
    // round — seed aggregate, neighbor join, change comparison)
    // iterates over the checkpointed edges. A lazy-first variant
    // that only checkpointed when a second round was needed saved
    // one small job on single-round inputs but re-executed the
    // WHOLE pair pipeline to materialize sym on multi-round ones —
    // measured +20 s at sf1, where dup CHAINS (dup-of-dup texts)
    // make a second round the norm, against ~0.2 s saved at sf0.1.
    val sym = edges.select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .localCheckpoint(true)
    // Initial labels FOLD THE FIRST PROPAGATION ROUND into the seed:
    // label(v) = min(v, min neighbor) is exactly round 1's output,
    // computed as one aggregate over sym with no join — so near-
    // clique dup clusters arrive at the loop already converged and
    // pay a single confirming round.
    var labels = sym.groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("lab"))
      .select(col("a").as("v"), col("lab"))
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      // The convergence signal rides INSIDE the round's one
      // materializing action via observe(): CollectMetrics is a real
      // plan node (never constant-folded), codegen'd, and
      // retry-consistent by construction — it replaced the round-4
      // nondeterministic marker UDF + accumulator, the repo's one
      // UDF (VERDICT r4 item 6).
      val obs = org.apache.spark.sql.Observation(s"graft_cc_round_$iters")
      val neigh = sym.as("s").join(labels.as("l"), col("s.b") === col("l.v"))
        .groupBy(col("s.a").as("a")).agg(min(col("l.lab")).as("nlab"))
      // localCheckpoint (not persist): each round's plan references
      // the previous labels TWICE (through neigh and directly), so
      // an un-truncated lineage doubles in size every round and
      // planning time explodes — the standard iterative-graph trap.
      val newLab = least(col("l2.lab"), coalesce(col("nb.nlab"), col("l2.lab")))
      val prop = labels.as("l2").join(neigh.as("nb"), col("l2.v") === col("nb.a"), "left")
        .select(col("l2.v").as("v"), newLab.as("lab"), col("l2.lab").as("old"))
      // pointer jump: lab(v) := min(lab(v), lab(lab(v))). Left join:
      // every label IS a vertex of the edge list (labels start as
      // vertex ids and only ever copy other labels), so the probe
      // always matches — the coalesce guards the invariant rather
      // than a reachable case. The change marker compares the
      // JUMPED label to the previous round's, so convergence still
      // means "nothing moved at all".
      val jumped = least(col("x.lab"), coalesce(col("y.lab"), col("x.lab")))
      val next = prop.as("x").join(prop.as("y"), col("x.lab") === col("y.v"), "left")
        .select(col("x.v").as("v"), jumped.as("lab"), (jumped =!= col("x.old")).as("chg"))
        .observe(obs, sum(when(col("chg"), 1L).otherwise(0L)).as("changed"))
        .select(col("v"), col("lab"))
        .localCheckpoint(true)
      // sum() over an empty round is SQL NULL — an empty edge list
      // is trivially converged
      converged = obs.get.get("changed").forall(v => v == null || v == 0L)
      labels = next
      iters += 1
    }
    // fail loudly: returning a partial fixpoint would silently emit
    // wrong cluster roots (and diverge from the exact recursive-CTE
    // oracle). With pointer jumping the cap covers diameters to
    // ~2^maxIters, so tripping it signals a regression, not data.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters doubling rounds " +
          s"(covers component diameters to ~2^$maxIters) — logic regression likely")
    labels
  }

  /** (doc_id, cluster_root) for every document in a near-duplicate
    * cluster — cluster_root is the min doc_id of the component, the
    * canonical keeper a dedup pipeline retains. The edge list is the
    * exact-Jaccard pair output of dedup_ngram_jaccard; the LSH pair
    * lists plug into the same component resolution unchanged. This
    * is the step that turns pairwise dedup SIGNALS into the actual
    * keep/drop decision. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    // Pair signals come from the MATERIALIZED routed list (staged
    // once per corpus by Dedup.clusterPairSignal — exact ngram below
    // the grid's disk-budget line, the minhash sweep above it), not
    // a recomputation of the pair pipeline: pair generation is the
    // generating entry's priced work, and a pipeline that re-derived
    // every pair inside each downstream consumer would pay the
    // corpus pass once per consumer. This entry prices what it adds
    // — component resolution over the signal list (the oracle's
    // recursive CTE reads the same staged parquet). DedupSpec pins
    // staged == live-pipeline equality, and CurationSpec pins the
    // composed form (live pairs → components) against this entry.
    val pairs = Dedup.clusterPairSignal(spark, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    connectedComponents(pairs)
      .select(col("v").as("doc_id"), col("lab").as("cluster_root"))
      .orderBy(col("doc_id"))
  }

  /** Transitive-closure min-label fixpoint over the SAME staged
    * ngram-Jaccard pair list the Spark side resolves — the
    * recursive-CTE twin of the label-propagation loop. */
  private lazy val dedupClustersSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b
       |  FROM read_parquet('${Dedup.ClusterSignalStagePath}/*.parquet')
       |), sym AS MATERIALIZED (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), cc(v, lab) AS (
       |  SELECT a, a FROM sym
       |  UNION
       |  SELECT sym.a, cc.lab FROM cc JOIN sym ON sym.b = cc.v
       |)
       |SELECT v AS doc_id, MIN(lab) AS cluster_root
       |FROM cc GROUP BY v ORDER BY doc_id""".stripMargin

  // ---- dedup_clusters_incremental: fold fresh pairs into persisted labels ----

  /** Where the corpus COMPONENT LABELS — (doc_id, cluster_root) over
    * the OLD corpus's pair graph (pairs with doc_b below the
    * incremental split) — are persisted, fingerprint-keyed like the
    * minhash sketch table. This is the nightly pipeline's carried
    * state: component resolution over yesterday's pairs is paid once
    * per corpus version, and each fresh crawl folds its new pairs
    * into these labels instead of recomputing the closure over the
    * whole pair history. */
  val ClusterLabelStagePath: String =
    graft.sources.SdfQueries.StagePath.stripSuffix("records.parquet") + "cluster_labels.parquet"

  private val stagedLabels = new graft.StagedVersion[(String, String)]

  /** Read (staging if this corpus version is not yet built) the
    * persisted old-corpus component labels. Built from the SAME
    * staged pair list the full entry resolves (restricted to old-old
    * pairs: doc_a < doc_b, so "doc_b below the split" is exactly
    * "neither endpoint is fresh"). */
  def clusterLabelsTable(spark: SparkSession, dir: String): DataFrame = {
    stagedLabels((dir, Tables.fingerprint(spark, dir, "documents"))) {
      val split = Dedup.incrementalSplit(Tables.documents(spark, dir))
        .getOrElse(Long.MaxValue)
      val oldPairs = Dedup.clusterPairSignal(spark, dir)
        .filter(col("doc_b") < lit(split))
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      connectedComponents(oldPairs)
        .select(col("v").as("doc_id"), col("lab").as("cluster_root"))
        .write.mode("overwrite").parquet(ClusterLabelStagePath)
    }
    graft.Tables.parquetCached(spark, ClusterLabelStagePath)
  }

  /** Incremental cluster maintenance (VERDICT r11 item 3): fold the
    * fresh crawl's near-dup pairs into the PERSISTED component
    * labels and emit the changed/new clusters only — every document
    * of every component touched by a fresh pair, with its new
    * cluster_root.
    *
    * The fold is a quotient-graph contraction: each slice-pair
    * endpoint maps through the persisted labels to its old root
    * (docs without a label — fresh docs, and old docs never
    * duplicated before — map to themselves), and label propagation
    * runs on the CONTRACTED edge list, whose size is the fresh
    * pair count — not the pair history, not the corpus. Old
    * components collapse to single supernodes, so the iterative part
    * of the work is proportional to what the crawl changed.
    * Exactness: contraction preserves connectivity (an old
    * component's members are mutually connected by construction),
    * and because every old root IS its component's minimum doc_id,
    * the contracted min-label fixpoint equals the full closure's min
    * over (old pairs ∪ slice pairs) — spec-pinned against the full
    * recompute restricted to touched components.
    *
    * Output = (expanded members of touched old components) ∪
    * (contracted vertices with no persisted label). Untouched
    * components never appear — the nightly job's output is what
    * changed, and the persisted labels for untouched components
    * remain valid as-is. */
  def dedupClustersIncremental(spark: SparkSession, dir: String): DataFrame = {
    val split = Dedup.incrementalSplit(Tables.documents(spark, dir))
      .getOrElse(Long.MaxValue)
    val labels = clusterLabelsTable(spark, dir)
    val slicePairs = Dedup.clusterPairSignal(spark, dir)
      .filter(col("doc_b") >= lit(split))
      .select(col("doc_a"), col("doc_b"))
    // contract: endpoint -> persisted root (itself when unlabeled).
    // The label table is dup-volume-sized (pairs' endpoints only) —
    // at warehouse scale it broadcasts or bucket-joins on doc_id;
    // the probe side is the fresh pairs, never the corpus.
    val la = labels.select(col("doc_id").as("doc_a"), col("cluster_root").as("ra"))
    val lb = labels.select(col("doc_id").as("doc_b"), col("cluster_root").as("rb"))
    val contracted = slicePairs
      .join(la, Seq("doc_a"), "left")
      .join(lb, Seq("doc_b"), "left")
      .select(coalesce(col("ra"), col("doc_a")).as("a"),
        coalesce(col("rb"), col("doc_b")).as("b"))
    val folded = connectedComponents(contracted)
    // expand: touched old components re-emit every member under the
    // folded label; contracted vertices without a persisted label
    // (fresh docs, first-time-duplicated old docs) emit themselves.
    val members = labels.as("l")
      .join(folded.as("f"), col("l.cluster_root") === col("f.v"))
      .select(col("l.doc_id").as("doc_id"), col("f.lab").as("cluster_root"))
    val fresh = folded.as("f")
      .join(labels.as("l"), col("f.v") === col("l.doc_id"), "left_anti")
      .select(col("v").as("doc_id"), col("lab").as("cluster_root"))
    members.union(fresh).orderBy(col("doc_id"))
  }

  /** Oracle: the full transitive closure over the ONE staged pair
    * list (old ∪ slice — the same parquet), restricted to components
    * containing a slice-pair endpoint. The restriction is what makes
    * this the incremental entry's twin: untouched components are
    * exactly the rows the Spark side never emits. */
  private lazy val dedupClustersIncrementalSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b
       |  FROM read_parquet('${Dedup.ClusterSignalStagePath}/*.parquet')
       |), s AS (SELECT MAX(doc_id) * 9 // 10 AS v FROM documents
       |), sym AS MATERIALIZED (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), cc(v, lab) AS (
       |  SELECT a, a FROM sym
       |  UNION
       |  SELECT sym.a, cc.lab FROM cc JOIN sym ON sym.b = cc.v
       |), lab AS (
       |  SELECT v AS doc_id, MIN(lab) AS cluster_root FROM cc GROUP BY v
       |), touched AS (
       |  SELECT DISTINCT l.cluster_root FROM lab l
       |  JOIN (SELECT doc_a AS d FROM pairs WHERE doc_b >= (SELECT v FROM s)
       |        UNION SELECT doc_b FROM pairs WHERE doc_b >= (SELECT v FROM s)) t
       |    ON l.doc_id = t.d
       |)
       |SELECT doc_id, cluster_root FROM lab
       |WHERE cluster_root IN (SELECT cluster_root FROM touched)
       |ORDER BY doc_id""".stripMargin

  // ---- sample_stratified: deterministic per-stratum quota ----
  val SampleQuota = 50

  /** THE sampling permutation — md5(doc_id) with a doc_id tie-break
    * (an arbitrary-but-fixed engine-reproducible order), defined
    * once and shared by sample_stratified and sample_mixture in BOTH
    * engines' forms, so the documented "same permutation" property
    * cannot silently desync across the four former copies (same
    * single-definition move as Dedup.ShingleCteSql). */
  private def permutationOrder: Seq[org.apache.spark.sql.Column] =
    Seq(md5(col("doc_id").cast("string")), col("doc_id"))
  private val PermutationOrderSql = "md5(CAST(doc_id AS VARCHAR)), doc_id"

  /** Quantile PRE-CUT shared by both sampling entries (round 9,
    * VERDICT r8 item 5): the stratum window used to sort the WHOLE
    * corpus to keep ~quota rows — the one output≪input sort left in
    * the suite. The md5 permutation key is uniform on [0, 2^32) in
    * its first 8 hex chars, so keeping only rows whose 32-bit key
    * prefix falls below cut = floor(min(1, (4·quota+64)/n) · 2^32)
    * bounds the window input near 4·quota+64 per stratum no matter
    * how large the stratum. EXACTNESS: survivors are downward-closed
    * under the (md5, doc_id) sort order (a non-survivor's prefix
    * strictly exceeds every survivor's, hence its full key sorts
    * after ALL survivors), so survivor ranks equal full-stratum
    * ranks, and the result is bit-identical to the full window
    * whenever survivors ⊇ top-quota. The margin makes an undercut a
    * Chernoff tail below exp(−quota·9/8) (~1e-38 at quota 50), a
    * stratum near or under 4·quota+64 rows takes cut = 2^32 — the
    * keep-everything full-window fallback — and [[guardUndercut]]
    * turns any residual undercut (or a threshold-formula bug) into
    * a LOUD raise_error on the tiny result frame rather than a
    * silently short sample. The cut is Spark-side only: the DuckDB
    * oracle keeps the exact full-window form, which is precisely
    * what the correctness gate then re-verifies per run. */
  private def preCut(quota: Column, n: Column): Column =
    conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") <=
      floor(least(lit(1.0), (lit(4.0) * quota + lit(64.0)) / n) * lit(4294967296.0)).cast("long")

  /** In-plan undercut guard: every emitted stratum must carry
    * exactly least(quota, n) rows — counted with a window over the
    * RESULT (quota-sized, not corpus-sized). A stratum whose
    * survivors all vanished (no row below the cut at all) escapes
    * this check — that tail is exp(−(4·quota+64)) — but any partial
    * undercut and any threshold-formula regression throws loudly
    * instead of shipping a short sample. */
  private def guardUndercut(picked: DataFrame, entry: String,
                            quota: Column, n: Column): DataFrame =
    picked
      .withColumn("n_sampled",
        count(lit(1)).over(Window.partitionBy(col("lang"))))
      .withColumn("sample_rank",
        when(col("n_sampled") === least(quota, n), col("sample_rank"))
          .otherwise(raise_error(concat(
            lit(s"$entry: pre-cut undercut stratum "),
            coalesce(col("lang"), lit("<null>"))))))

  /** First `SampleQuota` documents per language in md5(doc_id)
    * order — a deterministic, engine-reproducible stratified sample
    * (the hash order is an arbitrary-but-fixed permutation, so the
    * quota is an unbiased slice of each stratum; doc_id tie-break
    * covers hash collisions). One window shuffle on the stratum
    * key, with its input bounded by the [[preCut]] quantile filter
    * (the counts side is a bounded agg joined back null-safe and
    * broadcast — null-lang strata keep their original
    * window-partition semantics); per-stratum window skew is
    * bounded by the cut itself. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("lang"), col("doc_id"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .withColumnRenamed("lang", "c_lang")
    val w = Window.partitionBy(col("lang")).orderBy(permutationOrder: _*)
    val picked = docs
      // null-safe: the original no-join form kept a NULL-lang stratum;
      // an equi-join here would silently drop it
      .join(broadcast(counts), col("lang") <=> col("c_lang"))
      .filter(preCut(lit(SampleQuota.toDouble), col("n")))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= SampleQuota)
    guardUndercut(picked, "sample_stratified", lit(SampleQuota.toLong), col("n"))
      .select(col("lang"), col("doc_id"), col("sample_rank"))
      // nulls-last explicitly: Spark's default sort is NULLS FIRST,
      // DuckDB's is NULLS LAST — a NULL-lang stratum would otherwise
      // hash-mismatch on row order alone
      .orderBy(col("lang").asc_nulls_last, col("sample_rank"))
  }

  private val sampleStratifiedSql: String =
    s"""SELECT lang, doc_id, CAST(rn AS BIGINT) AS sample_rank FROM (
       |  SELECT lang, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY $PermutationOrderSql) AS rn
       |  FROM documents) t
       |WHERE rn <= $SampleQuota ORDER BY lang NULLS LAST, sample_rank""".stripMargin

  // ---- sample_mixture: temperature-weighted stratum mixing ----
  val MixtureTarget = 200

  /** Temperature-weighted mixture sampling — the data-MIXING op an
    * LLM pipeline runs after per-stratum cleaning: draw a corpus of
    * ~[[MixtureTarget]] docs whose stratum shares are proportional
    * to count^α instead of raw counts, flattening dominant strata
    * and boosting rare ones (the mixing rule behind GPT-3's dataset
    * weights and UniMax-style temperature sampling; Chung et al.
    * 2023). α is hardwired to 0.5 because sqrt is the one power
    * both engines compute correctly-rounded — a general pow() does
    * not agree across libms, exactly the ln() trade tfidf documents.
    *
    * Engine-exact quota arithmetic: S = Σ sqrt(n_s) through the
    * exact-decimal sum (order-independent; Exact.dsum), then
    * base_s = floor(N·sqrt(n_s)/S) — two IEEE ops on identical
    * operands, bit-identical cross-engine; floor() beats round()
    * whose half-rule differs between engines. Floor alone
    * under-fills the target by up to |strata|−1 rows, so the
    * deficit D = min(N, corpus) − Σ base is backfilled by LARGEST
    * REMAINDER (round 9, VERDICT r8 item 6): strata ranked by the
    * exact double remainder x_s − floor(x_s) descending with a
    * deterministic lang tie-break; each of the top (D mod K) strata
    * gets +1 on top of the uniform D div K share (the div share is
    * 0 in every non-degenerate case — it only engages when FP drift
    * ever made D exceed K). Σ quota then equals min(N, corpus)
    * EXACTLY whenever corpus ≥ N; a stratum smaller than its quota
    * can still under-fill the drawn sample (quota-capping
    * waterfilling is deliberately out of scope — it cannot happen
    * unless the whole corpus is within ~|strata| of the target).
    * D is clamped at 0 for that same degenerate regime. Within a
    * stratum, rows are picked in the md5 permutation order shared
    * with sample_stratified.
    *
    * Plan: one bounded counts agg feeding a broadcast scalar
    * crossJoin (the tfidf shape), a second bounded agg (deficit) +
    * one row_number over the K-row quota frame — all stratum-sized,
    * never corpus-sized — and ONE corpus window shuffle on the
    * stratum key; no corpus-wide joins. Null-lang docs are excluded
    * from quota arithmetic explicitly (they could never join back
    * anyway — equi-join null semantics — but a null stratum must
    * not absorb backfill rows either). */
  def sampleMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.filter(col("lang").isNotNull)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val sFrame = counts.agg(Exact.dsum(sqrt(col("n"))).as("s"),
      sum(col("n")).as("corpus"))
    val exactShare = counts.crossJoin(broadcast(sFrame))
      .withColumn("x", lit(MixtureTarget) * sqrt(col("n")) / col("s"))
      .select(col("lang"), col("n"), floor(col("x")).cast("long").as("base"),
        (col("x") - floor(col("x"))).as("rem"), col("corpus"))
    val deficit = exactShare.agg(
      greatest(lit(0L),
        least(lit(MixtureTarget.toLong), max(col("corpus"))) - sum(col("base"))).as("d"),
      count(lit(1)).as("k"))
    // bounded window: one row per stratum, ranked by remainder — the
    // largest-remainder rule's rank, not a corpus sort
    val qw = Window.orderBy(col("rem").desc, col("lang").asc)
    val quotas = exactShare
      .withColumn("qrank", row_number().over(qw).cast("long"))
      .crossJoin(broadcast(deficit))
      .select(col("lang"),
        (col("base") + floor(col("d") / col("k")).cast("long") +
          when(col("qrank") <= col("d") % col("k"), 1L).otherwise(0L)).as("quota"),
        col("n"))
    val w = Window.partitionBy(col("lang")).orderBy(permutationOrder: _*)
    // quotas join BELOW the window (it used to sit above) so the
    // preCut quantile filter can bound the window input per stratum;
    // null-lang docs still drop out (plain equi-join, as before)
    val picked = docs.select(col("lang"), col("doc_id"))
      .join(broadcast(quotas), Seq("lang"))
      .filter(preCut(col("quota").cast("double"), col("n")))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= col("quota"))
    guardUndercut(picked, "sample_mixture", col("quota"), col("n"))
      .select(col("lang"), col("doc_id"), col("sample_rank"))
      .orderBy(col("lang").asc_nulls_last, col("sample_rank"))
  }

  private val sampleMixtureSql: String = {
    import graft.Exact.sql._
    s"""WITH counts AS (
       |  SELECT lang, COUNT(*) AS n FROM documents WHERE lang IS NOT NULL GROUP BY 1
       |), s AS (
       |  SELECT ${sdsum("sqrt(n)")} AS s, CAST(SUM(n) AS BIGINT) AS corpus FROM counts
       |), q0 AS (
       |  SELECT lang, CAST(floor(x) AS BIGINT) AS base, x - floor(x) AS rem FROM (
       |    SELECT lang, $MixtureTarget * sqrt(n) / (SELECT s FROM s) AS x FROM counts) t
       |), d AS (
       |  SELECT GREATEST(0, LEAST($MixtureTarget, (SELECT corpus FROM s))
       |           - (SELECT SUM(base) FROM q0)) AS d,
       |         (SELECT COUNT(*) FROM q0) AS k
       |), quotas AS (
       |  SELECT lang, base + (SELECT d FROM d) // (SELECT k FROM d)
       |    + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, lang)
       |             <= (SELECT d FROM d) % (SELECT k FROM d) THEN 1 ELSE 0 END AS quota
       |  FROM q0
       |), r AS (
       |  SELECT lang, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY $PermutationOrderSql) AS rn
       |  FROM documents)
       |SELECT r.lang AS lang, doc_id, CAST(rn AS BIGINT) AS sample_rank
       |FROM r JOIN quotas q ON r.lang = q.lang
       |WHERE rn <= q.quota
       |ORDER BY r.lang NULLS LAST, sample_rank""".stripMargin
  }

  // ---- tfidf_top_terms: corpus IDF + per-doc top terms ----
  val TfidfTopK = 3

  /** Top-k salient terms per document scored tf * N / df — the
    * log-free tf-idf variant, chosen because long*long/long is a
    * fixed IEEE op sequence in both engines (ln() need not agree to
    * the last bit across libms). Words are whitespace tokens, the
    * same segmentation as text_tokens. Two partial-agged groupBys
    * (term frequency, document frequency) + one per-doc window;
    * the corpus size joins in as a broadcast scalar. */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val words = TextOps.whitespaceTokens(docs)
    // tf feeds BOTH the document-frequency agg and the score join,
    // but both consumers sit above tf's own (doc_id, term) shuffle,
    // so exchange reuse computes the corpus-wide tokenize+aggregate
    // once — round 3 paid an eager-checkpoint barrier here instead,
    // which cost more than the reuse saves (the barrier writes the
    // full term-level relation; reuse just re-reads shuffle output)
    val tf = words.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    tfidfFrom(tf, docs)
  }

  /** The scoring core over any (doc_id, term, tf) relation — shared
    * by the full and incremental entries so their outputs are
    * identical by construction. */
  private[operators] def tfidfFrom(tf: DataFrame, docs: DataFrame): DataFrame = {
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(df_, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * col("n_docs") / col("df"))
      .withColumn("term_rank", row_number().over(w).cast("long"))
      .filter(col("term_rank") <= TfidfTopK)
      .select(col("doc_id"), col("term"), col("score"), col("term_rank"))
      .orderBy(col("doc_id"), col("term_rank"))
  }

  /** Where the OLD corpus's per-doc term counts — (doc_id, term, tf)
    * — are persisted, fingerprint-keyed. Term counts over DISJOINT
    * doc sets are ADDITIVE, which is what makes tf/idf exactly
    * incrementalizable: the fresh slice's counts union with the
    * persisted table and every downstream number (df, n_docs,
    * scores, ranks) is identical to the full recompute. */
  val TfidfStatePath: String =
    graft.sources.SdfQueries.StagePath.stripSuffix("records.parquet") + "tfidf_tf.parquet"

  private val stagedTfidf = new graft.StagedVersion[(String, String)]

  /** Read (staging once per corpus version) the persisted old-corpus
    * (doc_id, term, tf) table. */
  def tfidfStateTable(spark: SparkSession, dir: String): DataFrame = {
    stagedTfidf((dir, Tables.fingerprint(spark, dir, "documents"))) {
      val docs = Tables.documents(spark, dir)
      val split = Dedup.incrementalSplit(docs).getOrElse(Long.MaxValue)
      TextOps.whitespaceTokens(docs.filter(col("doc_id") < lit(split)))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .write.mode("overwrite").parquet(TfidfStatePath)
    }
    graft.Tables.parquetCached(spark, TfidfStatePath)
  }

  /** Corpus DRIFT monitor — the release-gating signal a pipeline
    * checks before shipping a grown corpus: which terms' rates moved
    * most between the old corpus and the fresh slice (a crawl that
    * suddenly over-represents a term usually means a scraper broke,
    * a spam campaign landed, or a source flipped language). Old
    * totals come from the persisted term-count table (the fourth
    * consumer of the ONE shared state — tfidf, unigram-LM, and the
    * census read it too); the fresh slice tokenizes behind the
    * pushed predicate. Rates are long/long IEEE divisions and one
    * subtraction — deterministic in both engines — rounded at
    * presentation; top-k by |drift| with a term tie-break. */
  def corpusDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val split = Dedup.incrementalSplit(docs).getOrElse(Long.MaxValue)
    val old = tfidfStateTable(spark, dir)
      .groupBy(col("term")).agg(sum(col("tf")).as("old_n"))
    val fresh = TextOps.whitespaceTokens(docs.filter(col("doc_id") >= lit(split)))
      .groupBy(col("term")).agg(count(lit(1)).as("fresh_n"))
    val joined = old.join(fresh, Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("old_n"), lit(0L)).as("old_n"),
        coalesce(col("fresh_n"), lit(0L)).as("fresh_n"))
    val tot = joined.agg(sum(col("old_n")).as("t_old"), sum(col("fresh_n")).as("t_fresh"))
    // A degenerate corpus (no docs below the split, or no fresh
    // slice) makes one total 0 — guard each rate term so drift stays
    // a number with a pinned ordering instead of NaN (ADVICE r13);
    // the oracle mirrors the CASE.
    def rate(n: String, t: String) = when(col(t) > 0,
      col(n).cast("double") / col(t).cast("double")).otherwise(lit(0.0))
    val drift = round(rate("fresh_n", "t_fresh") - rate("old_n", "t_old"), 9)
    joined.crossJoin(broadcast(tot))
      .select(col("term"), col("old_n"), col("fresh_n"), drift.as("drift"))
      .orderBy(abs(col("drift")).desc, col("term"))
      .limit(20)
  }

  private lazy val corpusDriftSql: String =
    s"""WITH words AS (
       |  SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS term FROM documents
       |), o AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS old_n FROM words
       |  WHERE doc_id < (SELECT MAX(doc_id) * 9 // 10 FROM documents) GROUP BY term
       |), f AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS fresh_n FROM words
       |  WHERE doc_id >= (SELECT MAX(doc_id) * 9 // 10 FROM documents) GROUP BY term
       |), j AS (
       |  SELECT COALESCE(o.term, f.term) AS term,
       |    COALESCE(o.old_n, 0) AS old_n, COALESCE(f.fresh_n, 0) AS fresh_n
       |  FROM o FULL OUTER JOIN f ON o.term = f.term
       |), t AS (
       |  SELECT CAST(SUM(old_n) AS BIGINT) AS t_old,
       |         CAST(SUM(fresh_n) AS BIGINT) AS t_fresh FROM j
       |)
       |SELECT term, old_n, fresh_n,
       |  round(CASE WHEN t_fresh > 0 THEN CAST(fresh_n AS DOUBLE) / CAST(t_fresh AS DOUBLE) ELSE 0 END
       |      - CASE WHEN t_old > 0 THEN CAST(old_n AS DOUBLE) / CAST(t_old AS DOUBLE) ELSE 0 END, 9) AS drift
       |FROM j, t
       |ORDER BY abs(round(CASE WHEN t_fresh > 0 THEN CAST(fresh_n AS DOUBLE) / CAST(t_fresh AS DOUBLE) ELSE 0 END
       |      - CASE WHEN t_old > 0 THEN CAST(old_n AS DOUBLE) / CAST(t_old AS DOUBLE) ELSE 0 END, 9)) DESC, term
       |LIMIT 20""".stripMargin

  /** Steady-state tf-idf for a grown corpus: the expensive half —
    * tokenizing text — runs only on the fresh slice behind a pushed
    * scan predicate; old docs contribute their persisted (doc_id,
    * term, tf) rows (metadata-sized, no text). Document frequency
    * and n_docs recompute over the merged COUNT relation (term-level
    * rows, not text), so every score and rank equals the full
    * entry's — same oracle SQL, spec-pinned row-for-row. The
    * pattern is the shard-measure one: counts over disjoint doc
    * sets are additive, so incrementality is exact, not
    * approximate. */
  def tfidfIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val split = Dedup.incrementalSplit(docs).getOrElse(Long.MaxValue)
    val freshTf = TextOps.whitespaceTokens(docs.filter(col("doc_id") >= lit(split)))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    tfidfFrom(tfidfStateTable(spark, dir).unionByName(freshTf), docs)
  }

  private val tfidfTopTermsSql: String =
    s"""WITH words AS (
       |  SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS term FROM documents
       |), tf AS (
       |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM words GROUP BY 1, 2
       |), df AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
       |), scored AS (
       |  SELECT tf.doc_id, tf.term,
       |    tf.tf * (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) / df.df AS score
       |  FROM tf JOIN df ON tf.term = df.term
       |)
       |SELECT doc_id, term, score, term_rank FROM (
       |  SELECT doc_id, term, score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS term_rank
       |  FROM scored) t
       |WHERE term_rank <= $TfidfTopK ORDER BY doc_id, term_rank""".stripMargin

  // ---- sample_importance: DSIR-style importance resampling ----

  /** Hashed-feature space size for importance weighting. DSIR (Xie
    * et al. 2023, "Data Selection for Language Models via Importance
    * Resampling") hashes word n-grams into a fixed bucket space so
    * the target/raw distribution estimate is a BOUNDED vector no
    * matter the corpus size — the property that lets both bucket
    * count tables broadcast at 100 TB. */
  val ImportanceBuckets = 1024

  /** How many pool documents the resampling keeps. */
  val ImportanceTarget = 250

  /** Per-document importance score over hashed word-bigram features.
    * The published form weights doc x by p_target(x)/p_raw(x) under
    * hashed n-gram unigram models and Gumbel-top-k samples by the
    * weight; this implementation is the tau→0 limit (deterministic
    * top-k by weight — the same limit sample_stratified takes by
    * replacing random draws with the md5 permutation), and the
    * weight is the LOG-FREE variant: the ratio of add-one-smoothed
    * aggregate bucket frequencies
    *
    *   w(d) = (Σ_g (ct[b(g)]+1)) / (Σ_g (cr[b(g)]+1)) ·
    *          (Nr+B)/(Nt+B)
    *
    * instead of the product of per-gram probability ratios, because
    * Σ log p needs libm ln() which does not agree bit-for-bit across
    * engines (the tfidf_top_terms / text_unigram_lm trade). All
    * sufficient statistics are integer sums; the emitted weight is
    * two correctly-rounded IEEE divisions and one multiply of
    * identical operands, so both engines agree bitwise.
    *
    * Target = the held-out slice (doc_id >= the 90% split — the
    * same "curated slice vs raw pool" idiom text_decontaminate
    * uses); pool = the rest, scored and resampled.
    *
    * Scale shape — one DISJOINT corpus pass, the decontaminate
    * idiom: the doc_id slice filters push to the parquet scans, so
    * the target branch tokenizes only its slice and the pool branch
    * only the rest (a single shared-exchange pass was measured
    * WORSE: the slice filters push through the repartition into the
    * scans, the branch subtrees stop canonicalizing, and the corpus
    * tokenizes four times — the same pushdown-vs-share trap
    * sharedShingleArrays documents). The pool's (doc_id, bucket, k)
    * exchange IS shared by its two consumers (the cr bucket counts
    * and the scoring join — both reference the full column set);
    * the totals come from the ≤B-row count tables, never a third
    * corpus pass; both count tables and both 1-row totals
    * BROADCAST; the final selection is top-k
    * (TakeOrderedAndProject — never a corpus-wide window). Docs
    * with <2 tokens have no features and drop out of the pool
    * (documented, deterministic). */
  private[graft] def importanceScored(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val split = Dedup.incrementalSplit(docs).getOrElse(Long.MaxValue)
    val B = ImportanceBuckets.toLong
    val p = spark.sparkContext.defaultParallelism
    // regexp_extract_all appears ONCE, inside the generator, so
    // projection collapse cannot multiply the regex scan per
    // reference; the lambda binds the token array once per row
    val grams = docs.repartition(p, col("doc_id"))
      .select(col("doc_id"), explode(flatten(transform(
        array(regexp_extract_all(col("text"), lit("\\S+"), lit(0))),
        t => when(size(t) >= 2,
          zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array().cast("array<string>"))))).as("g"))
      .select(col("doc_id"), pmod(expr("fnv1a64(g)"), lit(B)).as("bucket"))
    // ONE corpus tokenization, materialized (the connectedComponents
    // eager-checkpoint idiom, chosen over exchange-reuse sharing):
    // the three consumers below carry DIFFERENT slice filters and
    // inferred constraints, which push through a shared repartition
    // into the scans and split the "shared" exchange into one full
    // pipeline per consumer — measured as 4 corpus tokenizations
    // before the checkpoint, 1 after. The materialization is the
    // collapsed feature relation (≈ one shuffle file's volume), the
    // same cost class as the exchange a reuse-based share would
    // write anyway, but guaranteed by construction instead of bet
    // on subtree canonicalization.
    val tfb = grams.groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("k"))
      .localCheckpoint(true)
    // one TAGGED count table (bucket, target-count, pool-count):
    // B-row bound, so it broadcasts to the scoring join and its
    // totals aggregate is free — never a second corpus pass
    val counts = tfb.groupBy(col("bucket")).agg(
      coalesce(sum(when(col("doc_id") >= lit(split), col("k"))), lit(0L)).as("ct"),
      coalesce(sum(when(col("doc_id") < lit(split), col("k"))), lit(0L)).as("cr"))
      .localCheckpoint(true)
    val tots = counts.agg(
      coalesce(sum(col("ct")), lit(0L)).as("nt"),
      coalesce(sum(col("cr")), lit(0L)).as("nr"))
    val pool = tfb.filter(col("doc_id") < lit(split))
      .join(broadcast(counts), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k") * (col("ct") + lit(1L))).as("sum_t"),
        sum(col("k") * (col("cr") + lit(1L))).as("sum_r"))
    val wRaw = (col("sum_t").cast("double") / col("sum_r").cast("double")) *
      ((col("nr") + lit(B)).cast("double") / (col("nt") + lit(B)).cast("double"))
    pool.crossJoin(broadcast(tots))
      .select(col("doc_id"), col("n_bigrams"), col("sum_t"), col("sum_r"),
        round(wRaw, 6).as("weight"))
  }

  /** The driver entry: keep the ImportanceTarget highest-weight pool
    * documents. Selection is orderBy+limit (TakeOrderedAndProject:
    * each partition keeps k, the driver merges k — corpus-sort-free)
    * and the rank window runs over the k survivors only. */
  def sampleImportance(spark: SparkSession, dir: String): DataFrame = {
    val top = importanceScored(spark, dir)
      .orderBy(col("weight").desc, col("doc_id").asc)
      .limit(ImportanceTarget)
    val w = Window.orderBy(col("weight").desc, col("doc_id").asc)
    top.withColumn("sample_rank", row_number().over(w).cast("long"))
      .select(col("sample_rank"), col("doc_id"), col("n_bigrams"),
        col("sum_t"), col("sum_r"), col("weight"))
      .orderBy(col("sample_rank"))
  }

  private lazy val sampleImportanceSql: String = {
    val B = ImportanceBuckets
    val fnv = TextOps.signedInt64Sql(TextOps.fnv1a64FoldSql("g"))
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents
       |), big AS (
       |  SELECT doc_id, t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS g
       |  FROM tok, UNNEST(range(1, len(t))) AS r(i)
       |), tfb AS (
       |  SELECT doc_id, (($fnv % $B) + $B) % $B AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS k
       |  FROM big GROUP BY 1, 2
       |), s AS (SELECT MAX(doc_id) * 9 // 10 AS v FROM documents
       |), ct AS (
       |  SELECT bucket, CAST(SUM(k) AS BIGINT) AS ct FROM tfb
       |  WHERE doc_id >= (SELECT v FROM s) GROUP BY 1
       |), cr AS (
       |  SELECT bucket, CAST(SUM(k) AS BIGINT) AS cr FROM tfb
       |  WHERE doc_id < (SELECT v FROM s) GROUP BY 1
       |), tots AS (
       |  SELECT COALESCE(CAST(SUM(CASE WHEN doc_id >= (SELECT v FROM s) THEN k END) AS BIGINT), 0) AS nt,
       |         COALESCE(CAST(SUM(CASE WHEN doc_id < (SELECT v FROM s) THEN k END) AS BIGINT), 0) AS nr
       |  FROM tfb
       |), pool AS (
       |  SELECT tfb.doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(k * (COALESCE(ct.ct, 0) + 1)) AS BIGINT) AS sum_t,
       |    CAST(SUM(k * (cr.cr + 1)) AS BIGINT) AS sum_r
       |  FROM tfb LEFT JOIN ct USING (bucket) JOIN cr USING (bucket)
       |  WHERE tfb.doc_id < (SELECT v FROM s)
       |  GROUP BY 1
       |), scored AS (
       |  SELECT doc_id, n_bigrams, sum_t, sum_r,
       |    round((CAST(sum_t AS DOUBLE) / CAST(sum_r AS DOUBLE))
       |      * (CAST(nr + $B AS DOUBLE) / CAST(nt + $B AS DOUBLE)), 6) AS weight
       |  FROM pool CROSS JOIN tots
       |)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY weight DESC, doc_id) AS BIGINT) AS sample_rank,
       |  doc_id, n_bigrams, sum_t, sum_r, weight
       |FROM scored ORDER BY weight DESC, doc_id LIMIT $ImportanceTarget""".stripMargin
  }

  // ---- text_decontaminate: benchmark-leakage check ----
  /** A corpus document is flagged when at least this fraction of its
    * distinct shingles appears somewhere in the benchmark slice —
    * set containment, the decontamination analogue of Jaccard (a
    * short eval prompt embedded in a long document still flags the
    * PROMPT's presence; symmetric Jaccard would dilute it). */
  val ContainmentThreshold = 0.5

  /** Benchmark decontamination — the training-data hygiene op the
    * dedup family exists to support: flag corpus documents whose
    * 16-char shingle set is substantially contained in the
    * "benchmark" slice's union shingle set (eval-set leakage into
    * training data). The benchmark slice reuses the incremental
    * split (doc_id >= max*9/10 — a fixed fraction, identical
    * integer arithmetic in both engines).
    *
    * Scale shape: the benchmark side is BOUNDED (eval suites are
    * MBs, not TBs) — its distinct shingles broadcast, so the corpus
    * is touched by one kernel pass + one map-side semi-join + one
    * doc_id-partitioned count; no corpus-vs-corpus shuffle exists.
    * The doc_id filters push to the parquet scan, so each branch
    * shingles only its own slice (disjoint — the kernel total stays
    * one corpus pass). */
  def textDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val split = Dedup.incrementalSplit(docs).getOrElse(Long.MaxValue)
    val hashed = Dedup.sharedShingleArrays(docs)
    val corpus = hashed.filter(col("doc_id") < lit(split))
      .select(col("doc_id"), col("n").cast("long").as("n_shingles"),
        explode(col("ghs")).as("gh"))
    val bench = hashed.filter(col("doc_id") >= lit(split))
      .select(explode(col("ghs")).as("gh")).distinct()
    corpus.join(broadcast(bench), Seq("gh"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(max(col("n_shingles")).as("n_shingles"),
        count(lit(1)).as("n_contaminated"))
      .withColumn("containment",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
      .filter(col("n_contaminated").cast("double") / col("n_shingles") >= ContainmentThreshold)
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"), col("containment"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin on string shingles (the hashed counts equal the
    * string-set counts up to the family's 64-bit collision bound). */
  private val textDecontaminateSql: String =
    s"""WITH sh AS (
       |  ${Dedup.ShingleCteSql}
       |), s AS (SELECT MAX(doc_id) * 9 // 10 AS v FROM documents
       |), bs AS (
       |  SELECT DISTINCT g FROM sh WHERE doc_id >= (SELECT v FROM s)
       |), cs AS (
       |  SELECT doc_id, g FROM sh WHERE doc_id < (SELECT v FROM s)
       |), tot AS (
       |  SELECT doc_id, COUNT(*) AS n_shingles FROM cs GROUP BY 1
       |), hit AS (
       |  SELECT doc_id, COUNT(*) AS n_contaminated
       |  FROM cs WHERE g IN (SELECT g FROM bs) GROUP BY 1
       |)
       |SELECT t.doc_id, n_shingles, n_contaminated,
       |  round(CAST(n_contaminated AS DOUBLE) / n_shingles, 6) AS containment
       |FROM tot t JOIN hit h ON t.doc_id = h.doc_id
       |WHERE CAST(n_contaminated AS DOUBLE) / n_shingles >= $ContainmentThreshold
       |ORDER BY t.doc_id""".stripMargin

  // ---- decontaminate_bloom: the compact-broadcast scale variant ----
  /** Same semantics as [[textDecontaminate]] (identical output, same
    * oracle), with the benchmark shingle set shipped as a BLOOM
    * FILTER instead of an exact broadcast hash set. Why this exists
    * as its own gated entry: the exact semi-join broadcasts
    * ~16 bytes per distinct bench shingle, while the bloom is ~10
    * BITS per element at 1% fpp — a 10-13x smaller broadcast, the
    * difference between "fits every executor" and "doesn't" when
    * the eval corpus is GBs. Bloom false positives would break the
    * exactness contract, so the filter is a PREFILTER only: corpus
    * shingles that bloom-hit (true hits + ~1% fp) still pass the
    * exact semi-join, whose probe side has now shrunk from the
    * whole corpus to the hit stream. Output is provably identical —
    * the bloom never produces false NEGATIVES, so no true hit is
    * lost, and the confirm join removes every false positive. */
  /** Codegen'd bloom probe over a long column: Spark's own
    * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * (the expression behind runtime row-level filtering) over the
    * serialized filter, instead of a per-row Scala UDF. The probe is
    * applied to the corpus-side EXPLODED shingle stream — the single
    * hottest relation in the query — so interpreted boxing dispatch
    * per shingle is exactly the cost class this repo's native-kernel
    * discipline exists to avoid. Semantics are bit-identical:
    * BloomFilterMightContain.eval IS `bloomFilter.mightContainLong
    * (value)`, the same call the UDF made, on the same
    * `org.apache.spark.util.sketch.BloomFilter` implementation
    * (writeTo/readFrom round-trip). The binary literal rides the
    * stage's task-binary broadcast, so executors still receive the
    * filter once per stage, not per row. */
  private[graft] def bloomProbe(
      bloom: org.apache.spark.util.sketch.BloomFilter, value: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, org.apache.spark.sql.types.BinaryType),
      ColumnBridge.expression(value)))
  }

  def decontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val split = Dedup.incrementalSplit(docs).getOrElse(Long.MaxValue)
    val hashed = Dedup.sharedShingleArrays(docs)
    val corpus = hashed.filter(col("doc_id") < lit(split))
      .select(col("doc_id"), col("n").cast("long").as("n_shingles"),
        explode(col("ghs")).as("gh"))
    // eager checkpoint (the connectedComponents idiom): the bench
    // shingle set has TWO consumers in different ACTIONS — the bloom
    // build below and the confirm join's broadcast build — and
    // exchange reuse cannot share across actions, so the un-
    // materialized form re-ran the bench-side shingle kernel +
    // distinct once per consumer (r20 profile: two of the entry's
    // heavy stages were that second pass). The materialization is the
    // distinct-shingle relation — bounded by the eval suite's size,
    // the same class as the broadcast it feeds — and it is fully
    // materialized by the bloom action BEFORE the confirm join's
    // broadcast thread plans over it (the r4 lazy-persist trap).
    val bench = hashed.filter(col("doc_id") >= lit(split))
      .select(explode(col("ghs")).as("gh")).distinct()
      .localCheckpoint(true)
    // The bench side is bounded by design (eval suites, not corpora).
    // Size the bloom from an UPPER BOUND derived from column metadata
    // — Σ max(n_chars - N + 1, 0) over bench docs is the total window
    // count, and distinct shingles can only be fewer — instead of an
    // exact distinct count: the exact count was a full extra pass
    // through the shingle kernel + distinct exchange per run (r20
    // profile: 2 of the entry's 7 heavy stages) for a number the
    // filter only needs as a capacity floor. Over-sizing a bloom
    // cannot change output (expectedNumItems high ⇒ fpp LOWER than
    // the 1% target; false positives were already removed by the
    // exact confirm join below; false negatives are impossible
    // either way) — it only costs bits: ~10 bits per window instead
    // of per distinct shingle, still metadata-sized vs the corpus.
    // The bound scans just (doc_id, n_chars) — no text, no kernel.
    // It assumes n_chars == length(text) (what the kernel shingles);
    // TablesSpec pins that invariant against the generated corpus
    // (ADVICE r21), since a divergence would silently degrade the
    // prefilter's selectivity (never its correctness — see above).
    val nBench = math.max(docs
      .filter(col("doc_id") >= lit(split))
      .agg(coalesce(sum(greatest(col("n_chars") - lit(Dedup.ShingleN - 1), lit(0L))),
        lit(0L)).as("n"))
      .collect()(0).getLong(0), 1L)
    val bloom = bench.stat.bloomFilter("gh", nBench, 0.01)
    corpus.filter(bloomProbe(bloom, col("gh")))
      .join(broadcast(bench), Seq("gh"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(max(col("n_shingles")).as("n_shingles"),
        count(lit(1)).as("n_contaminated"))
      .withColumn("containment",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
      .filter(col("n_contaminated").cast("double") / col("n_shingles") >= ContainmentThreshold)
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"), col("containment"))
      .orderBy(col("doc_id"))
  }

  // ---- curate_pipeline: the composed nightly curation job ----
  /** Quality gates for the composed pipeline — deliberately plain
    * raw-column rules (the Gopher/C4-style length+symbol cuts), each
    * an IEEE long/long division both engines compute identically. */
  val CurateMinChars = 100L
  val CurateMaxChars = 10000L
  val CurateMaxPunctRatio = 0.1
  val CurateMaxMeanWordLen = 12.0

  /** END-TO-END curation: quality gates → exact dedup → near-dup
    * drop → stratified quota sample, composed EXACTLY as a nightly
    * training-data job chains them — the completeness claim that the
    * engine's operators compose, priced as one plan.
    *
    *  1. QUALITY: length window + punctuation-ratio + mean-word-
    *     length cuts (raw-column predicates, pushdown-friendly).
    *  2. EXACT DEDUP: keep the min doc_id per content hash — one
    *     window over md5(text), the dedup_exact decision applied.
    *  3. NEAR-DUP DROP: drop every non-root member of a corpus-level
    *     near-dup cluster (dedup_clusters over the staged verified
    *     pair list). Corpus-level deliberately: the canonical keeper
    *     is a property of the corpus, not of whatever survived this
    *     run's quality gates — the roots themselves may have been
    *     quality-dropped, and then the whole cluster is gone, which
    *     is the conservative curation answer. The anti-join side is
    *     cluster-member-sized (pair-bounded), broadcast under AQE.
    *  4. SAMPLE: per-language quota in THE shared md5 permutation
    *     order, with the same quantile pre-cut + in-plan undercut
    *     guard as sample_stratified (counts computed over the
    *     SURVIVORS — the stratum the quota draws from).
    *
    * One corpus scan, two linear shuffles (content-hash window,
    * stratum window with pre-cut-bounded input), one bounded
    * broadcast anti-join, one bounded counts join — no stage is
    * pair-quadratic or corpus-squared, so the composition scales
    * exactly as far as its worst member. */
  def curatePipeline(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    // Quality counts via the fused one-pass stats kernel — the same
    // regexes remain the DEFINITION (the oracle runs them; the
    // kernel==regex equivalence is TextOpsSpec-pinned). The raw
    // regexp_count/regexp_replace stack here was the last regex
    // consumer left after round 12 retired the text family's, and
    // was the bulk of this entry's 2.4x sf10 gap (VERDICT r12).
    // CSE evaluates graft_text_stats(text) once per row.
    val st = expr("graft_text_stats(text)")
    val nChars = length(col("text")).cast("long")
    val nWords = element_at(st, 1)
    val nPunct = element_at(st, 3)
    val nNonSpace = element_at(st, 5)
    val quality = docs.filter(
      nChars >= lit(CurateMinChars) && nChars <= lit(CurateMaxChars) &&
        nPunct / nChars < lit(CurateMaxPunctRatio) &&
        nNonSpace / nWords < lit(CurateMaxMeanWordLen))
    val exact = quality
      .withColumn("rk",
        row_number().over(Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
    val nonRoots = dedupClusters(spark, dir)
      .filter(col("cluster_root") =!= col("doc_id")).select(col("doc_id"))
    val kept = exact.join(nonRoots, Seq("doc_id"), "left_anti")
      .select(col("lang"), col("doc_id"))
    val counts = kept.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .withColumnRenamed("lang", "c_lang")
    val w = Window.partitionBy(col("lang")).orderBy(permutationOrder: _*)
    val picked = kept
      .join(broadcast(counts), col("lang") <=> col("c_lang"))
      .filter(preCut(lit(SampleQuota.toDouble), col("n")))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= SampleQuota)
    guardUndercut(picked, "curate_pipeline", lit(SampleQuota.toLong), col("n"))
      .select(col("lang"), col("doc_id"), col("sample_rank"))
      .orderBy(col("lang").asc_nulls_last, col("sample_rank"))
  }

  /** The oracle composes the same four stages from the same pieces:
    * the quality predicates as text_quality's SQL forms, the exact
    * window, the recursive-CTE closure over the SAME staged pair
    * list, the shared permutation sample. */
  private lazy val curatePipelineSql: String =
    s"""WITH RECURSIVE q AS (
       |  SELECT doc_id, lang, text FROM documents
       |  WHERE length(text) >= $CurateMinChars AND length(text) <= $CurateMaxChars
       |    AND len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / length(text) < $CurateMaxPunctRatio
       |    AND length(regexp_replace(text, '\\s', '', 'g')) / len(regexp_extract_all(text, '\\S+')) < $CurateMaxMeanWordLen
       |), e AS (
       |  SELECT doc_id, lang FROM (
       |    SELECT doc_id, lang,
       |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
       |    FROM q) t WHERE rk = 1
       |), pairs AS (
       |  SELECT doc_a, doc_b
       |  FROM read_parquet('${Dedup.ClusterSignalStagePath}/*.parquet')
       |), sym AS MATERIALIZED (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), cc(v, lab) AS (
       |  SELECT a, a FROM sym
       |  UNION
       |  SELECT sym.a, cc.lab FROM cc JOIN sym ON sym.b = cc.v
       |), roots AS (
       |  SELECT v AS doc_id, MIN(lab) AS cluster_root FROM cc GROUP BY v
       |), kept AS (
       |  SELECT e.doc_id, e.lang FROM e LEFT JOIN roots r USING (doc_id)
       |  WHERE r.cluster_root IS NULL OR r.cluster_root = e.doc_id
       |)
       |SELECT lang, doc_id, CAST(rn AS BIGINT) AS sample_rank FROM (
       |  SELECT lang, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY $PermutationOrderSql) AS rn
       |  FROM kept) t
       |WHERE rn <= $SampleQuota ORDER BY lang NULLS LAST, sample_rank""".stripMargin

  /** Leakage-free train/validation split — the dedup-aware split a
    * pretraining pipeline must make: a plain per-document random
    * split leaks every near-duplicate pair that straddles it (a val
    * doc whose near-dup sits in train inflates eval — the
    * contamination channel Lee et al. 2022 measure), so the side is
    * assigned per CLUSTER: each doc resolves to its near-dup
    * component root (singletons to themselves) and the md5
    * permutation of the ROOT — the library's one engine-reproducible
    * randomness convention — picks train (9/10) or val (1/10). By
    * construction no cluster, hence no near-dup pair, spans sides;
    * CurationSpec pins both properties on the output plus the ratio.
    *
    * Plan shape: component labels come from the staged pair list
    * (pair-graph-sized — the duplicated subset of the corpus, not
    * the corpus), left-joined onto the doc_id-only documents scan
    * (pruned: no text column) — one hash join keyed on doc_id, no
    * skew (roots fan out, they don't concentrate). The md5
    * arithmetic matches the shard/sampler convention, so a re-run
    * or a second engine reproduces the split bit-for-bit. */
  def splitLeakageFree(spark: SparkSession, dir: String): DataFrame = {
    val labels = connectedComponents(
      Dedup.clusterPairSignal(spark, dir)
        .select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("v").as("doc_id"), col("lab").as("root"))
    val withRoot = Tables.documents(spark, dir).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("root"), col("doc_id")).as("cluster_root"))
    val prefix = conv(substring(md5(col("cluster_root").cast("string")), 1, 8), 16, 10)
      .cast("long")
    withRoot
      .select(col("doc_id"), col("cluster_root"),
        when(prefix % 10 < 9, "train").otherwise("val").as("side"))
      .orderBy(col("doc_id"))
  }

  private lazy val splitLeakageFreeSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b
       |  FROM read_parquet('${Dedup.ClusterSignalStagePath}/*.parquet')
       |), sym AS MATERIALIZED (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), cc(v, lab) AS (
       |  SELECT a, a FROM sym
       |  UNION
       |  SELECT sym.a, cc.lab FROM cc JOIN sym ON sym.b = cc.v
       |), roots AS (
       |  SELECT v AS doc_id, MIN(lab) AS root FROM cc GROUP BY v
       |)
       |SELECT d.doc_id,
       |  COALESCE(r.root, d.doc_id) AS cluster_root,
       |  CASE WHEN ('0x' || substring(
       |      md5(CAST(COALESCE(r.root, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT % 10 < 9
       |    THEN 'train' ELSE 'val' END AS side
       |FROM documents d LEFT JOIN roots r ON d.doc_id = r.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Where the OLD corpus's split sides — (doc_id, side) under
    * [[splitLeakageFree]]'s rule restricted to old-old pairs — are
    * persisted, fingerprint-keyed. This is the carried state a
    * release pipeline must respect: a doc that shipped in val must
    * not silently move to train next release (the trained model's
    * eval would quietly become contaminated-by-history). */
  val SplitSidesPath: String =
    graft.sources.SdfQueries.StagePath.stripSuffix("records.parquet") + "split_sides.parquet"

  private val stagedSplitSides = new graft.StagedVersion[(String, String)]

  /** Read (staging once per corpus version) the persisted old-corpus
    * split sides: component roots over the OLD-OLD pair subgraph
    * (doc_b below the incremental split implies both endpoints are),
    * md5(root) side rule, singletons to themselves. */
  def splitSidesTable(spark: SparkSession, dir: String): DataFrame = {
    stagedSplitSides((dir, Tables.fingerprint(spark, dir, "documents"))) {
      val docs = Tables.documents(spark, dir)
      val split = Dedup.incrementalSplit(docs).getOrElse(Long.MaxValue)
      val oldLabels = connectedComponents(
        Dedup.clusterPairSignal(spark, dir).filter(col("doc_b") < lit(split))
          .select(col("doc_a").as("a"), col("doc_b").as("b")))
        .select(col("v").as("doc_id"), col("lab").as("root"))
      val withRoot = docs.filter(col("doc_id") < lit(split)).select(col("doc_id"))
        .join(oldLabels, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("r"))
      val prefix = conv(substring(md5(col("r").cast("string")), 1, 8), 16, 10).cast("long")
      withRoot
        .select(col("doc_id"), when(prefix % 10 < 9, "train").otherwise("val").as("side"))
        .write.mode("overwrite").parquet(SplitSidesPath)
    }
    graft.Tables.parquetCached(spark, SplitSidesPath)
  }

  /** STICKY split maintenance for a grown corpus — the release-time
    * twin of [[splitLeakageFree]]: recomputing md5 sides from
    * scratch would migrate any old doc whose cluster ROOT moved
    * (fresh pairs extend clusters downward in min-id), silently
    * contaminating a model already evaluated on yesterday's val
    * set. Instead the side is INHERITED: each cluster takes the
    * persisted side of its minimum OLD member; clusters with no old
    * member (all-fresh) get the md5(root) rule. Old docs therefore
    * keep their shipped side with one exception a real pipeline
    * must surface rather than hide: fresh pairs can MERGE two old
    * clusters that sat on different sides — the merged cluster
    * takes the min-old-member's side and the minority members are
    * emitted with `flipped` = true, the quarantine signal (drop
    * them from eval, or re-ship: either way it is a human decision,
    * not a silent migration). Spec pins stickiness, the md5 rule on
    * all-fresh clusters, the pair property, and a constructed
    * cross-side merge raising the flag. */
  def splitLeakageFreeIncremental(spark: SparkSession, dir: String): DataFrame = {
    val old = splitSidesTable(spark, dir)
    val labels = connectedComponents(
      Dedup.clusterPairSignal(spark, dir)
        .select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("v").as("doc_id"), col("lab").as("root"))
    val withRoot = Tables.documents(spark, dir).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("cluster_root"))
    stickySides(withRoot, old).orderBy(col("doc_id"))
  }

  /** The sticky-side core over any (doc_id, cluster_root) frame and
    * persisted (doc_id, side) table — exposed for the spec's
    * constructed cross-side-merge case. */
  private[graft] def stickySides(withRoot: DataFrame, old: DataFrame): DataFrame = {
    val reps = withRoot.join(old, Seq("doc_id"))
      .groupBy(col("cluster_root"))
      .agg(min_by(col("side"), col("doc_id")).as("old_side"))
    val prefix = conv(substring(md5(col("cluster_root").cast("string")), 1, 8), 16, 10)
      .cast("long")
    withRoot
      .join(reps, Seq("cluster_root"), "left")
      .join(old.withColumnRenamed("side", "prev_side"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_root"),
        coalesce(col("old_side"),
          when(prefix % 10 < 9, "train").otherwise("val")).as("side"),
        col("prev_side"))
      .select(col("doc_id"), col("cluster_root"), col("side"),
        (col("prev_side").isNotNull && col("prev_side") =!= col("side")).as("flipped"))
  }

  private lazy val splitLeakageFreeIncrementalSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b
       |  FROM read_parquet('${Dedup.ClusterSignalStagePath}/*.parquet')
       |), sym AS MATERIALIZED (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), cc(v, lab) AS (
       |  SELECT a, a FROM sym
       |  UNION
       |  SELECT sym.a, cc.lab FROM cc JOIN sym ON sym.b = cc.v
       |), roots AS (
       |  SELECT v AS doc_id, MIN(lab) AS root FROM cc GROUP BY v
       |), wr AS (
       |  SELECT d.doc_id, COALESCE(r.root, d.doc_id) AS cluster_root
       |  FROM documents d LEFT JOIN roots r ON d.doc_id = r.doc_id
       |), old AS (
       |  SELECT doc_id, side FROM read_parquet('$SplitSidesPath/*.parquet')
       |), reps AS (
       |  SELECT w.cluster_root, min_by(o.side, o.doc_id) AS old_side
       |  FROM wr w JOIN old o ON w.doc_id = o.doc_id
       |  GROUP BY w.cluster_root
       |), sided AS (
       |  SELECT w.doc_id, w.cluster_root,
       |    COALESCE(rp.old_side,
       |      CASE WHEN ('0x' || substring(
       |          md5(CAST(w.cluster_root AS VARCHAR)), 1, 8))::BIGINT % 10 < 9
       |        THEN 'train' ELSE 'val' END) AS side
       |  FROM wr w LEFT JOIN reps rp ON w.cluster_root = rp.cluster_root
       |)
       |SELECT s.doc_id, s.cluster_root, s.side,
       |  (o.side IS NOT NULL AND o.side <> s.side) AS flipped
       |FROM sided s LEFT JOIN old o ON s.doc_id = o.doc_id
       |ORDER BY s.doc_id""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("curate_pipeline", Some(curatePipelineSql), curatePipeline),
    GraftQuery("split_leakage_free", Some(splitLeakageFreeSql), splitLeakageFree),
    GraftQuery("split_leakage_free_incremental",
      Some(splitLeakageFreeIncrementalSql), splitLeakageFreeIncremental),
    GraftQuery("dedup_clusters", Some(dedupClustersSql), dedupClusters),
    GraftQuery("dedup_clusters_incremental",
      Some(dedupClustersIncrementalSql), dedupClustersIncremental),
    GraftQuery("sample_stratified", Some(sampleStratifiedSql), sampleStratified),
    GraftQuery("sample_mixture", Some(sampleMixtureSql), sampleMixture),
    GraftQuery("sample_importance", Some(sampleImportanceSql), sampleImportance),
    GraftQuery("tfidf_top_terms", Some(tfidfTopTermsSql), tfidfTopTerms),
    // identical output (and oracle) to the full operator BY DESIGN —
    // what differs is the plan: persisted term counts for old docs,
    // tokenization only over the pushed fresh-slice scan
    GraftQuery("tfidf_incremental", Some(tfidfTopTermsSql), tfidfIncremental),
    GraftQuery("corpus_drift", Some(corpusDriftSql), corpusDrift),
    GraftQuery("text_decontaminate", Some(textDecontaminateSql), textDecontaminate),
    GraftQuery("decontaminate_bloom", Some(textDecontaminateSql), decontaminateBloom))
}
