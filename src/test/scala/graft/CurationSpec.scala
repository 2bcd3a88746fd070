package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"
  import operators.Curation

  test("connected components: chains, cliques, and singleton-free output") {
    import spark.implicits._
    // two components: a 5-chain (propagation must cross 4 hops) and
    // a triangle; vertex 100 is isolated (no edges → not emitted)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("a", "b")
    val labels = Curation.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("pointer jumping resolves a 200-vertex chain inside the round cap") {
    import spark.implicits._
    // plain min-label propagation needs diameter-1 = 199 rounds — far
    // past the default cap of 20; the jump (lab(v) := lab(lab(v)))
    // halves distance-to-root per round, so ~log2(200) rounds
    // suffice. This pins the doubling behavior, not just the answer.
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Curation.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 200)
    assert(labels.values.forall(_ == 0L), "chain must resolve to the single min root")
  }

  test("dedup_clusters: every near-dup pair lands in one cluster rooted at its min doc") {
    val pairs = operators.Dedup.dedupNgramJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val roots = Curation.dedupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty && roots.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(roots(a) == roots(b), s"pair ($a,$b) split across clusters")
      assert(roots(a) <= a && roots(a) <= b, s"root ${roots(a)} not the min of its cluster")
    }
    // roots are themselves members labeled with themselves
    roots.values.foreach(r => assert(roots(r) == r))
  }

  test("dedup_clusters_incremental equals the full recompute restricted to touched components") {
    val split = Tables.documents(spark, dir)
      .agg(max(col("doc_id"))).head.getLong(0) * 9 / 10
    // full recompute over all pairs
    val full = Curation.dedupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // components touched by a slice pair (either endpoint)
    val sliceEndpoints = operators.Dedup.ngramPairsStaged(spark, dir)
      .filter(col("doc_b") >= lit(split))
      .collect().flatMap(r => Seq(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet
    assert(sliceEndpoints.nonEmpty, "corpus must plant cross-split near-dups")
    val touchedRoots = sliceEndpoints.map(full)
    val expected = full.filter { case (_, root) => touchedRoots(root) }
    val got = Curation.dedupClustersIncremental(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"incremental fold diverged: ${got.size} rows vs expected ${expected.size}")
    // and it must be a strict subset of the full output when some
    // component is untouched (otherwise the restriction is vacuous)
    assert(got.size <= full.size)
  }

  test("split_leakage_free: no near-dup pair straddles the split, sides are md5(root), ratio sane") {
    import org.apache.spark.sql.functions._
    val split = operators.Curation.splitLeakageFree(spark, dir)
    val rows = split.collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.length == nDocs, "every document must get a side")
    // the leakage property, checked on the PAIRS (not just clusters):
    // both endpoints of every near-dup pair share a side
    val side = rows.map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = operators.Dedup.ngramPairsStaged(spark, dir)
      .select("doc_a", "doc_b").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { p =>
      val (a, b) = (p.getLong(0), p.getLong(1))
      assert(side(a) == side(b), s"near-dup pair ($a, $b) straddles the split")
    }
    // side derives from the cluster root by the shared md5 convention
    rows.foreach { r =>
      val root = r.getLong(1)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(root.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val expect = if (java.lang.Long.parseLong(hex, 16) % 10 < 9) "train" else "val"
      assert(r.getString(2) == expect, s"doc ${r.getLong(0)}: side != md5(root) rule")
    }
    // ~90/10: loose band, the point is both sides are populated sanely
    val nVal = rows.count(_.getString(2) == "val")
    assert(nVal > nDocs / 50 && nVal < nDocs / 4, s"val fraction off: $nVal of $nDocs")
  }

  test("cluster signal routing: ngram below the budget line, minhash above, forced routes honored") {
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ngram = pairsOf(operators.Dedup.ngramPairsStaged(spark, dir))
    // default at test scale: the grid's predicted shuffle is far
    // below any sane disk budget — the signal IS the ngram list
    assert(pairsOf(operators.Dedup.clusterPairSignal(spark, dir)) == ngram)
    assert(operators.Dedup.lastClusterSignalRoute == "ngram")
    try {
      // sizing model says DNF (budget forced to one byte): the
      // signal reroutes to the minhash sweep without a force flag
      spark.conf.set("graft.clusters.gridShuffleBudgetBytes", "1")
      val rerouted = pairsOf(operators.Dedup.clusterPairSignal(spark, dir))
      assert(operators.Dedup.lastClusterSignalRoute == "minhash")
      assert(rerouted == pairsOf(operators.Dedup.dedupMinhashLshStaged(spark, dir)))
      // forced override wins over the sizing model
      spark.conf.set("graft.clusters.signalRoute", "ngram")
      assert(pairsOf(operators.Dedup.clusterPairSignal(spark, dir)) == ngram)
    } finally {
      spark.conf.unset("graft.clusters.gridShuffleBudgetBytes")
      spark.conf.unset("graft.clusters.signalRoute")
    }
    // flip-flop back to the default route re-stages (last-version
    // memo): consumers never read a stale rerouted signal
    assert(pairsOf(operators.Dedup.clusterPairSignal(spark, dir)) == ngram)
  }

  test("sticky split: old sides kept, fresh clusters md5-ruled, cross-side merge flags flipped") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // entry over the real corpus: no near-dup pair straddles, and
    // every unflipped old doc keeps its persisted side
    val inc = operators.Curation.splitLeakageFreeIncremental(spark, dir).collect()
    val side = inc.map(r => r.getLong(0) -> r.getString(2)).toMap
    operators.Dedup.ngramPairsStaged(spark, dir).select("doc_a", "doc_b").collect()
      .foreach { p =>
        assert(side(p.getLong(0)) == side(p.getLong(1)),
          s"near-dup pair (${p.getLong(0)}, ${p.getLong(1)}) straddles the sticky split")
      }
    val prev = operators.Curation.splitSidesTable(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    inc.filter(r => prev.contains(r.getLong(0))).foreach { r =>
      if (!r.getBoolean(3))
        assert(side(r.getLong(0)) == prev(r.getLong(0)),
          s"unflipped old doc ${r.getLong(0)} changed side")
      else assert(side(r.getLong(0)) != prev(r.getLong(0)))
    }
    // constructed cross-side merge: clusters {1,2} (train) and
    // {3,4} (val) merged by a fresh doc 10 into one cluster rooted
    // at 1 — the cluster takes doc 1's side (min old member) and
    // docs 3,4 flip; the all-fresh cluster {20} follows md5(20)
    val withRoot = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 1L), (20L, 20L))
      .toDF("doc_id", "cluster_root")
    val old = Seq((1L, "train"), (2L, "train"), (3L, "val"), (4L, "val"))
      .toDF("doc_id", "side")
    val out = operators.Curation.stickySides(withRoot, old).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3))).toMap
    assert(out(1L) == ("train", false) && out(2L) == ("train", false))
    assert(out(3L) == ("train", true) && out(4L) == ("train", true),
      s"cross-side merge must flip the minority members: $out")
    assert(out(10L) == ("train", false), "fresh doc joins the merged cluster's side")
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("20".getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 8)
    val expect20 = if (java.lang.Long.parseLong(hex, 16) % 10 < 9) "train" else "val"
    assert(out(20L) == (expect20, false), "all-fresh cluster must follow the md5 rule")
  }

  test("importance resampling: entry shape, and target near-dups outrank the pool median") {
    val top = Curation.sampleImportance(spark, dir).collect()
    assert(top.length == Curation.ImportanceTarget)
    val weights = top.map(_.getAs[Double]("weight"))
    assert(weights.zip(weights.tail).forall { case (a, b) => a >= b },
      "weights must be non-increasing in rank order")
    assert(top.map(_.getAs[Long]("sample_rank")).toSeq == (1L to top.length).toSeq)

    // semantic pin: a pool doc that near-duplicates a TARGET-slice
    // doc shares its bigram profile, so its importance weight must
    // sit in the upper half of the pool distribution — the property
    // DSIR selection exists to deliver
    val scored = Curation.importanceScored(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("weight")).toMap
    val split = Tables.documents(spark, dir)
      .agg(max(col("doc_id"))).head.getLong(0) * 9 / 10
    val dupPoolDocs = operators.Dedup.dedupNgramJaccardIncremental(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .collect { case (a, _) if a < split => a }.distinct
    val dupWeights = dupPoolDocs.flatMap(scored.get)
    assert(dupWeights.nonEmpty, "corpus must plant cross-split near-dups")
    val all = scored.values.toArray.sorted
    val median = all(all.length / 2)
    assert(dupWeights.sum / dupWeights.size > median,
      s"cross-split near-dups (mean ${dupWeights.sum / dupWeights.size}) " +
        s"should outrank the pool median ($median)")
  }

  test("mixture sample: quotas follow floor(N*sqrt(n)/S) and flatten dominant strata") {
    import spark.implicits._
    // hand-checked skew: counts 16/4/1 -> sqrt 4/2/1, S=7; with
    // N=200 the quotas are floor(200*4/7)=114, floor(200*2/7)=57,
    // floor(200*1/7)=28 — capped by each stratum's actual size
    val docs = (0 until 16).map(i => (i.toLong, s"a $i", "aa")) ++
      (16 until 20).map(i => (i.toLong, s"b $i", "bb")) ++
      Seq((20L, "c 20", "cc"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_mix").toString
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Curation.sampleMixture(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perLang = out.groupBy(_._1).map { case (l, rows) => l -> rows.length }
    // quotas exceed the tiny strata, so every stratum is taken whole —
    // the QUOTA arithmetic is pinned against the real corpus below
    assert(perLang == Map("aa" -> 16, "bb" -> 4, "cc" -> 1), perLang.toString)

    // real corpus: en dominates; sqrt-weighting must FLATTEN — en's
    // sampled share strictly below its raw share, rare langs above
    val real = Curation.sampleMixture(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val counts = Tables.documents(spark, dir).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = real.groupBy(_._1).map { case (l, rows) => l -> rows.length.toDouble }
    val rawShareEn = counts("en").toDouble / counts.values.sum
    val mixShareEn = sampled("en") / sampled.values.sum
    if (rawShareEn > 1.0 / counts.size + 0.01)
      assert(mixShareEn < rawShareEn,
        s"sqrt mixing did not flatten: en raw $rawShareEn -> sampled $mixShareEn")
    // determinism: same permutation every run
    val again = Curation.sampleMixture(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(real.toSeq == again.toSeq)
  }

  test("mixture backfill: quota sum hits the target exactly via largest remainder") {
    import spark.implicits._
    // 1000/500/100 — floor-only quotas lose 2 rows (198 of 200); the
    // two largest-remainder strata must each get one back
    val docs = (0 until 1000).map(i => (i.toLong, s"a $i", "aa")) ++
      (1000 until 1500).map(i => (i.toLong, s"b $i", "bb")) ++
      (1500 until 1600).map(i => (i.toLong, s"c $i", "cc"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_mix_bf").toString
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Curation.sampleMixture(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the contract: Σ quota = min(target, corpus) EXACTLY — here every
    // stratum exceeds its quota, so the drawn sample hits it too
    assert(out.length == Curation.MixtureTarget, s"sample size ${out.length}")
    // replicate the engine arithmetic step by step: dec-6 exact sum,
    // double shares, floor bases, largest-remainder ranks
    val ns = Map("aa" -> 1000, "bb" -> 500, "cc" -> 100)
    val s = ns.values.map(n => BigDecimal(math.sqrt(n))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xs = ns.map { case (l, n) => l -> Curation.MixtureTarget * math.sqrt(n) / s }
    val base = xs.map { case (l, x) => l -> math.floor(x).toLong }
    val d = (Curation.MixtureTarget - base.values.sum).toInt
    assert(d > 0, s"test corpus must exercise the backfill (deficit $d)")
    val byRemainder = xs.toSeq.sortBy { case (l, x) => (-(x - math.floor(x)), l) }.map(_._1)
    val quota = base ++ byRemainder.take(d).map(l => l -> (base(l) + 1L))
    val perLang = out.groupBy(_._1).map { case (l, rows) => l -> rows.length.toLong }
    assert(perLang == quota, s"per-stratum fills $perLang != backfilled quotas $quota")
  }

  test("stratified sample is deterministic and respects the per-stratum quota") {
    val s1 = Curation.sampleStratified(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val s2 = Curation.sampleStratified(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(s1.toSeq == s2.toSeq) // same permutation every run
    val perLang = s1.groupBy(_._1).map { case (l, rows) => l -> rows.length }
    assert(perLang.values.forall(_ <= Curation.SampleQuota))
    // sf0.001 has 100 docs per language — every stratum fills its quota
    assert(perLang.values.forall(_ == Curation.SampleQuota), perLang.toString)
  }

  test("corpus_drift: rates sum consistently and a planted skew term tops the ranking") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // entry over the real corpus: sane shape
    val rows = operators.Curation.corpusDrift(spark, dir).collect()
    assert(rows.length == 20)
    val drifts = rows.map(_.getDouble(3))
    assert(drifts.map(math.abs).sliding(2).forall(p => p.head >= p.last),
      "not ordered by |drift| desc")
    // constructed corpus: fresh slice floods one term — it must rank first
    val docs = ((0L to 8L).map(i => (i, "alpha beta gamma")) :+
      (10000L, "zzzflood zzzflood zzzflood zzzflood alpha")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_drift").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = operators.Curation.corpusDrift(spark, tmp).collect()
    assert(out.head.getString(0) == "zzzflood",
      s"planted flood term not ranked first: ${out.take(3).mkString(", ")}")
    assert(out.head.getLong(1) == 0L && out.head.getLong(2) == 4L)
    assert(out.head.getDouble(3) == 0.8, s"flood drift: ${out.head.getDouble(3)}")
  }

  test("tfidf_incremental equals the full recompute row-for-row") {
    val full = operators.Curation.tfidfTopTerms(spark, dir)
      .collect().map(_.toString).toSeq
    val inc = operators.Curation.tfidfIncremental(spark, dir)
      .collect().map(_.toString).toSeq
    assert(inc.nonEmpty)
    assert(inc == full)
  }

  test("tfidf: ubiquitous terms never outrank document-specific ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha common common"),
      (2L, "beta common"),
      (3L, "gamma common common")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_tfidf").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val top = Curation.tfidfTopTerms(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    // rank-1 term of every doc is its unique word, despite "common"
    // having the higher raw term frequency in docs 1 and 3
    val rank1 = top.filter(_._4 == 1L).map(t => t._1 -> t._2).toMap
    assert(rank1 == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"), top.mkString(", "))
  }

  test("decontamination flags exactly the corpus docs leaked into the benchmark slice") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // ids 0..8 are corpus, 9..10 the benchmark slice (split = 10*9/10 = 9).
    // Doc 2's text is copied into benchmark doc 9 (with a suffix) —
    // classic eval-set leakage; every other corpus doc is distinct
    // prose sharing no 16-char window with the benchmark.
    val leak = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (Seq(
      0L -> "completely unrelated first document with its own words",
      1L -> "another separate piece of text that stands alone here",
      2L -> leak,
      3L -> "yet more filler content that overlaps with nothing else",
      4L -> "spark catalyst plans optimize declarative queries nicely",
      5L -> "parquet files store columnar data with statistics pages",
      6L -> "shuffle exchanges partition rows across executor cores",
      7L -> "broadcast joins ship the small side to every task slot",
      8L -> "window functions rank rows within their partitions",
      9L -> (leak + " EVAL-SUFFIX"),
      10L -> "an uncontaminated benchmark question about other topics"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_decon").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Curation.textDecontaminate(spark, tmp).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L), s"flagged: ${out.mkString(", ")}")
    // the leaked doc is a strict prefix of its benchmark copy, so
    // every one of its shingles is contained: containment == 1.0
    assert(out.head.getAs[Double]("containment") == 1.0)
    assert(out.head.getAs[Long]("n_contaminated") == out.head.getAs[Long]("n_shingles"))
    // plan shape: the benchmark side broadcasts; no corpus-vs-corpus
    // join exists anywhere in the operator
    val plan = Curation.textDecontaminate(spark, tmp).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark side not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"corpus-sized join in the decontamination plan:\n$plan")
  }

  test("curate_pipeline composes its stages faithfully") {
    import org.apache.spark.sql.functions.{col, length => slen}
    val out = Curation.curatePipeline(spark, dir).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val ids = out.map(_._2).toSet
    val docs = Tables.documents(spark, dir)
    // 1. every emitted doc passes the quality gates (spot the length window)
    val lens = docs.filter(col("doc_id").isin(ids.toSeq: _*))
      .select(slen(col("text"))).collect().map(_.getInt(0))
    assert(lens.forall(l => l >= Curation.CurateMinChars && l <= Curation.CurateMaxChars))
    // 2. no two emitted docs share exact content
    val texts = docs.filter(col("doc_id").isin(ids.toSeq: _*))
      .select(col("text")).collect().map(_.getString(0))
    assert(texts.distinct.length == texts.length, "exact duplicates survived curation")
    // 3. no emitted doc is a non-root member of a near-dup cluster
    val nonRoots = Curation.dedupClusters(spark, dir)
      .filter(col("cluster_root") =!= col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(ids.intersect(nonRoots).isEmpty, "near-dup non-roots survived curation")
    // 4. per-language quota respected, ranks contiguous from 1
    out.groupBy(_._1).foreach { case (_, rows) =>
      val ranks = rows.map(_._3).sorted
      assert(ranks.length <= Curation.SampleQuota)
      assert(ranks.toSeq == (1L to ranks.length).toSeq)
    }
  }

  test("corpus_drift on a degenerate corpus (empty old side) yields finite drift, not NaN") {
    // a doc_id-0-only corpus makes the 90% split 0, so EVERY doc is
    // "fresh" and t_old = 0 — the zero-total guard (ADVICE r13) must
    // keep drift a number with a pinned ordering
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((0L, "solo words here")).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val tmp = java.nio.file.Files.createTempDirectory("drift0").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = operators.Curation.corpusDrift(spark, tmp).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val d = r.getAs[Double]("drift")
      assert(!d.isNaN && !d.isInfinite, s"drift must be finite, got $d")
    }
    // every term is fresh-only: drift = its fresh rate exactly
    assert(out.map(_.getAs[Double]("drift")).forall(_ > 0))
  }

  test("decontaminate_bloom emits exactly text_decontaminate's rows") {
    // the bloom is a prefilter only — false positives die in the
    // exact confirm join, false negatives cannot exist, so the two
    // entries must agree row-for-row
    val exact = Curation.textDecontaminate(spark, dir).collect().toSeq
    val bloom = Curation.decontaminateBloom(spark, dir).collect().toSeq
    assert(exact.nonEmpty && bloom == exact)
  }

  test("native bloomProbe column decides exactly like BloomFilter.mightContainLong") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // pin the codegen'd BloomFilterMightContain path to the driver-
    // side call the old UDF made, over members AND non-members
    val members = (0L until 500L).map(_ * 7919L)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(members.size, 0.01)
    members.foreach(bloom.putLong)
    val probes = (0L until 5000L).toDF("g")
    val gotHits = probes.filter(Curation.bloomProbe(bloom, col("g")))
      .as[Long].collect().toSet
    val wantHits = (0L until 5000L).filter(bloom.mightContainLong).toSet
    assert(gotHits == wantHits && members.filter(_ < 5000L).toSet.subsetOf(gotHits))
  }
}
