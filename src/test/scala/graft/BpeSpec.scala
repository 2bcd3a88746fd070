package graft

import graft.functions.BpeCodec
import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def codecOf(merges: Seq[(String, String)]): BpeCodec =
    new BpeCodec(merges.flatMap { case (l, r) => Seq(l, r) }.toArray)

  test("trainMerges learns the hand-checkable sequence and tie-breaks deterministically") {
    // vocab {aaab: 2}: pair counts round 1 — (a,a) weighted 2 at two
    // positions = 4, (a,b) = 2 → merge (a,a) → [aa, a, b].
    // round 2 — (aa,a) = 2, (a,b) = 2: tie broken lexicographically
    // on (lhs, rhs) ascending → ("a","b") < ("aa","a") → merge (a,b)
    // → [aa, ab]. round 3 — (aa,ab) = 2 → merge. round 4 — no pairs.
    val merges = Bpe.trainMerges(Seq(("aaab", 2L)), 10)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))

    // MinPairCount: a pair seen once is never learned
    assert(Bpe.trainMerges(Seq(("xy", 1L)), 10).isEmpty)
  }

  test("codec encodes known words under hand merges (sequential-replace semantics)") {
    val c = codecOf(Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    def n(s: String) = c.tokenCount(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    assert(n("aaab") == 1)       // a a a b → aa a b → aa ab → aaab
    assert(n("aab") == 2)        // a a b → aa b; (a,b) no longer adjacent
    assert(n("aaa") == 2)        // left-to-right non-overlap: aa, a
    assert(n("aaaa") == 2)       // a a a a → aa aa; no (aa,aa) rule
    assert(n("b") == 1)
    assert(n("") == 0)
    assert(n("aaab aab b") == 4) // per-word, space-separated
  }

  test("codec equals the replace-chain reference form on the real corpus") {
    val docs = Tables.documents(spark, dir)
    val merges = Bpe.bpeMergesTable(spark, dir).orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty, "training should learn merges on the real corpus")
    val codec = codecOf(merges)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val kernel = ColumnBridge.column(graft.functions.BpeTokenCountExpr(
      ColumnBridge.expression(col("c")), codec))
    val both = docs.select(col("doc_id"), Bpe.cleanedCol(col("text")).as("c"))
      .select(col("doc_id"), kernel.as("k"),
        Bpe.replaceChainCount(col("c"), merges).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"doc ${r.getLong(0)}: kernel ${r.getLong(1)} != replace-chain ${r.getLong(2)}"))
  }

  test("entry emits consistent counts and BPE compresses below char tokenization") {
    val out = operators.Bpe.textTokensBpe(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nWords, nAlnum, nTokens) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nWords > 0)
      // every word is ≥1 token and ≤ its char count
      assert(nTokens >= nWords, s"doc ${r.getLong(0)}: fewer tokens than words")
      assert(nTokens <= nAlnum, s"doc ${r.getLong(0)}: more tokens than chars")
    }
    // learned merges must actually compress on the corpus they came from
    val avgCpt = out.map(_.getDouble(4)).sum / out.length
    assert(avgCpt > 1.5, s"mean chars-per-token $avgCpt — merges are not compressing")
  }

  test("graft_bpe_clean equals the defining regex normalization byte-for-byte") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // corpus rows plus run-collapse / boundary / unicode edges: the
    // replace runs BEFORE lower, so É and 日 are just non-alnum runs
    val edge = Seq("", "   ", "!!!", "a", "A!B", "!!ABC??def##", "É é mixed",
      "日本語 TEXT 42", "tabs\tand\nnewlines", "a1B2c3", "--leading and trailing--")
      .toDF("text")
    val all = Tables.documents(spark, dir).select(col("text")).unionByName(edge)
    val bad = all.filter(
      operators.Bpe.cleanedCol(col("text")) =!=
        operators.Bpe.cleanedColRegex(col("text"))).count()
    assert(bad == 0, s"$bad rows where the clean kernel diverges from the regex")
  }
}
