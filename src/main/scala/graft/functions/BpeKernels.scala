package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization against a FIXED rank-ordered
  * merges table (trained once per corpus version and persisted —
  * see operators.Bpe). The operator's semantics are defined by the
  * SEQUENTIAL-replace form the DuckDB oracle executes: encode each
  * word as boundary-flanked single-char symbols (`_c_` per char,
  * symbols abutting as `__`), then for each merge rule (l, r) in
  * rank order replace every `_l__r_` with `_lr_`, left-to-right
  * non-overlapping — Sennrich et al. 2016's apply-merges-in-order
  * regime, which equals the min-rank priority loop for any properly
  * learned merge list (a rule can only reference symbols produced by
  * EARLIER rules, so applying in rank order never misses a lower-rank
  * opportunity). This kernel computes the same thing as one Java
  * loop per word on symbol arrays: no string churn, no M full-string
  * scans — and memoizes per-word token counts per thread, so a
  * Zipf-distributed corpus tokenizes in ~O(chars) with the merge
  * loop paid once per DISTINCT word.
  *
  * Input contract: the string is CLEANED — lowercased with every
  * non-alphanumeric run collapsed to a single space (the shared
  * normalization Column in operators.Bpe). Cleaning stays outside
  * the kernel so both engines derive words from the identical
  * codegen'd/SQL regexp, and the kernel's word split is a trivial
  * space scan.
  */
final class BpeCodec(val pairs: Array[String]) extends Serializable {
  require(pairs.length % 2 == 0, "pairs must be (lhs, rhs) flattened")

  // per-thread memo: distinct-word count is vocabulary-bounded and
  // tiny next to the corpus; the cap guards pathological corpora
  // (every word unique) from unbounded executor memory.
  @transient private lazy val memo: ThreadLocal[java.util.HashMap[String, Integer]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Integer]())
  private val MemoCap = 1 << 16

  /** Total BPE token count of a cleaned string: Σ over its
    * space-separated words of the word's post-merge symbol count. */
  def tokenCount(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var count = 0L
    var ws = 0
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        if (i > ws) count += wordTokens(str.substring(ws, i))
        ws = i + 1
      }
      i += 1
    }
    count
  }

  private def wordTokens(w: String): Int = {
    val m = memo.get()
    val hit = m.get(w)
    if (hit != null) return hit.intValue()
    val c = encodeCount(w)
    if (m.size < MemoCap) m.put(w, Integer.valueOf(c))
    c
  }

  /** Symbol count after applying every merge rule in rank order,
    * each left-to-right non-overlapping over the ORIGINAL symbol
    * positions of that pass — exactly the semantics of one literal
    * string replace() per rule (a replacement is never rescanned
    * within its own pass, matching Java and DuckDB replace). */
  private def encodeCount(w: String): Int = {
    var len = w.length
    if (len <= 1) return len
    val syms = new Array[String](len)
    var k = 0
    while (k < len) { syms(k) = String.valueOf(w.charAt(k)); k += 1 }
    var p = 0
    while (p < pairs.length && len > 1) {
      val l = pairs(p)
      val r = pairs(p + 1)
      var wr = 0
      var rd = 0
      while (rd < len) {
        if (rd + 1 < len && syms(rd).equals(l) && syms(rd + 1).equals(r)) {
          syms(wr) = l + r
          rd += 2
        } else {
          syms(wr) = syms(rd)
          rd += 1
        }
        wr += 1
      }
      len = wr
      p += 2
    }
    len
  }
}

/** `graft_bpe_count(cleaned) → long` — BPE token count under the
  * codec's merges. The codec is a plan-time constant bound per call
  * directly into the expression tree (the PpjoinPrefixExpr pattern:
  * no session-global registration, so concurrent calls against
  * different corpora/merge versions cannot cross-talk); it ships
  * with the task binary and is probed in-loop from generated code. */
case class BpeTokenCountExpr(child: Expression, codec: BpeCodec)
    extends UnaryExpression with StringInputCheck {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    codec.tokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBpeCodec", codec, classOf[BpeCodec].getName)
    defineCodeGen(ctx, ev, c => s"$ref.tokenCount($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCountExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_count"
}
