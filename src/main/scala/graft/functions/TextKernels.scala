package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels (same rationale as VectorOps: Spark's
  * `transform`/`array_distinct` route is CodegenFallback — the
  * shingling lambda interprets one substring at a time and then
  * hashes a 300-element object array per row; this kernel does the
  * slide + dedup in one Java loop over the UTF8String). */
object TextKernels {
  /** Distinct character n-gram shingles, first-occurrence order —
    * identical output to array_distinct(transform(sequence(...),
    * i -> substr(text, i, n))). Character-based, like SQL substr. */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]((len - n + 1) * 2)
    var i = 1
    while (i <= len - n + 1) {
      seen.add(s.substringSQL(i, n))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** Adjacent word bigrams over a single-space split — identical
    * output to `transform(sequence(1, size(ws) - 1), i ->
    * concat(element_at(ws, i), ' ', element_at(ws, i + 1)))` with
    * `ws = split(text, ' ')`: empty tokens from repeated spaces are
    * kept, exactly like Java split(-1) and DuckDB string_split.
    * Because adjacent tokens are separated by exactly one space,
    * each bigram is a contiguous byte range of the input (token i,
    * the space, token i+1) — emitted as a substring, no per-bigram
    * concat. A space byte (0x20) never occurs inside a UTF-8
    * multibyte sequence, so the byte scan is charset-safe. */
  def wordBigrams(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    var spaces = 0
    var i = 0
    while (i < n) { if (b(i) == ' ') spaces += 1; i += 1 }
    if (spaces == 0) return new GenericArrayData(Array.empty[Any])
    // token start offsets: 0 plus one past every space
    val starts = new Array[Int](spaces + 1)
    var t = 1
    i = 0
    while (i < n) { if (b(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    val out = new Array[Any](spaces) // tokens - 1 bigrams
    var j = 0
    while (j < spaces) {
      val st = starts(j)
      val en = if (j + 2 <= spaces) starts(j + 2) - 1 else n
      out(j) = UTF8String.fromBytes(b, st, en - st)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Per-POSITION polynomial rolling hash of every k-code-point
    * window — one long per position, NOT deduped (the substring-
    * duplication profile weighs each occurrence). Code points, not
    * bytes or UTF-16 chars, so the window count equals SQL
    * `length(text) - k + 1` (DuckDB substr/length semantics) on any
    * input. Rabin-Karp over mod-2^64 arithmetic with the FNV prime
    * as multiplier: h_{i+1} = (h_i - c_i * P^{k-1}) * P + c_{i+k},
    * O(n) per document regardless of k. The hash never needs
    * cross-engine parity — the oracle groups by the window STRING —
    * only distinctness up to 64-bit collisions, the same honest
    * bound as the shingle pipeline. */
  def windowHashes(s: UTF8String, k: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val P = 0x100000001b3L
    var pk = 1L // P^(k-1)
    var i = 1
    while (i < k) { pk *= P; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * P + cps(i); i += 1 }
    out(0) = h
    i = 1
    while (i <= n - k) {
      h = (h - cps(i - 1) * pk) * P + cps(i + k - 1)
      out(i) = h
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Remove every code point covered by a duplicated k-window: given
    * the SORTED 0-based window-start positions, merge the equal-
    * length intervals [p, p+k) in one pass and emit the complement
    * segments. O(|text| + |positions|) per document; code-point
    * indexing matches [[windowHashes]] and SQL substr. An empty
    * position list returns the input unchanged (same object — no
    * copy for the clean-document common case). */
  def stripDupWindows(s: UTF8String, positions: ArrayData, k: Int): UTF8String = {
    val m = positions.numElements()
    if (m == 0) return s
    val cps = s.toString.codePoints().toArray
    val out = new java.lang.StringBuilder(cps.length)
    var cur = 0 // next code point to keep
    var i = 0
    while (i < m) {
      val start = positions.getInt(i)
      var end = start + k
      i += 1
      while (i < m && positions.getInt(i) <= end) {
        val e2 = positions.getInt(i) + k
        if (e2 > end) end = e2
        i += 1
      }
      var j = cur
      while (j < start) { out.appendCodePoint(cps(j)); j += 1 }
      cur = end
    }
    var j = cur
    while (j < cps.length) { out.appendCodePoint(cps(j)); j += 1 }
    UTF8String.fromString(out.toString)
  }

  /** Stopword profiles shared by the text family (TextOps re-exports
    * this as `Profiles`): small, public, high-frequency function
    * words per language. The kernel below hardcodes their hit
    * semantics, so the data lives next to the code that must stay
    * in sync with it. */
  val StopProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich", "zu"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "you"),
    "es" -> Seq("el", "la", "los", "que", "en", "un", "es", "por", "con", "una"),
    "fr" -> Seq("le", "les", "et", "des", "en", "un", "est", "que", "pour", "dans"),
    "zh" -> Seq("的", "是", "在", "了", "不", "我", "有", "他", "这", "中"))

  private val asciiStopSets: Array[java.util.HashSet[String]] =
    StopProfiles.take(4).map { case (_, ws) =>
      val s = new java.util.HashSet[String](); ws.foreach(s.add); s
    }.toArray
  private val zhStopSet: java.util.HashSet[Integer] = {
    val s = new java.util.HashSet[Integer]()
    StopProfiles.last._2.foreach(w => s.add(w.codePointAt(0)))
    s
  }
  private val maxStopLen = StopProfiles.take(4).flatMap(_._2).map(_.length).max

  /** One code-point pass replacing the text family's stack of
    * `regexp_extract_all` counts (measured 3-19x slower than
    * DuckDB's RE2 once the bench stopped letting Catalyst prune
    * them). Semantics replicate the exact Java regexes the oracled
    * entries are DEFINED by — the DuckDB hash gate and a
    * kernel-vs-regex spec both pin the equivalence:
    *
    *   [0] n_ws       `\S+` matches (maximal non-\s runs; Java \s =
    *                  [ \t\n\x0B\f\r]. KNOWN ENGINE DIVERGENCE: the
    *                  DuckDB oracles run RE2, whose \s EXCLUDES
    *                  vertical tab \x0B — a corpus containing \x0B
    *                  would fail the hash gate on n_ws/n_punct/
    *                  n_nonspace. The testdata generator never emits
    *                  it (checked: 0 occurrences at every SF); if a
    *                  future corpus does, pick one \s definition and
    *                  pin BOTH engines to it — this is a corpus
    *                  property, not a kernel bug. ADVICE r12.)
    *   [1] n_bpe      `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` matches
    *                  (letter runs + digit runs + every other
    *                  non-space code point)
    *   [2] n_punct    `[^A-Za-z0-9\s]` matches
    *   [3] n_digit    `[0-9]` matches
    *   [4] n_nonspace code points with `\s` removed
    *   [5..8]         de/en/es/fr stopword hits: `(?i)\b(w1|..)\b` —
    *                  a match must span a whole boundary-word run,
    *                  so hits = maximal word runs whose ASCII-
    *                  lowercased text is in the profile. Java quirk,
    *                  caught by the parity spec ("éthe" has NO hit):
    *                  default \b classifies word chars as `'_' ||
    *                  Character.isLetterOrDigit` (UNICODE letters!)
    *                  even though \w stays ASCII — so runs are
    *                  unicode-letter-or-digit runs, and any
    *                  non-ASCII char in a run disqualifies it from
    *                  matching the ASCII profile words
    *   [9]            zh stopword hits: single-code-point
    *                  alternation, so per-code-point set membership
    */
  def textStats(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    val out = new Array[Long](10)
    var prevClass = 0 // 0 none/space/other, 1 letter run, 2 digit run
    var prevNonSpace = false
    var runStart = -1 // current \w run
    def endRun(st: Int, en: Int): Unit = {
      val len = en - st
      if (len <= maxStopLen) {
        var ok = true
        val sb = new java.lang.StringBuilder(len)
        var j = st
        while (j < en && ok) {
          val c = cps(j)
          if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
          else if (c >= 'a' && c <= 'z') sb.append(c.toChar)
          else ok = false // digits/underscore: no profile word matches
          j += 1
        }
        if (ok) {
          val w = sb.toString
          var l = 0
          while (l < 4) { if (asciiStopSets(l).contains(w)) out(5 + l) += 1; l += 1 }
        }
      }
    }
    var i = 0
    while (i < n) {
      val c = cps(i)
      val space = c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'
      val letter = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
      val digit = c >= '0' && c <= '9'
      if (!space) {
        out(4) += 1
        if (!prevNonSpace) out(0) += 1
        if (letter) { if (prevClass != 1) out(1) += 1; prevClass = 1 }
        else if (digit) { if (prevClass != 2) out(1) += 1; out(3) += 1; prevClass = 2 }
        else { out(1) += 1; out(2) += 1; prevClass = 0 }
      } else prevClass = 0
      prevNonSpace = !space
      val isW = c == '_' || Character.isLetterOrDigit(c)
      if (isW) { if (runStart < 0) runStart = i }
      else if (runStart >= 0) { endRun(runStart, i); runStart = -1 }
      if (zhStopSet.contains(c)) out(9) += 1
      i += 1
    }
    if (runStart >= 0) endRun(runStart, n)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** PII surface counts — hand automata for the three fixed
    * patterns, exactly replicating java.util.regex `find()` counts
    * (non-overlapping, leftmost, greedy; on a failed attempt the
    * scan advances one char). Honest benching showed the NFA stack
    * at 17x DuckDB's RE2 DFA; these loops are linear-ish passes.
    * Backtracking is deterministic for each pattern:
    *
    *   email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+`:
    *   the greedy local run cannot backtrack usefully ('@' is not in
    *   its class), and the greedy domain run backtracks exactly to
    *   the RIGHTMOST '.' inside the run that is followed by >= 2
    *   letters (T is letters-only and letters are domain chars, so
    *   the TLD run stays inside the domain run).
    *
    *   url `https?://[A-Za-z0-9./_%#?&=-]+`: literal prefix,
    *   optional 's', then a greedy class run with nothing after it.
    *
    *   phone `[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}`: fixed length 12,
    *   no quantifier backtracking.
    *
    * Layout: [n_emails, n_urls, n_phones]. Parity with the regexes
    * is spec-pinned (corpus + adversarial literals) and the oracle
    * keeps the regex definition. Positions are UTF-16 chars, same
    * as java.util.regex — the classes are all ASCII so surrogate
    * halves never match. */
  @inline private def piiLocalC(c: Char) =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '.' || c == '_' || c == '%' || c == '+' || c == '-'
  @inline private def piiDomC(c: Char) =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '.' || c == '-'
  @inline private def piiLetter(c: Char) = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  @inline private def piiDigit(c: Char) = c >= '0' && c <= '9'
  @inline private def piiUrlC(c: Char) =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '.' || c == '/' || c == '_' || c == '%' || c == '#' || c == '?' ||
      c == '&' || c == '=' || c == '-'

  /** End (exclusive) of an email match ANCHORED at i, or -1. One
    * attempt of the java.util.regex semantics: greedy local run,
    * '@', greedy domain run, then backtrack to the rightmost '.'
    * inside the run followed by >= 2 letters. */
  private def emailEnd(str: String, i: Int): Int = {
    val n = str.length
    var l = i
    while (l < n && piiLocalC(str.charAt(l))) l += 1
    if (l > i && l < n && str.charAt(l) == '@') {
      val a = l + 1
      var b = a
      while (b < n && piiDomC(str.charAt(b))) b += 1
      if (b > a) {
        var j = b - 1
        while (j > a) {
          if (str.charAt(j) == '.') {
            var t = j + 1
            while (t < n && piiLetter(str.charAt(t))) t += 1
            if (t - (j + 1) >= 2) return t
          }
          j -= 1
        }
      }
    }
    -1
  }

  /** End of a url match anchored at i, or -1: literal http, optional
    * 's', '://', then a non-empty greedy class run. */
  private def urlEnd(str: String, i: Int): Int = {
    val n = str.length
    if (str.charAt(i) == 'h' && i + 7 <= n && str.regionMatches(i, "http", 0, 4)) {
      var p = i + 4
      if (p < n && str.charAt(p) == 's') p += 1
      if (p + 3 <= n && str.charAt(p) == ':' && str.charAt(p + 1) == '/' &&
          str.charAt(p + 2) == '/') {
        var e = p + 3
        while (e < n && piiUrlC(str.charAt(e))) e += 1
        if (e > p + 3) return e
      }
    }
    -1
  }

  /** End of a phone match anchored at i, or -1: fixed length 12,
    * digits with '-'/'.' at positions 3 and 7 — no backtracking. */
  private def phoneEnd(str: String, i: Int): Int = {
    if (i + 12 > str.length) return -1
    var k = 0
    while (k < 12) {
      val c = str.charAt(i + k)
      val ok = k match {
        case 3 | 7 => c == '-' || c == '.'
        case _ => piiDigit(c)
      }
      if (!ok) return -1
      k += 1
    }
    i + 12
  }

  def piiCounts(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val out = new Array[Long](3)
    var i = 0
    while (i < n) {
      val e = emailEnd(str, i); if (e > i) { out(0) += 1; i = e } else i += 1
    }
    i = 0
    while (i < n) {
      val e = urlEnd(str, i); if (e > i) { out(1) += 1; i = e } else i += 1
    }
    i = 0
    while (i < n) {
      val e = phoneEnd(str, i); if (e > i) { out(2) += 1; i = e } else i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** One find()-and-replace pass for pattern `p` (0 email, 1 url,
    * 2 phone) — exactly `str.replaceAll(pattern, token)`: each
    * anchored match replaced by the token, failed attempts copy one
    * char. Returns `str` itself (no allocation) when nothing
    * matches — the overwhelmingly common row. */
  private def redactPass(str: String, p: Int, token: String): String = {
    val n = str.length
    @inline def matchEnd(i: Int): Int = p match {
      case 0 => emailEnd(str, i)
      case 1 => urlEnd(str, i)
      case _ => phoneEnd(str, i)
    }
    var i = 0
    while (i < n && matchEnd(i) <= i) i += 1
    if (i >= n) return str
    val sb = new java.lang.StringBuilder(n)
    sb.append(str, 0, i)
    while (i < n) {
      val e = matchEnd(i)
      if (e > i) { sb.append(token); i = e }
      else { sb.append(str.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** PII redaction — the rewrite stage over [[piiCounts]]' anchored
    * automata: three chained passes (email → url → phone), each the
    * exact java `replaceAll` of its defining regex, composing like
    * the nested regexp_replace oracle (later passes scan earlier
    * passes' output, in BOTH engines — the category tokens contain
    * no '@', '://', or digits, so they cannot seed new matches, but
    * chaining keeps the engines mirrored regardless). */
  def piiRedact(s: UTF8String): UTF8String = {
    var str = s.toString
    str = redactPass(str, 0, "[EMAIL]")
    str = redactPass(str, 1, "[URL]")
    str = redactPass(str, 2, "[PHONE]")
    UTF8String.fromString(str)
  }

  /** The BPE family's text normalization as one pass — exactly
    * `lower(regexp_replace(text, "[^A-Za-z0-9]+", " "))`: every run
    * of non-ASCII-alnum code points collapses to ONE space (leading/
    * trailing runs included), then ASCII lowering. Because the
    * replace runs FIRST, the survivors are pure [A-Za-z0-9] and the
    * lower() is plain +32 — no unicode case-mapping edge exists by
    * construction. The regex form benched as the dominant cost of
    * text_tokens_bpe at sf10 (a Java-regex replace over the whole
    * corpus); parity is spec-pinned. */
  def bpeClean(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var inRun = false
    var i = 0
    while (i < n) {
      val c = str.charAt(i) // chars, not code points: non-BMP units are non-alnum either way
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') { sb.append(c); inRun = false }
      else if (c >= 'A' && c <= 'Z') { sb.append((c + 32).toChar); inRun = false }
      else { if (!inRun) sb.append(' '); inRun = true }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Count of merged duplicated spans over the same sorted-position
    * interval merge as [[stripDupWindows]]. */
  def dupSpanCount(positions: ArrayData, k: Int): Int = {
    val m = positions.numElements()
    if (m == 0) return 0
    var spans = 0
    var i = 0
    while (i < m) {
      var end = positions.getInt(i) + k
      i += 1
      while (i < m && positions.getInt(i) <= end) {
        val e2 = positions.getInt(i) + k
        if (e2 > end) end = e2
        i += 1
      }
      spans += 1
    }
    spans
  }
}

/** Analysis-time string-input check shared by the text kernels —
  * a `StringType` pattern (not equality) so non-default-collation
  * string columns under Spark 4 collations are accepted too. */
trait StringInputCheck { self: UnaryExpression =>
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got $other")
    }
}

/** `graft_shingles(string, n) → array<string>` — n fixed at plan
  * time (a foldable argument in the SQL form). */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression with StringInputCheck {
  require(n > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

/** `graft_word_bigrams(string) → array<string>` — the hot projection
  * of text_ngram_freq as one Java loop (the transform/element_at SQL
  * form re-evaluates the `split` inside the per-element lambda after
  * Catalyst's projection collapse — the same trap documented on the
  * MinHash signatures, Dedup.scala). */
case class WordBigramsExpr(child: Expression) extends UnaryExpression with StringInputCheck {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.wordBigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wordBigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): WordBigramsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_word_bigrams"
}

/** `graft_window_hashes(string, k) → array<long>` — k fixed at plan
  * time (a foldable argument in the SQL form). */
case class WindowHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with StringInputCheck {
  require(k > 0, "window size must be positive")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.windowHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.windowHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashesExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_window_hashes"
}

/** `graft_text_stats(string) → array<long>` — the fused text-family
  * counts; see [[TextKernels.textStats]] for the layout. */
case class TextStatsExpr(child: Expression) extends UnaryExpression with StringInputCheck {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.textStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.textStats($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_text_stats"
}

/** `graft_pii_counts(string) → array<long>` — [emails, urls,
  * phones]; see [[TextKernels.piiCounts]]. */
case class PiiCountsExpr(child: Expression) extends UnaryExpression with StringInputCheck {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.piiCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.piiCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiCountsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_pii_counts"
}

/** `graft_pii_redact(string) → string` — category-token redaction of
  * the three PII patterns; see [[TextKernels.piiRedact]]. */
case class PiiRedactExpr(child: Expression) extends UnaryExpression with StringInputCheck {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextKernels.piiRedact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.piiRedact($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiRedactExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_pii_redact"
}

/** `graft_bpe_clean(string) → string` — see [[TextKernels.bpeClean]]. */
case class BpeCleanExpr(child: Expression) extends UnaryExpression with StringInputCheck {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeClean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.bpeClean($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeCleanExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_clean"
}

/** `graft_strip_dup_windows(text, sorted_positions, k) → string` —
  * the cleaned document; k fixed at plan time. */
case class StripDupWindowsExpr(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(k > 0, "window size must be positive")
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, array<int>), got $other")
    }

  override def nullSafeEval(text: Any, positions: Any): Any =
    TextKernels.stripDupWindows(text.asInstanceOf[UTF8String], positions.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) => s"graft.functions.TextKernels.stripDupWindows($t, $p, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StripDupWindowsExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_strip_dup_windows"
}

/** `graft_dup_span_count(sorted_positions, k) → int` — merged
  * duplicated-span count; k fixed at plan time. */
case class DupSpanCountExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "window size must be positive")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<int>, got $other")
    }

  override def nullSafeEval(positions: Any): Any =
    TextKernels.dupSpanCount(positions.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.TextKernels.dupSpanCount($p, $k)")

  override protected def withNewChildInternal(newChild: Expression): DupSpanCountExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_dup_span_count"
}
