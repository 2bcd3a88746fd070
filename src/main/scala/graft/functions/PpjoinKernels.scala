package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** PPJoin prefix extraction as a per-document kernel.
  *
  * The round-2 prefix construction ranked the EXPLODED shingle
  * relation by global rarity: a corpus-wide shuffle+sort by shingle
  * hash (for the frequency) and a second by doc_id (for the rank) —
  * two full shuffles of the largest relation in the pipeline. Here
  * global rarity comes from a count-min sketch (one bounded-size
  * aggregate, broadcast to every task regardless of corpus size),
  * and each document sorts its own shingles locally — prefix
  * construction does ZERO corpus-wide shuffles.
  *
  * Correctness: the PPJoin prefix filter is complete under ANY
  * globally consistent shingle order. Every document consults the
  * SAME sketch, so (estimate, hash) is consistent; CMS overestimates
  * only blur the order among rare shingles (slightly less optimal
  * prefixes, never lost pairs) while reliably pushing the heavy
  * hitters — the candidate-blowup killers — out of the prefixes.
  */
object PpjoinKernels {
  /** Same value as Spark's `xxhash64(string)` (seed 42), so hashed
    * shingle identities agree with any xxhash64-derived relation. */
  def hash(s: org.apache.spark.unsafe.types.UTF8String): Long =
    XXH64.hashUTF8String(s, 42L)

  /** Distinct character n-gram shingles as 64-bit hashes — the
    * shingling and hashing of TextKernels.shingles + xxhash64 fused
    * into one loop, with no string materialization. Distinctness is
    * BY HASH: results are exact up to 64-bit xxhash collisions.
    * (An unshared-element collision merges elements and can only
    * raise hash-set Jaccard — harmless, verification rescored the
    * pair on real strings. A collision between two SHARED shingles
    * can LOWER it and in principle prune a true pair before
    * verification; at 64 bits over millions of shingles the
    * probability is ~1e-7 per corpus — the standard hashed-signature
    * trade, stated here honestly rather than claimed away.) */
  def hashShingles(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[java.lang.Long]((len - n + 1) * 2)
    var i = 1
    while (i <= len - n + 1) {
      seen.add(hash(s.substringSQL(i, n)))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** 64-perm MinHash signature of one hashed-shingle array, with
    * Spark's exact `xxhash64(gh, k)` semantics: the multi-argument
    * hash chains child hashes as seeds — hashInt(k, hashLong(gh,
    * 42)) — so each shingle's first-stage hashLong is computed ONCE
    * and reused across all `perms` permutations (the aggregate form
    * re-hashes gh from scratch 64x per shingle; this loop pays 1
    * hashLong + perms hashInt). Values are IDENTICAL to
    * min(xxhash64(gh, k)) by construction — pinned by the
    * per-row-equals-aggregate spec. Empty input yields an empty
    * array (the aggregate form has no row at all — callers filter
    * empty shingle sets before either path). */
  def minhashSig(ghs: ArrayData, perms: Int): ArrayData = {
    val n = ghs.numElements()
    val mins = new Array[Long](perms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h1 = XXH64.hashLong(ghs.getLong(i), 42L)
      var k = 0
      while (k < perms) {
        val h = XXH64.hashInt(k, h1)
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    if (n == 0) new GenericArrayData(Array.empty[Any])
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** First L entries of the doc's hashed shingles in (approx global
    * freq, hash) order, L = n - ceil(t*n) + 1, as struct(gh, rn)
    * rows. The 1e-9 slack under the ceil keeps double rounding from
    * shrinking L at exact-integer products (a larger prefix only
    * admits extra candidates — safe). */
  def prefix(ghs: ArrayData, sketch: CountMinSketch, t: Double): ArrayData = {
    val n = ghs.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val l = n - math.ceil(t * n - 1e-9).toInt + 1
    if (l <= 0) return new GenericArrayData(Array.empty[Any])
    val keyed = new Array[(Long, Long)](n) // (estimate, hash)
    var i = 0
    while (i < n) {
      val h = ghs.getLong(i)
      keyed(i) = (sketch.estimateCount(java.lang.Long.valueOf(h)), h)
      i += 1
    }
    java.util.Arrays.sort(keyed, implicitly[Ordering[(Long, Long)]])
    val take = math.min(l, n)
    val out = new Array[Any](take)
    var r = 0
    while (r < take) {
      out(r) = InternalRow(keyed(r)._2, r + 1)
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_hash_shingles(string, n) → array<long>` — distinct hashed
  * shingles in one kernel pass; the ngram-Jaccard candidate side
  * never materializes shingle strings. */
case class HashShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with StringInputCheck {
  require(n > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PpjoinKernels.hashShingles(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PpjoinKernels.hashShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): HashShinglesExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_hash_shingles"
}

/** PPJoin prefix extraction: `array<long> → array<struct<gh, rn>>` —
  * the sketch and threshold are plan-time constants, bound per call
  * directly into the expression tree (ExpressionUtils.column), so
  * concurrent calls with different sketches cannot cross-talk. */
case class PpjoinPrefixExpr(child: Expression, sketch: CountMinSketch, t: Double)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("gh", LongType, nullable = false),
      StructField("rn", IntegerType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ppjoin_prefix requires an array<long> argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    PpjoinKernels.prefix(input.asInstanceOf[ArrayData], sketch, t)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the sketch ships with the task binary (CountMinSketchImpl is
    // Serializable); one deserialized instance per executor, probed
    // in-loop — no per-row setup
    val sketchRef = ctx.addReferenceObj("graftPpjoinSketch", sketch,
      classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.PpjoinKernels.prefix($c, $sketchRef, $t)")
  }

  override protected def withNewChildInternal(newChild: Expression): PpjoinPrefixExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_ppjoin_prefix"
}

/** `graft_minhash_sig(array<long>) → array<long>` — the 64-perm
  * MinHash signature as one per-row kernel (see
  * [[PpjoinKernels.minhashSig]]). Used by the streaming document
  * gate (per-row, no aggregation state) and by the batch sketch
  * builders (computed directly on the shared shingle-array relation
  * — no explode and no 64-aggregate shuffle). */
case class MinhashSigExpr(child: Expression, perms: Int)
    extends UnaryExpression {
  require(perms > 0, "perms must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires an array<long> argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    PpjoinKernels.minhashSig(input.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PpjoinKernels.minhashSig($c, $perms)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}
