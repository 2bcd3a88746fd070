package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** GROUPED pair-enumeration kernels (round 17) — the fix for the
  * one plan shape that did not survive the sf100 decade: a bucketed
  * near-dup self-join whose candidate volume is Σ m_c² over bucket
  * sizes m_c. As an equi JOIN, every candidate becomes a physical
  * row — at 2M vectors × 4-way IVF assignment that is ~2×10¹⁰ rows
  * of ~1 KB (vectors ride through the join), and the SMJ sort died
  * with SPILL_OUT_OF_MEMORY at 32 g; the simhash band join survived
  * but spent 12 minutes, most of it shuffling and distinct-ing a
  * candidate relation that the hamming filter then threw away.
  *
  * The grouped form never materializes a candidate: collect each
  * bucket's members into ONE array row (`groupBy(key) +
  * collect_list(struct(...))` — one exchange of the corpus relation,
  * the same volume as ONE side of the old join), then a native
  * kernel loops i<j INSIDE the row and emits only the pairs that
  * pass the threshold — the near-dup-sized output. The quadratic
  * term survives as loop ITERATIONS (cache-resident, ~ns each), not
  * as rows (~µs each through shuffle/sort/dedup machinery).
  *
  * Exactness: the loops reproduce the join forms' arithmetic
  * bit-for-bit (same [[VectorOps.dot]] left-to-right accumulation,
  * same (na*nb) divide, same HALF_UP rounding as Spark's `round`;
  * same xor/popcount as `bit_count`), and the per-bucket i<j
  * enumeration emits exactly the join's `a < b` pair set per bucket
  * — spec-pinned equal to the join forms on real corpora.
  *
  * Scale note: one bucket's pair loop runs in one task. Buckets are
  * size-bounded by construction (IVF cell ≈ n·P/k members; a 16-bit
  * band value's collision set), so per-task memory is the member
  * array (~0.5-3 MB); a pathologically hot simhash band value still
  * serializes its own m² popcounts — at ~1 ns each that outlasts
  * nothing until m reaches millions, at which point block-pair
  * salting (the skew-join pattern) is the next step. */
object PairKernels {

  /** Spark's `round(x, 6)` for DoubleType: HALF_UP on the decimal
    * string representation (java BigDecimal.valueOf). ONE definition
    * so the kernel and any future caller cannot drift from the SQL
    * function the join forms used. */
  def round6(x: Double): Double =
    // Spark's RoundBase passes NaN/Infinity through unchanged
    // (BigDecimal.valueOf would throw on them)
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** All i<j pairs of `ms` = array<struct<id:long, v:array<double>,
    * nrm:double>> with cosine >= threshold, emitted as
    * (vec_a, vec_b, round(cos, 6)) with vec_a < vec_b. */
  def cellPairs(ms: ArrayData, threshold: Double): ArrayData = {
    val n = ms.numElements()
    val ids = new Array[Long](n)
    val vs = new Array[ArrayData](n)
    val nrm = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = ms.getStruct(i, 3)
      ids(i) = r.getLong(0)
      vs(i) = r.getArray(1)
      nrm(i) = r.getDouble(2)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var a = 0
    while (a < n) {
      var b = a + 1
      while (b < n) {
        // dot and (na*nb) are bit-commutative, so enumeration order
        // cannot change the value the join form computed
        val cos = VectorOps.dot(vs(a), vs(b)) / (nrm(a) * nrm(b))
        // NaN contract (zero-norm vector -> 0/0): match the pinned
        // join form exactly — Spark SQL `>=` orders NaN above every
        // value, so NaN passes the threshold there; Java `>=` is
        // false for NaN and would silently drop those pairs
        if ((cos >= threshold || cos.isNaN) && ids(a) != ids(b)) {
          val (x, y) = if (ids(a) < ids(b)) (a, b) else (b, a)
          out += new GenericInternalRow(Array[Any](ids(x), ids(y), round6(cos)))
        }
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** STREAMING iterator over the qualifying pairs of one block pair:
    * `sameBlock` enumerates the triangle of `ma` (ignoring `mb`);
    * otherwise the full bipartite ma × mb. Emitted LAZILY — the
    * first blocked form buffered each task's survivors in an array
    * and a band value whose signature space saturates (this
    * synthetic corpus at sf100) emitted tens of millions of pairs
    * per DENSE block, OOM-ing 32 concurrent tasks' buffers; the
    * iterator keeps per-task memory at the two member arrays
    * regardless of output density, and downstream operators
    * (distinct's partial aggregate) spill properly. */
  def simhashPairsIter(ma: ArrayData, mb: ArrayData, sameBlock: Boolean,
                       maxHamming: Int): Iterator[InternalRow] = {
    val n = ma.numElements()
    val ids = new Array[Long](n)
    val sims = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = ma.getStruct(i, 2)
      ids(i) = r.getLong(0)
      sims(i) = r.getLong(1)
      i += 1
    }
    val m = if (sameBlock) n else mb.numElements()
    val idsB = if (sameBlock) ids else new Array[Long](m)
    val simsB = if (sameBlock) sims else new Array[Long](m)
    if (!sameBlock) {
      var j = 0
      while (j < m) {
        val r = mb.getStruct(j, 2)
        idsB(j) = r.getLong(0)
        simsB(j) = r.getLong(1)
        j += 1
      }
    }
    new Iterator[InternalRow] {
      private var a = 0
      private var b = if (sameBlock) 1 else 0
      private var ham = 0
      private var ready = false

      private def advance(): Unit = {
        while (!ready && a < n) {
          while (!ready && b < m) {
            val h = java.lang.Long.bitCount(sims(a) ^ simsB(b))
            if (h <= maxHamming && ids(a) != idsB(b)) { ham = h; ready = true }
            else b += 1
          }
          if (!ready) { a += 1; b = if (sameBlock) a + 1 else 0 }
        }
      }

      override def hasNext: Boolean = { advance(); ready }

      override def next(): InternalRow = {
        advance()
        if (!ready) throw new NoSuchElementException
        val x = ids(a); val y = idsB(b)
        val row = new GenericInternalRow(3)
        if (x < y) { row.setLong(0, x); row.setLong(1, y) }
        else { row.setLong(0, y); row.setLong(1, x) }
        row.setInt(2, ham)
        ready = false
        b += 1
        row
      }
    }
  }
}

/** `graft_cell_pairs(array<struct<id,v,nrm>>) → array<struct<vec_a,
  * vec_b, cosine>>` — threshold fixed at plan time. */
case class CellPairsExpr(child: Expression, threshold: Double) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_a", LongType, nullable = false),
    StructField("vec_b", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(DoubleType, _), _, _),
        StructField(_, DoubleType, _, _))), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cell_pairs requires array<struct<long, array<double>, double>>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    PairKernels.cellPairs(input.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PairKernels.cellPairs($c, $threshold)")

  override protected def withNewChildInternal(newChild: Expression): CellPairsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_cell_pairs"
}

/** `graft_simhash_pairs(ma, mb, same_block)` over
  * array<struct<doc_id,sim>> blocks → array<struct<doc_a, doc_b,
  * hamming>> — max hamming fixed at plan time; triangle of `ma` when
  * `same_block`, full bipartite otherwise. */
/** `graft_simhash_pairs(ma, mb, same_block)` as a GENERATOR — the
  * streaming twin of explode(kernel(...)): rows are yielded lazily
  * from [[PairKernels.simhashPairsIter]], so a dense block's output
  * never buffers in task memory (the saturation lesson above).
  * CodegenFallback is deliberate: the per-ROW overhead of the
  * interpreted Generate is amortized over the in-iterator loop that
  * does the real work. */
case class SimhashPairsGen(first: Expression, second: Expression, third: Expression,
                           maxHamming: Int)
    extends org.apache.spark.sql.catalyst.expressions.Expression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(first, second, third)

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("hamming", IntegerType, nullable = false)))

  private def isMembers(t: DataType): Boolean = t match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, LongType, _, _))), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isMembers(first.dataType) && isMembers(second.dataType) &&
        third.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_pairs requires (array<struct<long, long>>, same, boolean), " +
        s"got (${first.dataType}, ${second.dataType}, ${third.dataType})")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val ma = first.eval(input).asInstanceOf[ArrayData]
    val mb = second.eval(input).asInstanceOf[ArrayData]
    val same = third.eval(input).asInstanceOf[Boolean]
    if (ma == null || mb == null) Iterator.empty
    else PairKernels.simhashPairsIter(ma, mb, same, maxHamming)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimhashPairsGen =
    copy(first = newChildren(0), second = newChildren(1), third = newChildren(2))

  override def prettyName: String = "graft_simhash_pairs"
}
