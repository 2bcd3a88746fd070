package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd vector kernels over `array<double>`.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) are
  * CodegenFallback — every element bounces through an interpreted
  * lambda with variable binding. For the similarity operators that
  * is THE hot loop (millions of pairs x 64 dims), so these kernels
  * generate a plain Java loop instead: measured ~10x on the
  * brute-force pair join.
  *
  * Both accumulate LEFT-TO-RIGHT in double, the exact IEEE op
  * sequence of the fold-based SQL form and of DuckDB's list_reduce —
  * results are bit-identical, so the DuckDB oracles keep matching.
  */
object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc += d * d; i += 1 }
    acc
  }

  /** [[sqDist]] against a plain double array (a bound centroid row)
    * — the identical left-to-right IEEE op sequence, so distances
    * equal the ArrayData form bit-for-bit. */
  def sqDistArr(a: ArrayData, b: Array[Double]): Double = {
    val n = math.min(a.numElements(), b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  /** The P nearest centroids of `v` by (dist, cid) lexicographic
    * order — ONE in-row loop over the bound centroid matrix,
    * replacing P chained min-struct aggregation rounds that each
    * streamed corpus × k rows CARRYING THE VECTOR through an
    * object-hash aggregate (whose sort-based fallback died with
    * SPILL_OUT_OF_MEMORY at sf100's 2.8B-row × 560 B input). Tie
    * rule identical to min(struct(dist, cid))): smaller dist wins,
    * then smaller cid. Returns the cids nearest-first — the same
    * order the chained rounds appended. */
  def topCells(v: ArrayData, cids: Array[Int], cents: Array[Array[Double]], p: Int): ArrayData = {
    val k = cents.length
    val keep = math.min(p, k)
    val bd = Array.fill(keep)(Double.PositiveInfinity)
    val bc = Array.fill(keep)(Int.MaxValue)
    var c = 0
    while (c < k) {
      val d = sqDistArr(v, cents(c))
      val cid = cids(c)
      // insertion into the tiny (p <= 4ish) sorted buffer
      var i = keep - 1
      if (d < bd(i) || (d == bd(i) && cid < bc(i))) {
        while (i > 0 && (d < bd(i - 1) || (d == bd(i - 1) && cid < bc(i - 1)))) {
          bd(i) = bd(i - 1); bc(i) = bc(i - 1); i -= 1
        }
        bd(i) = d; bc(i) = cid
      }
      c += 1
    }
    new GenericArrayData(bc.map(x => x: Any))
  }

  /** Rademacher sign of plane j at dimension d: low bit of
    * xxhash64(j, d), where Spark's two-arg xxhash64 over ints is
    * XXH64.hashInt(d, XXH64.hashInt(j, 42L)). THE one definition of
    * the plane derivation — the kernel's cached matrix and the
    * DuckDB oracle generator's embedded literals both come from
    * here, so they cannot desync. */
  def planeSign(j: Int, d: Int): Double =
    if ((XXH64.hashInt(d, XXH64.hashInt(j, 42L)) & 1L) == 1L) 1.0 else -1.0

  // grow-only cache of the ±1.0 plane matrix, indexed [j][d]. Plane
  // signs are a pure function of (j, d), so concurrent re-derivation
  // is harmless (identical replacement); volatile publish suffices.
  @volatile private var signCache: Array[Array[Double]] = Array.empty

  /** The sign matrix covering at least (nbits x dims), cached — the
    * round-7 replacement for hashing inside the per-vector loop
    * (16 x 64 XXH64 calls per corpus row, measured as the bulk of
    * signature cost; the cached multiply is pure FP work). */
  def planeSignMatrix(nbits: Int, dims: Int): Array[Array[Double]] = {
    val cur = signCache
    if (cur.length >= nbits && (nbits == 0 || cur(0).length >= dims)) cur
    else {
      val grown = Array.tabulate(math.max(nbits, cur.length))(j =>
        Array.tabulate(math.max(dims, if (cur.isEmpty) 0 else cur(0).length))(d => planeSign(j, d)))
      signCache = grown
      grown
    }
  }

  /** Sign signature against `nbits` Rademacher hyperplanes (see
    * [[planeSign]] for the weight derivation). The per-plane dot
    * accumulates left-to-right in double — the same IEEE op sequence
    * as the aggregate(zip_with(...)) fold this kernel replaces (and
    * as the oracle's list_reduce), so signatures and LSH buckets are
    * bit-identical across all three forms. */
  def lshSign(v: ArrayData, nbits: Int): ArrayData = {
    val n = v.numElements()
    val m = planeSignMatrix(nbits, n)
    val out = new Array[Any](nbits)
    var j = 0
    while (j < nbits) {
      val row = m(j)
      var acc = 0.0
      var d = 0
      while (d < n) {
        acc += v.getDouble(d) * row(d)
        d += 1
      }
      out(j) = if (acc > 0.0) 1 else 0
      j += 1
    }
    new GenericArrayData(out)
  }
}

abstract class VectorKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType
  /** static method on VectorOps implementing the kernel */
  def kernel: String

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>) arguments, got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel match {
      case "dot"    => VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case "sqDist" => VectorOps.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.$kernel($a, $b)")
}

/** `vec_dot(array<double>, array<double>) → double` */
case class VecDotExpr(left: Expression, right: Expression) extends VectorKernel {
  override def kernel: String = "dot"
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotExpr =
    copy(left = l, right = r)
}

/** `vec_sqdist(array<double>, array<double>) → double` */
case class VecSqDistExpr(left: Expression, right: Expression) extends VectorKernel {
  override def kernel: String = "sqDist"
  override def prettyName: String = "vec_sqdist"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSqDistExpr =
    copy(left = l, right = r)
}

/** `graft_top_cells(array<double>) → array<int>` — the P nearest
  * centroid ids in (dist, cid) order, with the centroid matrix BOUND
  * into the expression (the PpjoinPrefixExpr pattern: it ships with
  * the task binary, one instance per executor, probed in-loop). */
case class TopCellsExpr(child: Expression, cids: Array[Int],
                        cents: Array[Array[Double]], p: Int) extends UnaryExpression {
  require(p > 0 && cents.length == cids.length, "centroid/cid arity mismatch")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_top_cells requires an array<double> argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    VectorOps.topCells(input.asInstanceOf[ArrayData], cids, cents, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("graftTopCellsCids", cids, "int[]")
    val centsRef = ctx.addReferenceObj("graftTopCellsCents", cents, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorOps.topCells($c, $cidsRef, $centsRef, $p)")
  }

  override protected def withNewChildInternal(newChild: Expression): TopCellsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_top_cells"
}

/** `vec_lsh_sign(array<double>, nbits) → array<int>` — the LSH
  * signature projection as a native kernel; `nbits` fixed at plan
  * time. The aggregate(zip_with(...)) SQL form is CodegenFallback —
  * nbits x dim interpreted lambda calls per corpus row, the hot
  * projection of ann_topk_lsh. */
case class VecLshSignExpr(child: Expression, nbits: Int) extends UnaryExpression {
  require(nbits > 0 && nbits <= 64, "nbits must be in 1..64")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_lsh_sign requires an array<double> argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    VectorOps.lshSign(input.asInstanceOf[ArrayData], nbits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.lshSign($c, $nbits)")

  override protected def withNewChildInternal(newChild: Expression): VecLshSignExpr =
    copy(child = newChild)

  override def prettyName: String = "vec_lsh_sign"
}
