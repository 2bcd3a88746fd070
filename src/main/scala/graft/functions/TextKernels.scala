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
}

/** `graft_shingles(string, n) → array<string>` — n fixed at plan
  * time (a foldable argument in the SQL form). */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
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
