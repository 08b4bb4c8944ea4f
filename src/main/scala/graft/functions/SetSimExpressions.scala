package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared intersection-count kernel for the set-similarity expressions —
  * a static method so whole-stage codegen can call it directly.
  *
  * Operating on ArrayData/UTF8String (no Seq conversion, no String
  * decode) is what makes these expressions beat the UDF twins in
  * TextFunctions: the UDF boundary converts both arrays per CALL
  * (UnsafeArrayData → Seq[String], one java.lang.String decode per
  * element), and that converter code is generated fresh per query, so
  * every query re-pays its JIT warmup — measured as a 10-220 CPU-s
  * run-to-run swing on q33's verify stage (the interpreted-vs-compiled
  * race at 32 threads). This path is one regular JVM method shared by
  * every caller: warmed once per JVM, stable thereafter, and UTF8String
  * equality is a byte comparison — cheaper than decoded String equals.
  */
object SetSimKernels {
  def commonCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    // build the set over the smaller side, probe with the larger
    val (small, ns, big, nbg) = if (na <= nb) (a, na, b, nb) else (b, nb, a, na)
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getUTF8String(i)); i += 1 }
    var common = 0
    i = 0
    while (i < nbg) { if (set.contains(big.getUTF8String(i))) common += 1; i += 1 }
    common
  }

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) 0.0
    else {
      val c = commonCount(a, b)
      c.toDouble / (na + nb - c)
    }
  }

  def containment(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    if (na == 0) 0.0
    else commonCount(a, b).toDouble / na
  }
}

/** Exact Jaccard |a∩b| / |a∪b| between two string-array SETS — native
  * verification kernel for the dedup candidate joins (q33/q34/q76).
  * Bit-identical to TextFunctions.jaccard (pinned in TextFunctionsSpec). */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    SetSimKernels.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetSimKernels.jaccard($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric containment C(a→b) = |a∩b| / |a| — the directed
  * excerpt/quotation measure (q88). Bit-identical to
  * TextFunctions.containment. */
case class ContainmentSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_containment"

  override def nullSafeEval(a: Any, b: Any): Any =
    SetSimKernels.containment(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetSimKernels.containment($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
