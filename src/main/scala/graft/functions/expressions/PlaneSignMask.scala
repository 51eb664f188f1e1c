package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All hyperplane projection signs of a quantized vector in ONE
  * expression: bit j of the returned word array (64 bits per word) is
  * 1 iff dot(vq, W_j) >= 0, for the deterministic ±1 weight rows
  * W_j = [hyperplaneWeight(j, i)]_i (`VecFns.hyperplaneWeight`).
  *
  * WHY one expression instead of one `long_array_dot` per plane: a
  * projection with 64 inline dot-product expressions generates one
  * enormous whole-stage method that the JVM's JIT refuses to compile
  * (the HugeMethodLimit cliff) — the q187 derived-grid sweep and its
  * p=16 band build ran INTERPRETED and measured 60 s / 68 s at 200 k
  * vectors where the 32-dot fixed-grid variants ran 4.5 s / 31 s
  * (Q187Probe, round 16). Here the loop lives in ONE static library
  * method the generated code merely calls, so the stage stays small
  * and the 4096-multiply kernel JITs like any other hot method. The
  * ±1 weight matrix (md5-derived, deterministic everywhere) is
  * computed once per JVM per (maxPlanes, dim) and cached.
  *
  * Null semantics: a NULL vector yields an all-zero mask (sign 0 for
  * every plane), matching `VecFns.planeSign`'s when/otherwise
  * contract — the sweep and the executed join must bucket NULL
  * vectors identically (key 0), never under a NULL key.
  */
case class PlaneSignMask(vec: Expression, maxPlanes: Expression,
    dim: Expression) extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = maxPlanes
  override def third: Expression = dim

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "plane_sign_mask"

  private lazy val mp: Int =
    maxPlanes.eval(null).asInstanceOf[Number].intValue()
  private lazy val d: Int =
    dim.eval(null).asInstanceOf[Number].intValue()

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) PlaneSignMask.zeroMask(mp)
    else PlaneSignMask.compute(v.asInstanceOf[ArrayData], mp, d)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val vecCode = vec.genCode(ctx)
    val cls = "graft.functions.expressions.PlaneSignMask$.MODULE$"
    ev.copy(
      code = code"""
        ${vecCode.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${vecCode.isNull}
            ? $cls.zeroMask($mp)
            : $cls.compute(${vecCode.value}, $mp, $d);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, maxPlanes = newSecond, dim = newThird)
}

object PlaneSignMask {
  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Long]]]()

  private def weights(maxPlanes: Int, dim: Int): Array[Array[Long]] =
    weightCache.computeIfAbsent((maxPlanes, dim),
      _ => Array.tabulate(maxPlanes)(j =>
        Array.tabulate(dim)(i => graft.functions.VecFns.hyperplaneWeight(j, i))))

  /** Static kernel the generated code calls — one tight
    * maxPlanes × dim multiply loop, JIT-friendly by construction.
    * Short vectors dot over their prefix (the `long_array_dot`
    * min-length contract).
    */
  def compute(vq: ArrayData, maxPlanes: Int, dim: Int): ArrayData = {
    val w = weights(maxPlanes, dim)
    val n = math.min(dim, vq.numElements())
    val words = new Array[Long]((maxPlanes + 63) >> 6)
    var j = 0
    while (j < maxPlanes) {
      val wj = w(j)
      var s = 0L
      var i = 0
      while (i < n) { s += vq.getLong(i) * wj(i); i += 1 }
      if (s >= 0L) words(j >> 6) |= 1L << (j & 63)
      j += 1
    }
    new GenericArrayData(words)
  }

  def zeroMask(maxPlanes: Int): ArrayData =
    new GenericArrayData(new Array[Long]((maxPlanes + 63) >> 6))
}
