package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd dot product of two Array[Long] columns.
  *
  * The composable formulation — `aggregate(zip_with(a, b, _*_), 0L,
  * _+_)` — is a higher-order function chain, which Spark evaluates
  * interpreted (no whole-stage codegen, per-element lambda dispatch,
  * and a materialized intermediate product array). For the KNN/ANN
  * hot path that per-pair overhead dominates, so this is the one
  * place the engine drops to a custom Catalyst `Expression`: a tight
  * primitive loop over the two `ArrayData` buffers, generated inline
  * into the enclosing WholeStageCodegen stage.
  *
  * Semantics match the composable form on equal-length, null-free
  * arrays (the quantized-embedding invariant): sum over i of
  * a(i)*b(i); length mismatch uses the shorter prefix.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += x.getLong(i) * y.getLong(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the engine's custom expressions; callers
  * then use `functions.call_function("long_array_dot", a, b)`.
  *
  * Also surfaces Spark's own bloom expressions: `BloomFilterAggregate`
  * / `BloomFilterMightContain` are fully codegen'd catalyst
  * expressions (they power runtime join filtering) but are not in the
  * public function registry — registering them makes the
  * constant-size decontamination path (`BloomDecontaminate`)
  * expressible without private API.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "long_array_dot", exprs => LongArrayDot(exprs(0), exprs(1)), "internal")
    reg.createOrReplaceTempFunction(
      "plane_sign_mask",
      exprs => PlaneSignMask(exprs(0), exprs(1), exprs(2)), "internal")
    reg.createOrReplaceTempFunction(
      "pq_encode", exprs => PqEncode(exprs(0), exprs(1)), "internal")
    reg.createOrReplaceTempFunction(
      "pq_luts", exprs => PqLuts(exprs(0), exprs(1)), "internal")
    reg.createOrReplaceTempFunction(
      "adc_dot", exprs => AdcDot(exprs(0), exprs(1)), "internal")
    reg.createOrReplaceTempFunction(
      "pq_codenorm", exprs => PqCodeNorm(exprs(0), exprs(1)), "internal")
    reg.createOrReplaceTempFunction(
      "ivf_probe", exprs => IvfProbe(exprs(0), exprs(1), exprs(2)), "internal")
    reg.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "internal")
    reg.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "internal")
  }
}
