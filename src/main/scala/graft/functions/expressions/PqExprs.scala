package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native expressions for the product-quantization hot path
  * ([[graft.operators.Pq]]).
  *
  * The composable formulation built `encode` as `array(8 ×
  * array_min(array(16 × struct(lit − 2·dot(slice(vq)…)))))` — a
  * multi-thousand-node Catalyst tree. On the harness corpus sizes the
  * EXECUTION of that tree is cheap; what isn't cheap is every
  * analyzer/optimizer pass and codegen compile walking those nodes on
  * each query run, and the same tree re-inlined at every consumer. A
  * single expression holding the codebooks as one literal collapses
  * the tree to O(1) nodes: planning cost drops ~50×, and the
  * generated loop is tighter than 128 inlined slice+dot calls.
  *
  * All of these require their table argument (codebooks / norm table)
  * to be FOLDABLE — it is baked into the generated code via a
  * reference object, exactly like a broadcast literal.
  */
private[expressions] trait LiteralBooks { self: BinaryExpression =>
  /** m × k × subDim codebooks decoded once from the literal child. */
  @transient protected lazy val books: Array[Array[Array[Long]]] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { mi =>
      val sub = ad.getArray(mi)
      Array.tabulate(sub.numElements())(j => sub.getArray(j).toLongArray())
    }
  }
  @transient protected lazy val bookNorms: Array[Array[Long]] =
    books.map(_.map(c => c.map(x => x * x).sum))

  /** These functions are SQL-callable through GraftExtensions, so a
    * non-foldable table argument must be a clean ANALYSIS error — the
    * eval(null) decode above would otherwise NPE (or bake in a stale
    * table) at execution time.
    */
  protected def foldableTableCheck(argName: String): TypeCheckResult =
    if (right.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires a foldable (literal) $argName argument, " +
        s"got ${right.sql}")
}

/** `pq_encode(vq, books)` — per-subspace argmin codes (ties → lowest
  * centroid id), one `array<int>` out. books: literal m×k×subDim.
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression with LiteralBooks {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def checkInputDataTypes(): TypeCheckResult =
    foldableTableCheck("codebook table")

  override def nullSafeEval(v: Any, b: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = books.length
    val subDim = x.numElements() / m
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0; var bestD = Long.MaxValue
      var j = 0
      while (j < books(mi).length) {
        val c = books(mi)(j)
        var dot = 0L; var i = 0
        while (i < subDim) { dot += x.getLong(mi * subDim + i) * c(i); i += 1 }
        val d = bookNorms(mi)(j) - 2L * dot
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val bk = ctx.addReferenceObj("pqBooks", books, "long[][][]")
      val nm = ctx.addReferenceObj("pqNorms", bookNorms, "long[][]")
      val m = ctx.freshName("m"); val sd = ctx.freshName("sd")
      val out = ctx.freshName("out"); val mi = ctx.freshName("mi")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      s"""
         |int $m = $bk.length;
         |int $sd = $v.numElements() / $m;
         |int[] $out = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $best = 0; long $bestD = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $bk[$mi].length; $j++) {
         |    long[] $c = $bk[$mi][$j];
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $sd; $i++) {
         |      $dot += $v.getLong($mi * $sd + $i) * $c[$i];
         |    }
         |    long $d = $nm[$mi][$j] - 2L * $dot;
         |    if ($d < $bestD) { $bestD = $d; $best = $j; }
         |  }
         |  $out[$mi] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `pq_luts(vq, books)` — query-side ADC tables, `luts[mi][j] =
  * q_mi · c_mij`, `array<array<long>>` out. Query-cardinality only,
  * but the small tree is what the planner walks.
  */
case class PqLuts(left: Expression, right: Expression)
    extends BinaryExpression with LiteralBooks {

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_luts"
  override def checkInputDataTypes(): TypeCheckResult =
    foldableTableCheck("codebook table")

  override def nullSafeEval(v: Any, b: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = books.length
    val subDim = x.numElements() / m
    new GenericArrayData(Array.tabulate(m) { mi =>
      new GenericArrayData(Array.tabulate(books(mi).length) { j =>
        val c = books(mi)(j)
        var dot = 0L; var i = 0
        while (i < subDim) { dot += x.getLong(mi * subDim + i) * c(i); i += 1 }
        dot
      }): Any
    })
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val bk = ctx.addReferenceObj("pqBooks", books, "long[][][]")
      val m = ctx.freshName("m"); val sd = ctx.freshName("sd")
      val out = ctx.freshName("out"); val mi = ctx.freshName("mi")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val row = ctx.freshName("row")
      s"""
         |int $m = $bk.length;
         |int $sd = $v.numElements() / $m;
         |Object[] $out = new Object[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  long[] $row = new long[$bk[$mi].length];
         |  for (int $j = 0; $j < $bk[$mi].length; $j++) {
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $sd; $i++) {
         |      $dot += $v.getLong($mi * $sd + $i) * $bk[$mi][$j][$i];
         |    }
         |    $row[$j] = $dot;
         |  }
         |  $out[$mi] = new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `adc_dot(luts, codes)` — the ADC approximate dot product:
  * `Σ_mi luts[mi][codes[mi]]`. The per-scored-row workhorse.
  */
case class AdcDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "adc_dot"

  override def nullSafeEval(l: Any, c: Any): Any = {
    val luts = l.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    var sum = 0L
    var mi = 0
    val m = codes.numElements()
    while (mi < m) {
      sum += luts.getArray(mi).getLong(codes.getInt(mi))
      mi += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, c) => {
      val m = ctx.freshName("m"); val mi = ctx.freshName("mi")
      val sum = ctx.freshName("sum")
      s"""
         |int $m = $c.numElements();
         |long $sum = 0L;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  $sum += $l.getArray($mi).getLong($c.getInt($mi));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `pq_codenorm(codes, norms)` — reconstruction squared norm from the
  * literal m×k per-centroid norm table: `Σ_mi norms[mi][codes[mi]]`.
  */
case class PqCodeNorm(left: Expression, right: Expression)
    extends BinaryExpression {

  @transient private lazy val norms: Array[Array[Long]] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(mi => ad.getArray(mi).toLongArray())
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_codenorm"
  override def checkInputDataTypes(): TypeCheckResult =
    if (right.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a foldable (literal) norm table argument, " +
        s"got ${right.sql}")

  override def nullSafeEval(c: Any, n: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]
    var sum = 0L
    var mi = 0
    while (mi < codes.numElements()) {
      sum += norms(mi)(codes.getInt(mi))
      mi += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, _) => {
      val nm = ctx.addReferenceObj("pqNormTable", norms, "long[][]")
      val mi = ctx.freshName("mi"); val sum = ctx.freshName("sum")
      s"""
         |long $sum = 0L;
         |for (int $mi = 0; $mi < $c.numElements(); $mi++) {
         |  $sum += $nm[$mi][$c.getInt($mi)];
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `ivf_probe(vq, centroids, nprobe)` — the `nprobe` nearest coarse
  * cells by `|c_j|² − 2·v·c_j` (ties → lowest cell id), ascending,
  * as `array<int>`. centroids: literal k×dim. The single-book
  * companion to [[PqEncode]] for the IVF probe side.
  */
case class IvfProbe(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  @transient private lazy val cents: Array[Array[Long]] = {
    val ad = second.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(j => ad.getArray(j).toLongArray())
  }
  @transient private lazy val centNorms: Array[Long] =
    cents.map(c => c.map(x => x * x).sum)
  @transient private lazy val np: Int =
    third.eval(null).asInstanceOf[Int]

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probe"
  override def checkInputDataTypes(): TypeCheckResult =
    if (!second.foldable) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a foldable (literal) centroid table, got ${second.sql}")
    else if (!third.foldable) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a foldable nprobe, got ${third.sql}")
    else TypeCheckResult.TypeCheckSuccess

  private def probe(x: ArrayData): Array[Int] = {
    val k = cents.length
    val d = new Array[Long](k)
    var j = 0
    while (j < k) {
      var dot = 0L; var i = 0
      val c = cents(j)
      while (i < c.length) { dot += x.getLong(i) * c(i); i += 1 }
      d(j) = centNorms(j) - 2L * dot
      j += 1
    }
    // selection of the np smallest (d, j) — k is tiny (coarse cells)
    val ids = Array.range(0, k)
    val out = new Array[Int](math.min(np, k))
    var s = 0
    while (s < out.length) {
      var best = s
      var t = s + 1
      while (t < k) {
        if (d(ids(t)) < d(ids(best)) ||
          (d(ids(t)) == d(ids(best)) && ids(t) < ids(best))) best = t
        t += 1
      }
      val tmp = ids(s); ids(s) = ids(best); ids(best) = tmp
      out(s) = ids(s)
      s += 1
    }
    out
  }

  override def nullSafeEval(v: Any, c: Any, n: Any): Any =
    new GenericArrayData(probe(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val self = ctx.addReferenceObj("ivfProbeExpr", this,
        "graft.functions.expressions.IvfProbe")
      s"${ev.value} = $self.probeForCodegen($v);"
    })

  /** Codegen entry point (public for generated code). */
  def probeForCodegen(x: ArrayData): ArrayData =
    new GenericArrayData(probe(x))

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}
