package graft.sim

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Primitive-loop kernels behind [[PqEncode]]/[[PqApproxCos]] — the
  * product-quantization analog of [[IvfKernel]] (same rationale: the
  * codebook matrix lives in the expression node, plan size O(1) in
  * `m × ks`, evaluation is primitive loops inside the codegen span).
  *
  * Codebooks are `[m][ks][dsub]`: `m` subspaces of `dsub = dim/m`
  * dimensions, `ks` centroids each. A code is `m` small ints (one
  * centroid id per subspace) — at dim=768/m=96/ks=256 that is 96 bytes
  * against 3072 for the float vector, the 32× compression that lets a
  * 100 TB embedding corpus's index live in cluster memory.
  */
object PqKernel {

  /** Nearest codebook entry per subspace by squared L2 (first-tie lowest
    * id — the k-means assignment rule), or null for degenerate vectors
    * (null elements or width ≠ m·dsub).
    */
  def encode(v: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    if (m == 0) return null
    val dsub = cb(0)(0).length
    val n = v.numElements()
    if (n != m * dsub) return null
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      x(i) = v.getDouble(i)
      i += 1
    }
    val code = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cbj = cb(j)
      val off = j * dsub
      var best = 0; var bd = Double.PositiveInfinity; var k = 0
      while (k < cbj.length) {
        val c = cbj(k)
        var d = 0.0; var t = 0
        while (t < dsub) { val e = x(off + t) - c(t); d += e * e; t += 1 }
        if (d < bd) { bd = d; best = k }
        k += 1
      }
      code(j) = best
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(code)
  }

  /** Asymmetric-distance cosine: cosine(q, decode(code)) where
    * `decode(code)` concatenates the code's codebook entries. Computed in
    * the SAME accumulation order as [[graft.dedup.Dedup.cosine]] over the
    * full concatenated vector (dots left-to-right, `sqrt(q·q)·sqrt(r·r)`
    * denominator, zero denominator → exactly 0.0), so the DuckDB oracle
    * can reconstruct the vector with list concatenation and re-derive the
    * identical score via `list_cosine_similarity`. Null for degenerate
    * inputs (null elements, width or code-length mismatch, out-of-range
    * code).
    */
  def approxCos(q: ArrayData, code: ArrayData,
                cb: Array[Array[Array[Double]]]): java.lang.Double = {
    val m = cb.length
    if (m == 0 || code.numElements() != m) return null
    val dsub = cb(0)(0).length
    val n = q.numElements()
    if (n != m * dsub) return null
    var daa = 0.0
    var i = 0
    while (i < n) {
      if (q.isNullAt(i)) return null
      val x = q.getDouble(i)
      daa += x * x
      i += 1
    }
    var dab = 0.0; var dbb = 0.0
    var j = 0
    while (j < m) {
      if (code.isNullAt(j)) return null
      val k = code.getInt(j)
      if (k < 0 || k >= cb(j).length) return null
      val c = cb(j)(k)
      val off = j * dsub
      var t = 0
      while (t < dsub) {
        dab += q.getDouble(off + t) * c(t)
        dbb += c(t) * c(t)
        t += 1
      }
      j += 1
    }
    val denom = math.sqrt(daa) * math.sqrt(dbb)
    java.lang.Double.valueOf(if (denom == 0.0) 0.0 else dab / denom)
  }
}

/** Kernel for [[PqAdcScores]] — the textbook ADC lookup-table scan: per
  * query, `lut[j][k] = dot(q_sub_j, codebook_j[k])` is precomputed ONCE
  * (driver-side, |Q|·m·ks·dsub work), and scoring a corpus code costs
  * `m` additions per query instead of `dim` multiplications — AND the
  * scan never materializes (query × code) joined rows (measured: the
  * cross-join form spent ~20 s at 256 queries × 200k codes × 8 threads
  * copying the 64-double query vector into every pair row; this form is
  * one narrow pass over codes). Scores differ from [[PqKernel.approxCos]]
  * only by FP summation grouping (per-subspace partials vs element
  * order, ≤ 1e-15 relative) — the gate's score-math query (q_pq_adc)
  * keeps using the element-order expression, and the candidate cut this
  * feeds is dump-validated, so the difference is never load-bearing
  * (spec-asserted ≤ 1e-12).
  */
object PqAdcKernel {
  /** All queries' approx cosines for one corpus code: `out[q] =
    * lutDot(q, code) / (qnorm[q] · sqrt(Σ_j cnorm2[j][code_j]))`, zero
    * denominator → exactly 0.0. Null for degenerate codes (null
    * elements, length ≠ m, out-of-range entry).
    */
  def scores(code: ArrayData, luts: Array[Array[Array[Double]]],
             qnorms: Array[Double],
             cnorms2: Array[Array[Double]]): ArrayData = {
    val m = cnorms2.length
    if (code.numElements() != m) return null
    val ks = new Array[Int](m)
    var j = 0
    while (j < m) {
      if (code.isNullAt(j)) return null
      val k = code.getInt(j)
      if (k < 0 || k >= cnorms2(j).length) return null
      ks(j) = k
      j += 1
    }
    var rr = 0.0
    j = 0
    while (j < m) { rr += cnorms2(j)(ks(j)); j += 1 }
    val rn = math.sqrt(rr)
    val out = new Array[Double](qnorms.length)
    var q = 0
    while (q < qnorms.length) {
      var dab = 0.0
      val lut = luts(q)
      j = 0
      while (j < m) { dab += lut(j)(ks(j)); j += 1 }
      val denom = qnorms(q) * rn
      out(q) = if (denom == 0.0) 0.0 else dab / denom
      q += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `pq_adc_scores(code)` — all queries' approximate cosines for one
  * corpus code via precomputed lookup tables (see [[PqAdcKernel]]). The
  * query batch rides in the NODE (bounded — the caller collects it, the
  * same constraint `broadcast(queries)` already imposes).
  */
case class PqAdcScores(child: Expression, luts: Array[Array[Array[Double]]],
                       qnorms: Array[Double], cnorms2: Array[Array[Double]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_scores"

  override protected def nullSafeEval(input: Any): Any =
    PqAdcKernel.scores(input.asInstanceOf[ArrayData], luts, qnorms, cnorms2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("adcLuts", luts, "double[][][]")
    val qn = ctx.addReferenceObj("adcQnorms", qnorms, "double[]")
    val cn = ctx.addReferenceObj("adcCnorms2", cnorms2, "double[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData adcS =
        graft.sim.PqAdcKernel.scores($c, $l, $qn, $cn);
      if (adcS == null) { ${ev.isNull} = true; } else { ${ev.value} = adcS; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScores =
    copy(child = newChild)
}

/** `pq_encode(vec)` — the corpus-side PQ index-build expression: the
  * vector's `m`-int code, null for degenerate vectors. Codebooks live in
  * the node ([[IvfAssign]] rationale: O(1) plan size and optimizer cost).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqKernel.encode(input.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => s"""
      org.apache.spark.sql.catalyst.util.ArrayData pqC =
        graft.sim.PqKernel.encode($v, $cb);
      if (pqC == null) { ${ev.isNull} = true; } else { ${ev.value} = pqC; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_approx_cos(qvec, code)` — the query-side asymmetric-distance
  * scoring expression: approximate cosine between a raw query vector and
  * a PQ-encoded corpus vector, evaluated entirely in the compressed
  * domain (the corpus vector is never read).
  */
case class PqApproxCos(left: Expression, right: Expression,
                       codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<int>), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_approx_cos"

  override protected def nullSafeEval(q: Any, code: Any): Any =
    PqKernel.approxCos(q.asInstanceOf[ArrayData], code.asInstanceOf[ArrayData],
      codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, (q, c) => s"""
      java.lang.Double pqS = graft.sim.PqKernel.approxCos($q, $c, $cb);
      if (pqS == null) { ${ev.isNull} = true; } else { ${ev.value} = pqS.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqApproxCos =
    copy(left = newLeft, right = newRight)
}
