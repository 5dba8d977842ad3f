package graft.dedup

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native kernels for the vector hot paths — cosine similarity and the
  * sign-LSH signature. The Column-composed forms (`aggregate(zip_with(…))`
  * nests) evaluate INTERPRETED: Spark higher-order functions are
  * CodegenFallback, so every (element, bit) pays boxed lambda calls — the
  * same Expression-vs-HOF gap the IVF/PQ kernels (round 5) and the shingle
  * kernel fixed. Semantics are pinned BIT-FOR-BIT to the composed forms
  * (DedupSpec parity laws), accumulation order included:
  *
  *  - [[CosineSim]]: dot products fold left-to-right in element order
  *    (`((0 + x0·y0) + x1·y1) + …`), `when(denom === 0, 0.0)` for empty or
  *    zero-norm inputs, NULL when either array is null, when lengths
  *    differ, or when any element is null (zip_with null padding / null
  *    products collapse the fold to null).
  *  - [[SignLshSig]]: bit j of the signature is `Σ_i v_i·h(t,j,i) > 0`
  *    with h = ±1 from `xxhash64(table, j, i) & 1` (the seed-chained
  *    XXH64.hashInt composition the Column form evaluates); a null vector
  *    or any null element yields signature 0L — NOT null — exactly like
  *    the composed `when(dotJ > 0, …).otherwise(0)` fold over null dotJ.
  */
object VectorKernel {

  /** Fold-left dot product in element order; NaN propagates naturally. */
  private def dot(a: ArrayData, b: ArrayData, n: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  private def anyNull(a: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  /** Boxed Double so null (SQL NULL) can be returned. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements() || anyNull(a) || anyNull(b)) return null
    val denom = math.sqrt(dot(a, a, n)) * math.sqrt(dot(b, b, n))
    if (denom == 0.0) 0.0 else dot(a, b, n) / denom
  }

  /** Equal-position count of two long arrays under the composed-HOF
    * semantics — see [[SigEqCount]].
    */
  def sigEqCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  def signLsh(v: ArrayData, bits: Int, table: Int): Long = {
    if (v == null) return 0L
    val n = v.numElements()
    if (anyNull(v)) return 0L // null element -> every dotJ null -> all bits 0
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) { xs(i) = v.getDouble(i); i += 1 }
    val hTable = XXH64.hashInt(table, 42L)
    var sig = 0L
    var j = 0
    while (j < bits) {
      val hj = XXH64.hashInt(j, hTable)
      var acc = 0.0
      i = 0
      while (i < n) {
        val sign = if ((XXH64.hashInt(i, hj) & 1L) == 1L) 1.0 else -1.0
        acc += xs(i) * sign
        i += 1
      }
      if (acc > 0.0) sig |= 1L << j
      j += 1
    }
    sig
  }
}

/** `sig_eq_count(a, b)` — positions where two long-array minhash signatures
  * agree: the count the composed
  * `aggregate(zip_with(a, b, (x,y) => when(x===y,1).otherwise(0)), 0, _+_)`
  * produces, replicated exactly (interpreted-HOF replacement for the
  * est_jaccard scoring of every minhash candidate pair): zip_with pads the
  * shorter array with nulls and a null comparison falls to the otherwise-0
  * branch, so only positions below both lengths with two non-null equal
  * elements count; a null ARRAY on either side nulls the whole fold (and
  * the row is dropped by the threshold filter, as before).
  */
case class SigEqCount(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "sig_eq_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.sigEqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.dedup.VectorKernel.sigEqCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigEqCount =
    copy(left = newLeft, right = newRight)
}

/** `cosine_sim(a, b)` — see [[VectorKernel.cosine]]. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("cosRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double $res = graft.dedup.VectorKernel.cosine($a, $b);
      if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `sign_lsh_sig(v)` — see [[VectorKernel.signLsh]]. Never null: a null or
  * null-element vector signs to 0L like the composed fold.
  */
case class SignLshSig(child: Expression, bits: Int, table: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "sign_lsh_sig"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    VectorKernel.signLsh(v.asInstanceOf[ArrayData], bits, table)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(isNull = FalseLiteral, code = code"""
      ${c.code}
      long ${ev.value} = graft.dedup.VectorKernel.signLsh(
        ${c.isNull} ? null : ${c.value}, $bits, $table);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshSig =
    copy(child = newChild)
}
