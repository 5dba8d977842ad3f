package graft.drift

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** `range_bucket(cid, v)` — the per-lane boundary-bucket assignment of the
  * exact-KS two-phase prefix-sum machinery: bucket = number of that lane's
  * boundaries strictly below `v` (equivalently the lower-bound index in
  * the sorted deduped boundary array).
  *
  * The boundaries live in the NODE as plain arrays and the lookup is a
  * per-lane binary search — one small kernel call in generated code. The
  * previous literal when-chain form (lanes × boundaries nested `when`s)
  * was semantically identical but emitted a large generated method whose
  * JIT warm-up dominated the first two executions of the stage (the
  * bench's cold AND warm legs), and evaluated all boundaries linearly.
  * Bucket ids only balance the window partitions — any monotone-in-v
  * assignment yields the same exact KS statistic — but this kernel also
  * reproduces the when-chain's exact ids (count of boundaries < v).
  */
case class RangeBucket(left: Expression, right: Expression,
                       cids: Array[Int], bounds: Array[Array[Double]])
    extends BinaryExpression {
  require(cids.length == bounds.length, "cids/bounds length mismatch")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, double), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "range_bucket"

  /** Count of boundaries strictly below v: lower-bound binary search in
    * the lane's sorted, deduplicated boundary array; unknown lanes get
    * bucket 0 (the when-chain's default arm).
    */
  def bucketFor(cid: Int, v: Double): Int = {
    var lane = -1
    var i = 0
    while (lane < 0 && i < cids.length) { if (cids(i) == cid) lane = i; i += 1 }
    if (lane < 0) return 0
    val bs = bounds(lane)
    var lo = 0
    var hi = bs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v > bs(mid)) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def nullSafeEval(cid: Any, v: Any): Any =
    bucketFor(cid.asInstanceOf[Int], v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rangeBucket", this,
      classOf[RangeBucket].getName)
    nullSafeCodeGen(ctx, ev, (cid, v) => s"""
      ${ev.value} = $self.bucketFor($cid, $v);
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RangeBucket =
    copy(left = newLeft, right = newRight)
}
