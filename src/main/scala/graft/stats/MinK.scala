package graft.stats

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded "k smallest distinct strings" aggregate — the one-pass form of
  * capped deterministic violation sampling (SURVEY O5).
  *
  * The two-phase alternative (count violations in the stats pass, then a
  * second scan with `row_number() ≤ cap` to locate samples) re-reads and
  * re-hashes the content column for every batch that has violations. This
  * aggregate rides the SAME scan as the counts: state is a TreeSet bounded
  * at k elements (~k × keylen bytes, independent of input size), merge keeps
  * the k smallest of both sides — associative + commutative, so map-side
  * partial aggregation and salted two-level plans stay exact. Result is the
  * ascending-sorted array of the k lexicographically smallest distinct keys,
  * i.e. exactly the deterministic sample `ORDER BY key LIMIT k` would give
  * (distinct: a sample is a set of violating keys).
  */
case class MinKStringsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]] with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  private def insert(buf: java.util.TreeSet[UTF8String], s: UTF8String, owned: Boolean): Unit = {
    if (buf.size < k) {
      buf.add(if (owned) s else s.clone())
    } else if (s.compareTo(buf.last()) < 0) {
      // clone before add: input UTF8Strings may alias a reused row buffer
      if (buf.add(if (owned) s else s.clone())) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[UTF8String], input: InternalRow): java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[UTF8String], owned = false)
    buf
  }

  override def merge(buf: java.util.TreeSet[UTF8String], other: java.util.TreeSet[UTF8String]): java.util.TreeSet[UTF8String] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next(), owned = true)
    buf
  }

  override def eval(buf: java.util.TreeSet[UTF8String]): Any =
    new GenericArrayData(buf.toArray.asInstanceOf[Array[AnyRef]])

  override def serialize(buf: java.util.TreeSet[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val b = it.next().getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.add(UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): MinKStringsAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKStringsAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MinKStringsAgg = copy(child = c)
  override def prettyName: String = "min_k_strings"
}

object MinK {
  /** Column API: ascending array of the k smallest distinct non-null strings. */
  def minKStrings(c: Column, k: Int): Column =
    ColumnBridge.column(
      MinKStringsAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
