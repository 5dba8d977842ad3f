package graft.stats

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded "k best (score, id) pairs" aggregate — the map-side top-k that
  * ANN candidate cuts ride (ordering: score DESC, id ASC — exactly the
  * `row_number() OVER (ORDER BY score DESC, id ASC) <= k` cut).
  *
  * A window top-k SORTS the full scored set (measured: ~19 s of the ADC
  * scan at 256 queries × 200k codes × 8 threads was the two-phase window
  * sort of 51M exploded rows) and funnels each query's rows through one
  * reducer. This aggregate keeps a k-bounded TreeSet per (group, map
  * task): the per-row update is an O(1) compare against the current
  * worst for the ~all rows that miss the cut, the shuffle carries at most
  * mapTasks × k entries per query, and merge keeps the k best of both
  * sides — associative + commutative, so map-side partial aggregation
  * replaces BOTH the full sort and any manual salting phase, exactly.
  */
case class TopKPairsAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def left: Expression = scoreExpr
  override def right: Expression = idExpr

  private object Ord extends java.util.Comparator[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val d = java.lang.Double.compare(b._1, a._1) // score DESC
      if (d != 0) d else java.lang.Long.compare(a._2, b._2) // id ASC
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](Ord)

  private def insert(buf: java.util.TreeSet[(Double, Long)],
                     p: (Double, Long)): Unit = {
    if (buf.size < k) buf.add(p)
    else if (Ord.compare(p, buf.last()) < 0) {
      if (buf.add(p)) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[(Double, Long)],
                      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Double, Long)],
                     other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  /** Array of `struct<score: double, id: bigint>` in (score desc, id asc)
    * order — the exact window-cut result.
    */
  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      out(i) = new GenericInternalRow(Array[Any](s, id))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, id) = it.next()
      out.writeDouble(s)
      out.writeLong(id)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.add((in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKPairsAgg =
    copy(scoreExpr = l, idExpr = r)
  override def prettyName: String = "top_k_pairs"
}

/** Batched multi-query top-k — the ADC scan's aggregate: consumes ONE row
  * per corpus code carrying the full per-query score array (from
  * [[graft.sim.PqAdcScores]]) and maintains `nq` k-bounded heaps in one
  * buffer, so the 51M-row `posexplode` + per-row group hashing the
  * per-pair form needs never materializes (measured 5.8 s → the explode
  * dominated; this form touches each (code, query) pair as one primitive
  * compare). GLOBAL aggregate — no group key: the partial phase builds
  * all heaps per partition, merge combines per query, and the single
  * output row explodes into `(qidx, id)` pairs. Same (score desc, id asc)
  * cut as a window, exactly.
  */
case class AdcTopKAgg(
    idExpr: Expression,
    scoresExpr: Expression,
    qids: Array[Long],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[java.util.TreeSet[(Double, Long)]]]
  with BinaryLike[Expression] {

  private def nq: Int = qids.length
  require(qids.nonEmpty && k > 0, "qids/k must be non-empty/positive")

  override def left: Expression = idExpr
  override def right: Expression = scoresExpr

  private object Ord extends java.util.Comparator[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val d = java.lang.Double.compare(b._1, a._1)
      if (d != 0) d else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): Array[java.util.TreeSet[(Double, Long)]] =
    Array.fill(nq)(new java.util.TreeSet[(Double, Long)](Ord))

  private def insert(h: java.util.TreeSet[(Double, Long)],
                     p: (Double, Long)): Unit = {
    if (h.size < k) h.add(p)
    else if (Ord.compare(p, h.last()) < 0) {
      if (h.add(p)) h.pollLast()
    }
  }

  override def update(buf: Array[java.util.TreeSet[(Double, Long)]],
                      input: InternalRow): Array[java.util.TreeSet[(Double, Long)]] = {
    val idv = idExpr.eval(input)
    val sv = scoresExpr.eval(input)
    if (idv != null && sv != null) {
      val id = idv.asInstanceOf[Long]
      val scores = sv.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (scores.numElements() == nq) {
        // self-exclusion INSIDE the cut (a query is never its own
        // neighbor), so a self-match can't consume a rerank slot —
        // keeping the cut identical to the pre-filtered window form
        var q = 0
        while (q < nq) {
          if (id != qids(q)) insert(buf(q), (scores.getDouble(q), id))
          q += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[java.util.TreeSet[(Double, Long)]],
                     other: Array[java.util.TreeSet[(Double, Long)]]): Array[java.util.TreeSet[(Double, Long)]] = {
    var q = 0
    while (q < nq) {
      val it = other(q).iterator()
      while (it.hasNext) insert(buf(q), it.next())
      q += 1
    }
    buf
  }

  /** Array of `struct<qidx: int, id: bigint>`, per-query blocks in
    * (score desc, id asc) order.
    */
  override def eval(buf: Array[java.util.TreeSet[(Double, Long)]]): Any = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var q = 0
    while (q < nq) {
      val it = buf(q).iterator()
      while (it.hasNext) {
        val (_, id) = it.next()
        out += new GenericInternalRow(Array[Any](q, id))
      }
      q += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: Array[java.util.TreeSet[(Double, Long)]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var q = 0
    while (q < nq) {
      out.writeInt(buf(q).size)
      val it = buf(q).iterator()
      while (it.hasNext) {
        val (s, id) = it.next()
        out.writeDouble(s)
        out.writeLong(id)
      }
      q += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[java.util.TreeSet[(Double, Long)]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var q = 0
    while (q < nq) {
      val n = in.readInt()
      var i = 0
      while (i < n) {
        buf(q).add((in.readDouble(), in.readLong()))
        i += 1
      }
      q += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("qidx", IntegerType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): AdcTopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): AdcTopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcTopKAgg =
    copy(idExpr = l, scoresExpr = r)
  override def prettyName: String = "adc_top_k"
}

/** Bounded "k best (count, item) pairs" for STRING-keyed rankings — the
  * repo-metrics cut (`row_number() OVER (PARTITION BY batch
  * ORDER BY count DESC, repo ASC) <= k`) without the window: a per-batch
  * window rank funnels every repo of a batch through ONE reducer's sort
  * (10^9 rows per partition at target scale); this aggregate keeps a
  * k-bounded TreeSet per map task and shuffles ≤ mapTasks × k entries.
  *
  * Items compare as UTF-8 BYTES (unsigned, lexicographic) — exactly
  * Spark's `UTF8String` ordering, so the cut is binary-identical to the
  * window form even for non-ASCII keys where Java's UTF-16
  * `String.compareTo` would disagree.
  */
case class TopKStringsAgg(
    countExpr: Expression,
    itemExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Array[Byte])]]
  with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def left: Expression = countExpr
  override def right: Expression = itemExpr

  private object Ord extends java.util.Comparator[(Long, Array[Byte])] {
    override def compare(a: (Long, Array[Byte]), b: (Long, Array[Byte])): Int = {
      val d = java.lang.Long.compare(b._1, a._1) // count DESC
      if (d != 0) d
      else { // item ASC, unsigned byte-lexicographic == UTF8String order
        val (x, y) = (a._2, b._2)
        val n = math.min(x.length, y.length)
        var i = 0
        while (i < n) {
          val c = java.lang.Integer.compare(x(i) & 0xFF, y(i) & 0xFF)
          if (c != 0) return c
          i += 1
        }
        java.lang.Integer.compare(x.length, y.length)
      }
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Array[Byte])] =
    new java.util.TreeSet[(Long, Array[Byte])](Ord)

  private def insert(buf: java.util.TreeSet[(Long, Array[Byte])],
                     p: (Long, Array[Byte])): Unit = {
    if (buf.size < k) buf.add(p)
    else if (Ord.compare(p, buf.last()) < 0) {
      if (buf.add(p)) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[(Long, Array[Byte])],
                      input: InternalRow): java.util.TreeSet[(Long, Array[Byte])] = {
    val c = countExpr.eval(input)
    val s = itemExpr.eval(input)
    if (c != null && s != null)
      insert(buf, (c.asInstanceOf[Long],
        s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes.clone()))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Array[Byte])],
                     other: java.util.TreeSet[(Long, Array[Byte])]): java.util.TreeSet[(Long, Array[Byte])] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  /** Array of `struct<count: bigint, item: string>` in (count desc, item
    * asc) order — the exact window-cut result; array position = rank − 1.
    */
  override def eval(buf: java.util.TreeSet[(Long, Array[Byte])]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (c, b) = it.next()
      out(i) = new GenericInternalRow(Array[Any](c,
        org.apache.spark.unsafe.types.UTF8String.fromBytes(b)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (c, b) = it.next()
      out.writeLong(c)
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Array[Byte])] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val c = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.add((c, b))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("count", LongType, nullable = false),
      StructField("item", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): TopKStringsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStringsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKStringsAgg =
    copy(countExpr = l, itemExpr = r)
  override def prettyName: String = "top_k_strings"
}

object TopK {
  /** Column API: array of the k best `(score, id)` structs, score desc /
    * id asc — `row_number()`-cut-exact, without the sort.
    */
  def topKPairs(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKPairsAgg(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())

  /** Column API: array of the k best `(count, item)` structs, count desc /
    * item asc (UTF-8 byte order) — the string-keyed window cut, without
    * the window.
    */
  def topKStrings(count: Column, item: Column, k: Int): Column =
    ColumnBridge.column(TopKStringsAgg(
      ColumnBridge.expression(count), ColumnBridge.expression(item), k)
      .toAggregateExpression())

  /** Column API: all queries' k best ids from one score-array row per
    * code — `array<struct<qidx, id>>`, per-query blocks ordered
    * (score desc, id asc); `qids(q)` is excluded from query q's heap
    * (self-match).
    */
  def adcTopK(id: Column, scores: Column, qids: Array[Long], k: Int): Column =
    ColumnBridge.column(AdcTopKAgg(
      ColumnBridge.expression(id), ColumnBridge.expression(scores), qids, k)
      .toAggregateExpression())
}
