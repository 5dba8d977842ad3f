package graft.dedup

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingle hashing — the one-pass kernel behind
  * [[Dedup.shingleHashes]].
  *
  * The Column-composed form (`array_distinct(transform(sequence(...),
  * i => xxhash64(concat_ws(" ", slice(words, i+1, n)))))`) evaluates
  * INTERPRETED: Spark higher-order functions are CodegenFallback, so every
  * gram pays slice-array allocation + string concat + boxed lambda calls —
  * measured ~30 µs/gram, the dominant cost of the whole minhash pipeline
  * (the same Expression-vs-HOF gap the IVF kernels fixed in round 5).
  *
  * This kernel exploits a byte-level identity instead: splitting a string
  * on single spaces and re-joining any consecutive word window with " "
  * reproduces the ORIGINAL byte range exactly, so each gram's xxhash64
  * (seed 42, Spark's default) can be computed zero-copy over the input's
  * own bytes. Scanning for 0x20 at the byte level is UTF-8-safe
  * (continuation bytes are >= 0x80). Semantics are pinned to the composed
  * form bit-for-bit (DedupSpec parity law):
  *   - fewer than n words (split-on-" " semantics: empty string = one
  *     empty word) -> single-element array, hash of the whole input;
  *   - otherwise one hash per gram window, deduplicated keeping FIRST
  *     occurrence order (array_distinct semantics);
  *   - null input -> null.
  */
object ShingleKernel {

  private def hashRange(bytes: Array[Byte], from: Int, len: Int): Long =
    XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
      len, 42L)

  def wordGramHashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes // materialized once; grams hash sub-ranges of it
    val len = bytes.length
    // word start positions under split-on-single-space semantics
    var numWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) numWords += 1; i += 1 }
    if (numWords < n)
      return new GenericArrayData(Array[Any](hashRange(bytes, 0, len)))
    val starts = new Array[Int](numWords)
    var w = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val grams = numWords - n + 1
    val out = new Array[Long](grams)
    val seen = new java.util.HashSet[java.lang.Long](grams * 2)
    var k = 0
    var g = 0
    while (g < grams) {
      val from = starts(g)
      // gram ends one byte before the NEXT word's separator (or at EOS)
      val end = if (g + n < numWords) starts(g + n) - 1 else len
      val h = hashRange(bytes, from, end - from)
      if (seen.add(h)) { out(k) = h; k += 1 }
      g += 1
    }
    val vals = new Array[Any](k)
    var j = 0
    while (j < k) { vals(j) = out(j); j += 1 }
    new GenericArrayData(vals)
  }
}

object StringGramKernel {
  /** Word n-grams as STRINGS — same split/window/dedup semantics as
    * [[ShingleKernel.wordGramHashes]], but each gram is a ZERO-COPY
    * UTF8String view over the input's own byte range (the single-space
    * re-join identity); first-occurrence dedup order (array_distinct).
    */
  def wordGrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var numWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) numWords += 1; i += 1 }
    if (numWords < n)
      return new GenericArrayData(Array[Any](UTF8String.fromBytes(bytes, 0, len)))
    val starts = new Array[Int](numWords)
    var w = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val grams = numWords - n + 1
    val out = new Array[Any](grams)
    val seen = new java.util.HashSet[UTF8String](grams * 2)
    var k = 0
    var g = 0
    while (g < grams) {
      val from = starts(g)
      val end = if (g + n < numWords) starts(g + n) - 1 else len
      val gram = UTF8String.fromBytes(bytes, from, end - from)
      if (seen.add(gram)) { out(k) = gram; k += 1 }
      g += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], k))
  }
}

/** `word_grams(normalizedText)` — string form of [[WordGramHashes]]
  * (see [[StringGramKernel]]); the oracle-comparable shingle path.
  */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_grams"

  override protected def nullSafeEval(s: Any): Any =
    StringGramKernel.wordGrams(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.dedup.StringGramKernel.wordGrams($s, $n);
    """)

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object BandKeyKernel {
  /** LSH band keys of a minhash signature: per band b,
    * `xxhash64(b, concat_ws(",", slice(sig, b·rows+1, rows)))` — the
    * seed-chained XXH64 over the comma-joined DECIMAL rendering of the
    * band's signature slice, reproduced byte-for-byte (Long.toString is
    * the long→string cast).
    */
  def bandKeys(sig: ArrayData, bands: Int, k: Int): ArrayData = {
    val rows = k / bands
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(rows * 21)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      // concat_ws semantics: null/absent slots are skipped entirely
      // (no separator); slice past the array end yields fewer elements
      var first = true
      var j = 0
      while (j < rows) {
        val idx = b * rows + j
        if (idx < sig.numElements() && !sig.isNullAt(idx)) {
          if (!first) sb.append(',')
          sb.append(sig.getLong(idx))
          first = false
        }
        j += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h1 = XXH64.hashInt(b, 42L)
      out(b) = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, h1)
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `band_keys(sig)` — see [[BandKeyKernel]]. */
case class BandKeys(child: Expression, bands: Int, k: Int) extends UnaryExpression {
  require(bands >= 1 && k % bands == 0,
    s"k ($k) must be a positive multiple of bands ($bands)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "band_keys"

  override protected def nullSafeEval(s: Any): Any =
    BandKeyKernel.bandKeys(s.asInstanceOf[ArrayData], bands, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.dedup.BandKeyKernel.bandKeys($s, $bands, $k);
    """)

  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}

/** `word_gram_hashes(normalizedText)` — see [[ShingleKernel]]. The gram
  * width lives in the node; codegen emits one kernel call so the whole
  * computation stays inside the whole-stage span.
  */
case class WordGramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_gram_hashes"

  override protected def nullSafeEval(s: Any): Any =
    ShingleKernel.wordGramHashes(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.dedup.ShingleKernel.wordGramHashes($s, $n);
    """)

  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)
}
