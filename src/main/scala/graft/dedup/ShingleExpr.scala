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
