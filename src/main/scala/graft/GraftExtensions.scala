package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.IntegerType
import graft.text.{Repetition, TextAnalysis}

/** SQL surface for the engine's scalar functions: lets `spark.sql` users
  * call the text/quality analyzers without touching the Scala API.
  *
  * Two entry points, one registry:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build (the
  *    standard `SparkSessionExtensions` injection — what a spark-submit
  *    deployment configures);
  *  - [[GraftFunctions.register]] on an EXISTING session (notebooks,
  *    tests — `getOrCreate` ignores extensions once a session is active).
  *
  * Only genuinely scalar, argument-closed functions are exposed. The
  * index-carrying expressions (IvfAssign/PqEncode — centroids/codebooks in
  * the node) stay Scala-API-only: their state is a trained artifact, not
  * something a SQL literal should smuggle in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def col1(name: String,
                   f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Seq[Expression] => Expression =
    args => {
      // arity-checked here: a builder sees raw args, and silently using
      // args.head would make extra arguments vanish (wrong-looking-right)
      // and zero arguments die with a bare NoSuchElementException
      if (args.size != 1) throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${args.size}")
      ColumnBridge.expressionEager(f(ColumnBridge.column(args.head)))
    }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  /** (name, info, builder) for every exposed SQL function. */
  val all: Seq[(String, ExpressionInfo,  Seq[Expression] => Expression)] = Seq(
    ("graft_token_count", info("graft_token_count",
      "_FUNC_(text) - whitespace token count, 0 for blank/null-safe"),
      col1("graft_token_count", TextAnalysis.tokenCount)),
    ("graft_lang_id", info("graft_lang_id",
      "_FUNC_(text) - stopword-heuristic language id over {en,es,de,fr,zh}"),
      col1("graft_lang_id", TextAnalysis.langId)),
    ("graft_quality_score", info("graft_quality_score",
      "_FUNC_(text) - pinned quality score in [0,1]"),
      col1("graft_quality_score", TextAnalysis.qualityScore)),
    ("graft_fingerprint64", info("graft_fingerprint64",
      "_FUNC_(text) - xxhash64 of normalized text (dedup key)"),
      col1("graft_fingerprint64", TextAnalysis.fingerprint64)),
    ("graft_repetition_stats", info("graft_repetition_stats",
      "_FUNC_(text[, n]) - struct(dup_line_frac, dup_line_char_frac, " +
        "top_ngram_char_frac), Gopher repetition rules (n defaults to 2)"),
      args => {
        val n = args match {
          case Seq(_)                                  => 2
          case Seq(_, Literal(i: Int, IntegerType))    => i
          case _ => throw new IllegalArgumentException(
            "graft_repetition_stats expects (text[, int literal n])")
        }
        val text = ColumnBridge.column(args.head)
        ColumnBridge.expressionEager(Repetition.statsCol(text, n))
      }))

  /** Register every function on an already-running session. Idempotent:
    * re-registration replaces the same name.
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
