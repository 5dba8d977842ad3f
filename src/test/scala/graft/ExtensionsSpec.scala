package graft

import graft.text.{Repetition, TextAnalysis}
import org.apache.spark.sql.functions._

/** The SQL function surface: registered names resolve in spark.sql and
  * return exactly what the Scala Column API returns.
  */
class ExtensionsSpec extends GraftSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("SQL functions registered and callable") {
    val r = spark.sql(
      """SELECT graft_token_count('a b  c') AS tc,
                graft_lang_id('the cat and the dog is here') AS lid,
                graft_fingerprint64('Hello,  World!') AS fp,
                graft_repetition_stats('x y x y x').top_ngram_char_frac AS tng
      """).collect().head
    assert(r.getInt(0) === 3)
    assert(r.getString(1) === "en")
    assert(!r.isNullAt(2))
    assert(r.getDouble(3) === 6.0 / 9)
  }

  test("SQL results equal the Scala Column API on real data") {
    val docs = Seq("the and of", "el la que de", "short!!!", "")
      .toDF("text")
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT graft_token_count(text) AS tc, graft_lang_id(text) AS lid,
                graft_quality_score(text) AS q, graft_fingerprint64(text) AS fp
         FROM ext_docs""").collect().toSeq
    val viaApi = docs.select(
      TextAnalysis.tokenCount(col("text")).as("tc"),
      TextAnalysis.langId(col("text")).as("lid"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.fingerprint64(col("text")).as("fp")).collect().toSeq
    assert(viaSql === viaApi)
  }

  test("repetition_stats n argument: explicit literal matches the Column API") {
    val t = "a b c a b c a b c"
    val sql = spark.sql(
      s"SELECT graft_repetition_stats('$t', 3).top_ngram_char_frac AS v")
      .collect().head.getDouble(0)
    val api = Seq(t).toDF("t")
      .select(Repetition.statsCol(col("t"), 3).getField("top_ngram_char_frac"))
      .collect().head.getDouble(0)
    assert(sql === api)
  }

  test("extensions class injects the same registry (builder parity)") {
    // the class is exercised structurally: same (name, builder) list
    assert(GraftFunctions.all.map(_._1).distinct.size === GraftFunctions.all.size)
    assert(GraftFunctions.all.map(_._1).forall(_.startsWith("graft_")))
  }
}
