package graft

import graft.text.Repetition
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden values and laws for the Gopher-style repetition signals:
  * hand-computed fractions, a Column-composed parity check for the line
  * stats, range/edge laws, and a codegen assertion (the kernel must stay
  * inside the whole-stage span — the whole point of the native shape).
  */
class RepetitionSpec extends GraftSpec {
  import spark.implicits._

  private def stats(texts: (Int, String)*): Map[Int, (Double, Double, Double)] =
    texts.toSeq.toDF("id", "t")
      .select(col("id"), Repetition.statsCol(col("t"), 2).as("st"))
      .collect().map { r =>
        if (r.isNullAt(1)) r.getInt(0) -> null
        else {
          val s = r.getStruct(1)
          r.getInt(0) -> (s.getDouble(0), s.getDouble(1), s.getDouble(2))
        }
      }.toMap

  test("golden values: duplicate lines and top-2-gram fractions") {
    val m = stats(
      1 -> "aa\naa\nbb",       // 3 lines, 2 distinct: dlf=1/3; chars 2/6=1/3
      2 -> "x y x y x",        // one line; 2-grams: "x y"×2,"y x"×2 → max 2·3=6 / len 9
      3 -> "unique lines\nonly here")
    assert(m(1)._1 === 1.0 / 3)
    assert(m(1)._2 === 2.0 / 6)
    assert(m(2)._1 === 0.0)
    assert(m(2)._3 === 6.0 / 9)
    assert(m(3)._1 === 0.0 && m(3)._2 === 0.0)
  }

  test("line keys are space-trimmed; blank lines never count") {
    val m = stats(
      1 -> "  code  \ncode\n\n   \ncode",  // 3 kept lines, all "code": dlf=2/3
      2 -> "\n\n  \n")                      // nothing survives → all zero
    assert(m(1)._1 === 2.0 / 3)
    assert(m(1)._2 === 8.0 / 12)            // 2 dup occurrences × 4 chars / 12
    assert(m(2) === (0.0, 0.0, 0.0))
  }

  test("top-gram uses the count·chars product (tie-free) and the normalized length") {
    // normalized: "ab ab zzzz zzzz" — grams: "ab ab"×1(5), "ab zzzz"×1(7),
    // "zzzz zzzz"×1(9) → max product 9, len 15
    val m = stats(1 -> "Ab aB, zzzz ZZZZ!")
    assert(m(1)._3 === 9.0 / 15)
  }

  test("edge cases: empty, single word, null") {
    val m = stats(1 -> "", 2 -> "word", 3 -> null)
    assert(m(1) === (0.0, 0.0, 0.0))
    assert(m(2) === (0.0, 0.0, 0.0))        // < n words → 0
    assert(m(3) == null)                     // null text → null struct
  }

  test("dup_line_frac parity with a Column-composed reference on varied docs") {
    val docs = (0 until 40).map { i =>
      val lines = (0 until (i % 7 + 1)).map(j => s"line${j % (i % 3 + 1)} $i")
      (i, lines.mkString("\n"))
    }
    val df = docs.toDF("id", "t")
    val kernel = df.select(col("id"),
      Repetition.statsCol(col("t")).getField("dup_line_frac").as("f"))
    val composed = df.select(col("id"), {
      val kept = filter(transform(split(col("t"), "\n"), l => trim(l)),
        l => l =!= "")
      when(size(kept) === 0, 0.0).otherwise(
        (size(kept) - size(array_distinct(kept))).cast("double") / size(kept))
        .as("f")
    })
    assert(kernel.orderBy("id").collect().toSeq ===
      composed.orderBy("id").collect().toSeq)
  }

  test("fractions stay in [0,1] and the projection is whole-stage codegen'd") {
    // spark.range, not a local Seq — ConvertToLocalRelation would fold a
    // LocalTableScan projection at plan time, leaving no codegen span
    val df = spark.range(30)
      .select(concat_ws(" ", lit("w"),
        repeat(concat(lit("w"), (col("id") % 3).cast("string"), lit(" ")),
          (col("id") % 5 + 1).cast("int"))).as("t"))
      .select(Repetition.statsCol(col("t"), 2).as("st"))
    df.collect().foreach { case Row(s: Row) =>
      Seq(s.getDouble(0), s.getDouble(1), s.getDouble(2)).foreach { v =>
        assert(v >= 0.0 && v <= 1.0)
      }
    }
    // the `*(n)` prefix is executedPlan.toString's WholeStageCodegen marker
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[repetition_stats""".r.findFirstIn(plan).isDefined,
      s"kernel fell out of codegen:\n$plan")
  }
}
