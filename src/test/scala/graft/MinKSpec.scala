package graft

import graft.stats.MinK
import org.apache.spark.sql.functions._

class MinKSpec extends GraftSpec {

  test("min_k_strings returns the k smallest DISTINCT strings in ascending order") {
    // id*37 mod 500 covers every residue 0..499 exactly twice → duplicates
    val df = spark.range(0, 1000)
      .select(format_string("s%04d", pmod(col("id") * 37, lit(500))).as("s"))
    val got = df.agg(MinK.minKStrings(col("s"), 10).as("ks"))
      .collect()(0).getSeq[String](0)
    assert(got == (0 until 10).map(i => f"s$i%04d"))
  }

  test("min_k_strings is partitioning-invariant (merge keeps the global k smallest)") {
    val df = spark.range(0, 5000)
      .select(format_string("k%05d", pmod(col("id") * 761, lit(4999))).as("s"))
    val one = df.coalesce(1).agg(MinK.minKStrings(col("s"), 25)).collect()(0).getSeq[String](0)
    val many = df.repartition(17).agg(MinK.minKStrings(col("s"), 25)).collect()(0).getSeq[String](0)
    assert(one == many)
  }

  test("min_k_strings skips nulls and handles fewer-than-k inputs") {
    val df = spark.range(0, 5)
      .select(when(col("id") % 2 === 0, format_string("v%d", col("id"))).as("s"))
    val got = df.agg(MinK.minKStrings(col("s"), 100)).collect()(0).getSeq[String](0)
    assert(got == Seq("v0", "v2", "v4"))
  }
}
