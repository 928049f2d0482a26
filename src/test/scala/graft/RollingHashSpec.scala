package graft

import graft.functions.{RollingHash, RollingHashExpr, TextAnalysis}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

/** Pins the RollingHash fingerprint to known values so any change to the
  * hash (algorithm, modulus, code-point walk) fails loudly — the r3 swap
  * from xxhash64 changed every emitted fingerprint with no test noticing.
  * Expected values independently recomputed ((h*31+cp) mod 2^58-27 over
  * unicode code points), matching the DuckDB oracle's list_reduce replay.
  */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private val pinned = Seq(
    "" -> 0L,
    "abc" -> 96354L,
    "hello world" -> 88006926820958916L,
    // U+1F600 (supplementary plane): one code point, not two UTF-16 chars
    "a😀b" -> 4077187L,
    "The  Quick\tBrown " -> 32154026783392889L)

  test("compute matches pinned reference values (incl. supplementary plane)") {
    pinned.foreach { case (s, expected) =>
      assert(RollingHash.compute(UTF8String.fromString(s)) == expected, s"for '$s'")
    }
  }

  test("interpreted eval and codegen path agree") {
    val viaDf = pinned.map(_._1).toDF("text")
      .select(RollingHash.rollingHash($"text").as("h"))
      .as[Long].collect().toSeq
    val viaEval = pinned.map { case (s, _) =>
      RollingHashExpr(Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)).eval(null).asInstanceOf[Long]
    }
    assert(viaDf == viaEval && viaDf == pinned.map(_._2))
  }

  test("fingerprint = hash of trim/collapse/lower normalization; null propagates") {
    val out = Seq((1L, "The  Quick\tBrown "), (2L, null: String))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(1L).contains(21128203578335326L))
    assert(out(2L).isEmpty, "null text must yield null fingerprint (documented contract)")
  }
}
