package graft

import graft.functions.{RollingHash, SimHash}
import org.apache.spark.unsafe.types.UTF8String

/** The SQL surface must evaluate the exact same expressions as the Column
  * API — checked against the pinned kernel values.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq(("hello world", Seq("the", "dog", "and", "a", "cat")))
      .toDF("text", "toks").createOrReplaceTempView("ext_docs")

    val row = spark.sql(
      """SELECT rolling_hash(text) AS rh,
        |       lang_id(toks) AS lang,
        |       simhash64(toks) AS sh,
        |       size(word_ngrams(toks)) AS ng3,
        |       size(word_ngrams(toks, 2)) AS ng2,
        |       size(minhash_signature(word_ngrams(toks), 16)) AS mh,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |       nfc_normalize('café') AS nfc,
        |       text_dhash(text) AS dh
        |FROM ext_docs""".stripMargin).collect().head

    assert(row.getAs[Long]("rh") ==
      RollingHash.compute(UTF8String.fromString("hello world")))
    assert(row.getAs[String]("lang") == "en")
    assert(row.getAs[Long]("sh") != 0L)
    assert(row.getAs[Int]("ng3") == 3 && row.getAs[Int]("ng2") == 4)
    assert(row.getAs[Int]("mh") == 16)
    assert(row.getAs[Double]("dp") == 11.0)
    assert(row.getAs[String]("nfc") == "café")
    assert(row.getAs[Long]("dh") ==
      graft.functions.DHash.computeText(UTF8String.fromString("hello world")))
  }

  test("blocklist SQL surface enforces the Column-surface pattern contract") {
    GraftExtensions.register(spark)
    Seq(Tuple1("some text")).toDF("text").createOrReplaceTempView("bl_docs")
    // valid call still works
    assert(spark.sql(
      "SELECT blocklist_count(text, array('tex')) AS n FROM bl_docs")
      .collect().head.getAs[Long]("n") == 1L)
    // empty pattern LIST must fail analysis like Blocklist.matches does
    // (it would otherwise silently screen nothing)
    assertThrows[Exception](spark.sql(
      "SELECT blocklist_matches(text, array()) FROM bl_docs").collect())
    // empty pattern STRING must fail (it matches at every char position,
    // and blocklist_count's replace-arithmetic oracle would divide by zero)
    assertThrows[Exception](spark.sql(
      "SELECT blocklist_count(text, array('a', '')) FROM bl_docs").collect())
  }

  test("extensions class injects the same registry into a new session build") {
    // SparkSessionExtensions is applied at build time; here we just check
    // the injection list registers without conflict on a fresh extensions
    // object (the running shared session can't be rebuilt mid-suite).
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }
}
