package graft

import graft.functions.Dedup
import org.apache.spark.sql.functions._

/** Hot-shingle frequency cap: candidate generation drops ubiquitous
  * shingles, verification stays exact on full sets.
  */
class SkewGuardSpec extends SparkSpec {
  import spark.implicits._

  // every doc shares the hot phrase "common boiler plate"; docs 1/2 also
  // share rare content
  private val docs = (
    Seq(
      (1L, "common boiler plate alpha beta gamma delta epsilon"),
      (2L, "common boiler plate alpha beta gamma delta zeta")) ++
      (3L to 40L).map(i => (i, s"common boiler plate unique$i word$i term$i end$i"))
    ).toDF("doc_id", "text")

  test("hot shingles are dropped from candidate generation only") {
    // cap = 5: "common boiler plate" (df=40) is hot; rare shingles survive
    val out = Dedup.ngramJaccardPairs(docs, 0.3, maxDocFreq = 5L)
      .as[(Long, Long, Double)].collect()
    val pairs = out.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 2L)))
    // jaccard for the found pair is computed on FULL sets (incl. hot shingles)
    val j12 = out.find(p => (p._1, p._2) == (1L, 2L)).get._3
    val expected = {
      def ng(s: String) = s.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val (x, y) = (ng(docs.as[(Long, String)].collect()(0)._2),
        ng(docs.as[(Long, String)].collect()(1)._2))
      x.intersect(y).size.toDouble / x.union(y).size
    }
    assert(math.abs(j12 - expected) < 1e-12)
    // boilerplate-only pairs (e.g., 3-4) are not generated despite sharing
    // the hot shingles
    assert(!pairs.exists(p => p._1 >= 3L && p._2 >= 3L))
  }

  test("cap high enough ⇒ identical to uncapped") {
    val capped = Dedup.ngramJaccardPairs(docs, 0.3, maxDocFreq = 10000L)
      .as[(Long, Long, Double)].collect().toSet
    val default = Dedup.ngramJaccardPairs(docs, 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(capped == default && capped.exists(p => (p._1, p._2) == (1L, 2L)))
  }

  // ---- Skew.saltedJoin: equivalence with the plain join under a hot key ----

  // key 7 owns half the fact side; keys 100+ are the uniform tail; key 999
  // appears only on the fact side (exercises the unmatched arms)
  private val fact = (
    (1L to 50L).map(i => (7L, i)) ++
      (1L to 50L).map(i => (100L + i, i)) ++ Seq((999L, 0L))
    ).toDF("k", "v")
  private val dim = (Seq(7L) ++ (1L to 50L).map(100L + _) ++ Seq(555L))
    .map(k => (k, s"name$k")).toDF("k", "name")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("salted join ≡ plain join for every supported join type") {
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain  = fact.join(dim, Seq("k"), jt)
      val salted = operators.Skew.saltedJoin(fact, dim, "k", numSalts = 5, joinType = jt)
      assert(salted.columns.toSeq == plain.columns.toSeq, s"schema for $jt")
      assert(rows(salted) == rows(plain), s"rows for $jt")
    }
  }

  test("the hot key's rows actually scatter across salts") {
    // distinct (k=7, salt) buckets on the salted big side: with 50 distinct
    // rows and 5 salts, all 5 buckets should be hit (probability of a miss
    // under the deterministic hash is (4/5)^50-ish — and the assertion is
    // deterministic because the hash is)
    val salted = fact.withColumn("__graft_salt",
      pmod(xxhash64(col("k"), col("v")), lit(5)).cast("int"))
    val buckets = salted.filter(col("k") === 7L)
      .select("__graft_salt").distinct().count()
    assert(buckets >= 4, s"hot key used only $buckets of 5 salt buckets")
  }

  test("numSalts=1 degenerates to the plain join; bad join types rejected") {
    val one = operators.Skew.saltedJoin(fact, dim, "k", numSalts = 1)
    assert(rows(one) == rows(fact.join(dim, Seq("k"), "inner")))
    intercept[IllegalArgumentException] {
      operators.Skew.saltedJoin(fact, dim, "k", 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      operators.Skew.saltedJoin(fact, dim, "k", 0)
    }
  }
}
