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
}
