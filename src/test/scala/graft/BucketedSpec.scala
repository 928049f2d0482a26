package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Bucketed (pre-shuffled) tables: the co-located-join path. Writing both
  * sides bucketed on the join key must let joins AND aggregates on that key
  * run with zero Exchange in the executed plan — the shuffle is paid once
  * at write time, which is the design that keeps repeated segment
  * aggregates and enrichment joins shuffle-free at 100 TB.
  */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed tables join and aggregate without a shuffle") {
    val facts = (1L to 100L).map(u => (u, u * 2.0)).toDF("user_id", "amount")
    val dim = (1L to 100L).map(u => (u, s"name$u")).toDF("user_id", "name")
    Tables.writeBucketed(facts, "bkt_facts", "user_id", 4)
    Tables.writeBucketed(dim, "bkt_dim", "user_id", 4)
    try {
      // force the non-broadcast path: broadcast would trivially avoid the
      // exchange without proving bucket co-location
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val joined = spark.table("bkt_facts").join(spark.table("bkt_dim"), "user_id")
        assert(joined.count() == 100L)
        val jplan = joined.queryExecution.executedPlan.toString
        assert(!jplan.contains("Exchange"), s"bucketed join must not shuffle:\n$jplan")

        val agged = spark.table("bkt_facts").groupBy($"user_id")
          .agg(sum($"amount").as("total"))
        assert(agged.count() == 100L)
        val aplan = agged.queryExecution.executedPlan.toString
        assert(!aplan.contains("Exchange"), s"bucketed aggregate must not shuffle:\n$aplan")
      }
      // and the data is actually right, not just the plan shape
      val r = spark.table("bkt_facts").join(spark.table("bkt_dim"), "user_id")
        .filter($"user_id" === 7L).collect().head
      assert(r.getAs[Double]("amount") == 14.0 && r.getAs[String]("name") == "name7")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dim")
    }
  }
}
