package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run named SparkEntry queries against a corpus dir, print each
  * one's formatted physical plan and warm timings. Usage:
  *   runMain graft.Explain <name>[,<name>...] [sfDir] [runs]
  * A comma list measures every query in ONE JVM (same codegen/page cache),
  * so A/B comparisons don't pay a fresh-JVM cold run per query.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // extra confs for A/B experiments: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k.trim, v.trim)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_JOBLOG=1: per-job wall times with their job-group
    // descriptions — the composite index-build queries run dozens of jobs
    // and this names where the seconds go (guide §1.5 / §7.1 without a UI).
    if (sys.env.get("SPARK_GRAFT_JOBLOG").exists(_ == "1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val desc = Option(js.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .orElse(Option(js.properties)
                .flatMap(p => Option(p.getProperty("callSite.short"))))
              .getOrElse("")
            starts.put(js.jobId, (System.nanoTime(), desc))
          }
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
              val sec = (System.nanoTime() - t0) / 1e9
              if (sec >= 0.05)
                println(f"[job] ${je.jobId}%4d $sec%7.2fs  $desc")
            }
          }
        })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      println(s"=== $name ===")
      fn(spark, sfDir).explain("formatted")
      // noop sink, not count(): count lets Catalyst prune the very
      // projections the bench measures (guide §1.4) — timings here must be
      // comparable to Bench's.
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[explain] $name run $i: " +
          f"time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
