package graft

import graft.operators.{Analytics, RangeJoin}
import graft.sources.{Layout, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-schema contract + TIMESTAMP_NTZ tolerance.
  *
  * Round-9 lesson: the driver regenerated `events.parquet` with
  * `ts: timestamp[us] (isAdjustedToUTC=false)` — read by Spark 4.x as
  * TIMESTAMP_NTZ — where it used to be INT64 TIMESTAMP(NANOS), and four
  * far-away queries failed at analysis time with nothing pointing at the
  * fixture. This spec pins the POST-NORMALIZATION dtypes of all 10 corpus
  * tables at every scale factor present, so the next silent regeneration
  * fails ONE named test here instead, and proves the time operators accept
  * NTZ frames directly (defense in depth for callers that bypass
  * [[Tables.events]]).
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val sfDirs: Seq[String] =
    Seq("sf0.001", "sf0.01", "sf0.1").map("/root/testdata/" + _)
      .filter(d => new java.io.File(d).exists())

  private def fields(df: DataFrame): Seq[(String, DataType)] =
    df.schema.fields.toSeq.map(f => (f.name, f.dataType))

  test("corpus contract: post-normalization read schema of all 10 tables") {
    assert(sfDirs.nonEmpty, "no testdata scale factors found")
    for (dir <- sfDirs) {
      def at(name: String) = s"$name @ $dir"
      assert(fields(Tables.region(spark, dir)) === Seq(
        "r_regionkey" -> IntegerType, "r_name" -> StringType), at("region"))
      assert(fields(Tables.nation(spark, dir)) === Seq(
        "n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType), at("nation"))
      assert(fields(Tables.customer(spark, dir)) === Seq(
        "c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType), at("customer"))
      assert(fields(Tables.supplier(spark, dir)) === Seq(
        "s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType), at("supplier"))
      assert(fields(Tables.part(spark, dir)) === Seq(
        "p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType), at("part"))
      // o_orderdate / l_shipdate arrive as TIMESTAMP_NTZ (timestamp[us],
      // isAdjustedToUTC=false) in the current fixture; every consumer of
      // them (date compares, to_date, BETWEEN) is NTZ-compatible, so they
      // pass through unnormalized — pinned here as the working contract.
      assert(fields(Tables.orders(spark, dir)) === Seq(
        "o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
        at("orders"))
      assert(fields(Tables.lineitem(spark, dir)) === Seq(
        "l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType,
        "l_shipdate" -> TimestampNTZType), at("lineitem"))
      // events.ts is the one column operators take epoch arithmetic on —
      // Tables.events MUST normalize it to plain TimestampType whatever the
      // fixture wrote (legacy INT64 nanos, NTZ micros, ...).
      assert(fields(Tables.events(spark, dir)) === Seq(
        "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType,
        "props" -> StringType), at("events"))
      assert(fields(Tables.documents(spark, dir)) === Seq(
        "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
        "source" -> StringType, "n_chars" -> LongType), at("documents"))
      assert(fields(Tables.embeddings(spark, dir)) === Seq(
        "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
        "label" -> IntegerType), at("embeddings"))
    }
  }

  /** A small NTZ-typed events frame written + read through parquet, so its
    * physical encoding matches what a fixture regeneration would produce.
    */
  private def ntzEvents(rows: Seq[(Long, String, Long, Double)]): DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
    rows.toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", col("ts_s").cast(TimestampNTZType)).drop("ts_s")
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("ts").dataType === TimestampNTZType)
    back
  }

  test("NTZ frames pass straight through sessionize, rangeJoin, and the z-order day key") {
    val ev = ntzEvents(Seq(
      (1L, "2024-03-01 10:00:00", 7L, 1.0),
      (2L, "2024-03-01 10:10:00", 7L, 2.0), // same session (10 min gap)
      (3L, "2024-03-01 12:00:00", 7L, 4.0), // new session (>30 min)
      (4L, "2024-03-02 09:00:00", 8L, 8.0)))

    // sessionize (both shapes) — was the r9 analysis-time failure
    for (sess <- Seq(Analytics.sessionize(ev, 30),
                     Analytics.sessionizeSkewSafe(ev, 30))) {
      val out = sess.orderBy("user_id", "session_id")
        .select("user_id", "n_events").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(out.toSeq === Seq((7L, 2L), (7L, 1L), (8L, 1L)))
    }

    // range join: NTZ point + NTZ interval bounds
    val points = ev.select(col("user_id"), col("ts"), col("event_id"))
    val iv = ntzEvents(Seq((100L, "2024-03-01 09:30:00", 7L, 0.0)))
      .select(col("user_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
    val matched = RangeJoin.pointInInterval(points, iv,
      Seq("user_id"), "ts", "w_start", "w_end", bucketWidthSec = 3600)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(matched.toSeq === Seq(1L, 2L)) // 10:00 and 10:10 inside [9:30, 10:30]

    // z-order day key from an NTZ ts (epochMicros route)
    val days = ev.select(
      (Tables.epochMicros(col("ts")) / lit(86400000000L)).cast(LongType).as("day"),
      col("user_id"))
    val z = days.select(Layout.zValue(Seq(col("user_id"), col("day")), 20).as("z"))
      .collect().map(_.getLong(0))
    assert(z.length === 4 && z.forall(_ >= 0L))
  }

  test("epoch helpers: NTZ, TimestampType, and numeric inputs agree") {
    import spark.implicits._
    val df = Seq("2024-03-01 10:00:00").toDF("s")
      .withColumn("ntz", col("s").cast(TimestampNTZType))
      .withColumn("tz", col("s").cast(TimestampType))
      .withColumn("secs", col("tz").cast(LongType))
    val r = df.select(
      Tables.epochMicros(col("ntz")), Tables.epochMicros(col("tz")),
      Tables.epochSeconds(col("ntz")), Tables.epochSeconds(col("tz")),
      Tables.epochSeconds(col("secs"))).head()
    assert(r.getLong(0) === r.getLong(1)) // UTC session: NTZ ≡ TZ
    assert(r.getLong(2) === r.getLong(3))
    assert(r.getLong(4) === r.getLong(2)) // numeric seconds pass through
    assert(r.getLong(0) === r.getLong(2) * 1000000L)
  }

  test("text-format round-trips survive adversarial content (quotes, separators, newlines, unicode)") {
    import graft.sources.TextFormats
    // the oracle-gated round-trip queries run on the benign corpus; this
    // pins the escape/quote cycle on the content that actually breaks
    // naive CSV/JSON: embedded quotes, the separator itself, newlines,
    // backslashes, unicode, empty strings, and NULLs
    val rows = Seq(
      (1L, "plain text", "en"),
      (2L, "comma, inside", "en"),
      (3L, "a \"quoted\" phrase", "en"),
      (4L, "line one\nline two", "en"),
      (5L, "back\\slash and tab\there", "en"),
      (6L, "émoji ✓ 中文", "zh"),
      (7L, "", "en"),
      (8L, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("doc_id", "text", "lang")
    def roundtrip(write: (org.apache.spark.sql.DataFrame, String) => Unit,
        read: (org.apache.spark.sql.SparkSession, String,
          org.apache.spark.sql.types.StructType) => org.apache.spark.sql.DataFrame,
        name: String): Unit = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_fmt_$name")
      try {
        val path = dir.resolve("t").toString
        write(rows, path)
        val back = read(spark, path, rows.schema).orderBy("doc_id")
          .collect().map(r => (r.getLong(0),
            if (r.isNullAt(1)) null else r.getString(1),
            if (r.isNullAt(2)) null else r.getString(2))).toSeq
        val orig = rows.orderBy("doc_id")
          .collect().map(r => (r.getLong(0),
            if (r.isNullAt(1)) null else r.getString(1),
            if (r.isNullAt(2)) null else r.getString(2))).toSeq
        assert(back == orig, s"$name round-trip mutated rows:\n$back\nvs\n$orig")
      } finally scala.util.Try {
        java.nio.file.Files.walk(dir)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    roundtrip(TextFormats.writeJsonl(_, _), TextFormats.readJsonl, "jsonl")
    // gzip-compressed JSONL: same adversarial content through the codec
    roundtrip(TextFormats.writeJsonl(_, _, codec = "gzip"),
      TextFormats.readJsonl, "jsonl_gz")
    // ORC: columnar and typed — embedded newlines, the CSV sentinel
    // string, empty-vs-NULL all round-trip with no caveat at all
    roundtrip(TextFormats.writeOrc, TextFormats.readOrc(_, _, _), "orc")
    // CSV: multiLine needed for embedded newlines on read — pinned here
    // so the limitation is DOCUMENTED by a test rather than discovered:
    // the default line-split reader cannot carry row 4, so assert the
    // writer+reader pair handles everything EXCEPT embedded newlines,
    // which round-trip only under the quoted-multiline read option
    val csvRows = rows.filter($"doc_id" =!= 4L)
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_csv")
    try {
      val path = dir.resolve("t").toString
      TextFormats.writeCsv(csvRows, path)
      val back = TextFormats.readCsv(spark, path, rows.schema)
        .orderBy("doc_id").collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1))).toSeq
      val orig = csvRows.orderBy("doc_id").collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSeq
      assert(back == orig, s"csv round-trip mutated rows:\n$back\nvs\n$orig")

      // the ONE documented CSV caveat, pinned: literal "\N" content is
      // indistinguishable from the NULL sentinel and reads back as NULL
      val sentinelDir = dir.resolve("s").toString
      TextFormats.writeCsv(Seq((9L, "\\N", "en")).toDF("doc_id", "text", "lang"),
        sentinelDir)
      assert(TextFormats.readCsv(spark, sentinelDir, rows.schema)
        .collect().head.isNullAt(1))
    } finally scala.util.Try {
      java.nio.file.Files.walk(dir)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
