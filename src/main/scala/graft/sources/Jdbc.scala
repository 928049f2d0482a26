package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Thin JDBC connector completing S1-S5 for real databases — the
  * reference's only I/O path (reference
  * backend/app/processor/spark_processor.py:104-110 reads segments with
  * `query` + `customSchema` + explicit driver; :192-199 writes them with
  * `dbtable` + `createTableColumnTypes` + overwrite).
  *
  * Scale note: a plain `query` read arrives as ONE partition — fine for the
  * reference's segment-sized results, wrong for fact tables. [[readTablePartitioned]]
  * exposes Spark's range-partitioned JDBC scan (`partitionColumn`/bounds/
  * `numPartitions`) so a big table fans out across executors; predicates
  * still push down to the database via Catalyst's JDBC pushdown.
  */
object Jdbc {

  /** Connection descriptor; `driver` is explicit like the reference's
    * `.option("driver", ...)` so the executor classpath never guesses.
    */
  final case class Conn(url: String, driver: String,
      options: Map[String, String] = Map.empty)

  private def base(spark: SparkSession, conn: Conn) =
    spark.read.format("jdbc")
      .option("url", conn.url)
      .option("driver", conn.driver)
      .options(conn.options)

  /** Whole-query pushdown read (the reference's segment read shape).
    * `customSchema` pins column types the way its `customSchema` option
    * does — e.g. `"user_id LONG, total_spent DECIMAL(20,2)"`.
    */
  def readQuery(spark: SparkSession, conn: Conn, query: String,
      customSchema: Option[String] = None): DataFrame = {
    val r = base(spark, conn).option("query", query)
    customSchema.fold(r)(s => r.option("customSchema", s)).load()
  }

  def readTable(spark: SparkSession, conn: Conn, table: String): DataFrame =
    base(spark, conn).option("dbtable", table).load()

  /** Range-partitioned scan of a big table: `numPartitions` concurrent
    * JDBC cursors over `[lower, upper]` slices of `partitionColumn`.
    */
  def readTablePartitioned(spark: SparkSession, conn: Conn, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    base(spark, conn).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** Overwrite write (the reference's segment sink: drop + recreate with
    * pinned column types when `createTableColumnTypes` is given).
    */
  def write(df: DataFrame, conn: Conn, table: String,
      createTableColumnTypes: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.format("jdbc")
      .option("url", conn.url)
      .option("driver", conn.driver)
      .options(conn.options)
      .option("dbtable", table)
    createTableColumnTypes.fold(w)(t => w.option("createTableColumnTypes", t))
      .mode(mode).save()
  }
}
