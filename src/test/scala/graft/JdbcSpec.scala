package graft

import graft.sources.Jdbc
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** JDBC round-trip through embedded Derby (the one JDBC driver on the
  * provided Spark classpath), exercising the reference's exact read/write
  * shapes: overwrite write with pinned column types, whole-query read with
  * customSchema, and the range-partitioned scan.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val conn = {
    val dir = Files.createTempDirectory("graft_derby").toString
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    Jdbc.Conn(s"jdbc:derby:$dir/db;create=true",
      "org.apache.derby.jdbc.EmbeddedDriver")
  }

  test("segment write/read round-trip with pinned column types") {
    val seg = Seq((1L, 3L, 250.50, "UPI"), (2L, 1L, 99.99, "CC"))
      .toDF("user_id", "total_transactions", "total_spent", "transaction_types")
    Jdbc.write(seg, conn, "segment_output_1",
      createTableColumnTypes = Some("transaction_types VARCHAR(32)"))
    // overwrite twice: the reference's refresh drops and recreates
    Jdbc.write(seg, conn, "segment_output_1",
      createTableColumnTypes = Some("transaction_types VARCHAR(32)"))

    val back = Jdbc.readTable(spark, conn, "segment_output_1")
      .orderBy("user_id").collect()
    assert(back.length == 2 && back.head.getAs[Long]("user_id") == 1L)
    assert(back.head.getAs[Double]("total_spent") == 250.50)

    // Spark writes the table name unquoted (Derby folds it to uppercase)
    // but quotes the column names, so the pushdown query mirrors that.
    val q = Jdbc.readQuery(spark, conn,
      """SELECT "user_id", "total_spent" FROM segment_output_1 WHERE "total_spent" > 100""",
      customSchema = Some("user_id LONG, total_spent DOUBLE"))
    assert(q.schema("user_id").dataType.typeName == "long")
    assert(q.as[(Long, Double)].collect().toSeq == Seq((1L, 250.50)))
  }

  test("partitioned read fans a table across multiple JDBC slices") {
    val tbl = spark.range(0, 100).select($"id", ($"id" * 2).as("v"))
    Jdbc.write(tbl, conn, "fact_tbl")
    val part = Jdbc.readTablePartitioned(spark, conn, "fact_tbl",
      partitionColumn = "id", lower = 0L, upper = 100L, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.agg(sum("v")).as[Long].head() == (0L until 100L).map(_ * 2).sum)
    // predicate pushdown reaches the JDBC source
    val pushed = part.filter($"id" < 10)
    assert(pushed.count() == 10)
  }
}
