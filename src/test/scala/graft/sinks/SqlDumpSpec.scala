package graft.sinks

import graft.SparkSpec
import java.sql.Timestamp

class SqlDumpSpec extends SparkSpec {
  import spark.implicits._

  test("serialisation rules: bool keywords, null, quoted+escaped strings, bare numbers, datetimes (etl.py:98-128)") {
    val df = Seq(
      (1, "it's fine", true, Option(2.5), Option(Timestamp.valueOf("2020-01-02 03:04:05"))),
      (2, null: String, false, None, None))
      .toDF("id", "note", "flag", "score", "when")
    val stmts = SqlDump.insertStatements(df, "t").collect().map(_.getString(0)).sorted
    assert(stmts(0) === raw"INSERT INTO t VALUES (1, 'it\'s fine', TRUE, 2.5, '2020-01-02 03:04:05');")
    assert(stmts(1) === "INSERT INTO t VALUES (2, null, FALSE, null, null);")
  }

  test("DDL emitted from schema; full dump is DDL + inserts (etl.py:130-146)") {
    val df = Seq((1, "x")).toDF("id", "name")
    val dump = SqlDump.dumpSql(df, "dim")
    assert(dump.contains("CREATE TABLE `dim`"))
    assert(dump.contains("`id` INTEGER"))
    assert(dump.contains("`name` TEXT"))
    assert(dump.contains("INSERT INTO dim VALUES (1, 'x');"))
  }

  test("unsupported types fail loudly (etl.py:125-128)") {
    val df = Seq((1, Seq(1, 2))).toDF("id", "arr")
    intercept[IllegalArgumentException](SqlDump.insertStatements(df, "t"))
  }
}
