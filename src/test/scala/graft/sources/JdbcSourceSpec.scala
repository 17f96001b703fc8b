package graft.sources

import graft.SparkSpec
import graft.etl.Steps

/** JDBC passthrough (S1's production shape — the reference reads four MySQL
  * round databases, synth/utils.py:308-311). Exercised against in-process
  * Derby (ships with Spark), which plays the role of one round database.
  */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def seed(): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE NHM_Call") catch { case _: java.sql.SQLException => }
      st.execute(
        "CREATE TABLE NHM_Call (ID INT, Call_Year_Name VARCHAR(64), " +
          "dateOpen TIMESTAMP, dateClosed TIMESTAMP)")
      st.execute("INSERT INTO NHM_Call VALUES " +
        "(1, 'Call 1', TIMESTAMP('2010-01-01 00:00:00'), TIMESTAMP('2010-06-01 00:00:00')), " +
        "(2, 'Call 2', TIMESTAMP('2010-07-01 00:00:00'), TIMESTAMP('2010-12-01 00:00:00')), " +
        "(3, 'Call 3', TIMESTAMP('2011-01-01 00:00:00'), TIMESTAMP('2011-06-01 00:00:00'))")
      st.close()
    } finally conn.close()
  }

  test("Tables.jdbc reads a round-database table in place of a parquet scan") {
    seed()
    val df = Tables.jdbc(spark, url, "NHM_Call")
    assert(df.count() === 3)
    assert(df.columns.map(_.toLowerCase).toSet ===
      Set("id", "call_year_name", "dateopen", "dateclosed"))
  }

  test("jdbcPartitioned splits the key range into parallel bounded reads") {
    seed()
    val df = Tables.jdbcPartitioned(spark, url, "NHM_Call",
      partitionColumn = "ID", lowerBound = 1L, upperBound = 4L, numPartitions = 2)
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 3) // bounds split, they don't filter
  }

  test("an ETL step runs unchanged over the JDBC-sourced frame") {
    seed()
    val calls = Tables.jdbc(spark, url, "NHM_Call")
    val round = Steps.fillRound(Steps.unionRounds(Seq(calls))).collect()
    assert(round.length === 1)
    assert(round.head.getAs[String]("name") === "Synthesys 1")
  }

  test("writeAllJdbc round-trips analysis tables through a JDBC target") {
    import spark.implicits._
    val round = Seq(
      (1, "Synthesys 1", java.sql.Timestamp.valueOf("2010-01-01 00:00:00"), true, 1.5),
      (2, "Synthesys 2", java.sql.Timestamp.valueOf("2012-01-01 00:00:00"), false, 2.5))
      .toDF("id", "name", "date_open", "active", "score")
    val country = Seq((1, "GB"), (2, "FR")).toDF("id", "code")
    graft.etl.Rebuild.writeAllJdbc(Map("round_t" -> round, "country_t" -> country), url)
    // overwrite semantics: a second write replaces, never appends (the
    // reference's ClearAnalysisDB -> CreateAnalysisDB -> insert sequence)
    graft.etl.Rebuild.writeAllJdbc(Map("round_t" -> round, "country_t" -> country), url)
    val back = Tables.jdbc(spark, url, "round_t")
    assert(back.count() === 2)
    val r1 = back.filter($"id" === 1).collect().head
    assert(r1.getAs[String]("name") === "Synthesys 1")
    assert(r1.getAs[Boolean]("active"))
    assert(r1.getAs[Double]("score") === 1.5)
    assert(r1.getAs[java.sql.Timestamp]("date_open") ===
      java.sql.Timestamp.valueOf("2010-01-01 00:00:00"))
    assert(Tables.jdbc(spark, url, "country_t").count() === 2)
  }
}
