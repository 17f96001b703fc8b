package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Locks `Tables.load`'s events timestamp contract: the fixture's `ts`
  * column has shipped as different parquet physical types across fixture
  * generations (TIMESTAMP(NANOS) → LongType under nanosAsLong;
  * TIMESTAMP(MICROS) without tz → TimestampNTZType; with tz →
  * TimestampType), and load must surface ONE stable TimestampType with the
  * same instant regardless of which generation is on disk. The r8 break —
  * an unconditional nanos DIV conversion that failed analysis on a
  * regenerated micros fixture and took down all 19 events queries — is the
  * regression this spec exists to prevent.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one instant, expressed in each generation's physical encoding
  private val micros = 1723500000123456L // 2024-08-12T22:00:00.123456Z

  private def loadTs(writeDir: String => Unit): (String, org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("tables_events").toFile
    dir.deleteOnExit()
    writeDir(dir.getAbsolutePath)
    val df = Tables.load(spark, dir.getAbsolutePath, "events")
    (dir.getAbsolutePath, df)
  }

  test("nanos-as-long generation: LongType ts converts via integral DIV") {
    val (_, df) = loadTs { d =>
      Seq((1L, micros * 1000L + 789L)) // nanos, sub-micro digits dropped by DIV
        .toDF("event_id", "ts")
        .write.parquet(s"$d/events.parquet")
    }
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].head()
    assert(got === "2024-08-12 22:00:00.123456")
  }

  test("micros-ntz generation: TimestampNTZType ts casts to TimestampType " +
      "preserving the value under the UTC session zone") {
    val (_, df) = loadTs { d =>
      Seq(Tuple2(1L, java.time.LocalDateTime.parse("2024-08-12T22:00:00.123456")))
        .toDF("event_id", "ts")
        .write.parquet(s"$d/events.parquet")
    }
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].head()
    assert(got === "2024-08-12 22:00:00.123456")
  }

  test("timestamp-with-tz generation passes through unchanged") {
    val (_, df) = loadTs { d =>
      Seq(Tuple2(1L, java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(micros / 1000000L, (micros % 1000000L) * 1000L))))
        .toDF("event_id", "ts")
        .write.parquet(s"$d/events.parquet")
    }
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].head()
    assert(got === "2024-08-12 22:00:00.123456")
  }

  test("all three generations load to the SAME instant") {
    // the three dtypes above are the complete set Tables.load dispatches
    // on; equality of the formatted instant across them is the contract
    // the events oracles depend on when the driver regenerates fixtures
    val asNanos = loadTs { d =>
      Seq((1L, micros * 1000L)).toDF("event_id", "ts")
        .write.parquet(s"$d/events.parquet")
    }._2
    val asNtz = loadTs { d =>
      Seq(Tuple2(1L, java.time.LocalDateTime.parse("2024-08-12T22:00:00.123456")))
        .toDF("event_id", "ts")
        .write.parquet(s"$d/events.parquet")
    }._2
    val f = (df: org.apache.spark.sql.DataFrame) =>
      df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")).as[String].head()
    assert(f(asNanos) === f(asNtz))
  }

  test("non-events tables are untouched by the ts dispatch") {
    val dir = Files.createTempDirectory("tables_other").toFile
    dir.deleteOnExit()
    Seq((1L, 42L)).toDF("k", "ts")
      .write.parquet(s"${dir.getAbsolutePath}/region.parquet")
    val df = Tables.load(spark, dir.getAbsolutePath, "region")
    assert(df.schema("ts").dataType === LongType)
  }
}
