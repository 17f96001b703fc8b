package graft.sinks

import graft.SparkSpec
import java.nio.file.Files

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "v", "x")
  private val updates = Seq((2L, "B2", 99.0), (4L, "d", 40.0))
    .toDF("k", "v", "x")

  test("copy-on-write merge: updates replace, inserts add, others survive") {
    val m = Upsert.merged(base, updates, "k").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(m === Map(1L -> (("a", 10.0)), 2L -> (("B2", 99.0)),
      3L -> (("c", 30.0)), 4L -> (("d", 40.0))))
  }

  test("merge-on-read: versioned appends resolve to the latest per key") {
    val dir = Files.createTempDirectory("upsert").toString + "/t"
    Upsert.appendVersion(base, dir, version = 0L)
    Upsert.appendVersion(updates, dir, version = 1L)
    Upsert.appendVersion(Seq((2L, "B3", 7.0)).toDF("k", "v", "x"), dir, 2L)
    val got = Upsert.readLatest(spark, dir, "k").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got === Map(1L -> (("a", 10.0)), 2L -> (("B3", 7.0)),
      3L -> (("c", 30.0)), 4L -> (("d", 40.0))))
    // and resolving then compacting copy-on-write equals merged state
    val compacted = Upsert.merged(
      Upsert.merged(base, updates, "k"),
      Seq((2L, "B3", 7.0)).toDF("k", "v", "x"), "k")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got === compacted)
  }
}
