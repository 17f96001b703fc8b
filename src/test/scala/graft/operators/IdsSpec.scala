package graft.operators

import graft.SparkSpec

class IdsSpec extends SparkSpec {
  import spark.implicits._

  test("distributedSequentialIds equals the global-window ids (dense, 1-based, ordered)") {
    val df = (1 to 997).map(i => (i * 7 % 1000, s"v$i")).toDF("k", "v")
    val global = Ids.globalRowNumber(df, Seq("k", "v"), "id")
      .select("id", "k", "v").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val dist = Ids.distributedSequentialIds(df, Seq("k", "v"), "id")
      .select("id", "k", "v").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(dist === global)
  }

  test("ids are dense 1..n") {
    val df = (1 to 100).map(i => (100 - i, i)).toDF("k", "x")
    val ids = Ids.distributedSequentialIds(df, Seq("k"), "id")
      .select("id").as[Long].collect().sorted
    assert(ids.toSeq === (1L to 100L))
  }
}
