package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join matches the plain join result on a skewed key") {
    // 90% of rows share one hot key
    val large = (1 to 2000).map(i => (if (i % 10 == 0) s"k$i" else "HOT", i))
      .toDF("key", "payload")
    val small = Seq(("HOT", "hot-dim"), ("k10", "d10"), ("k20", "d20"))
      .toDF("key", "dim")

    val plain  = large.join(small, Seq("key"))
      .select("key", "payload", "dim").collect().toSet
    val salted = SkewJoin.saltedJoin(large, small, "key", saltFactor = 8, saltBy = "payload")
      .select("key", "payload", "dim").collect().toSet
    assert(salted === plain)
    assert(plain.count(_.getString(0) == "HOT") === 1800)
  }

  test("salt spreads the hot key across partitions") {
    val large = (1 to 1000).map(i => ("HOT", i)).toDF("key", "payload")
    val salts = large.withColumn("__salt",
        pmod(xxhash64(col("payload")), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts === 8)
  }
}
