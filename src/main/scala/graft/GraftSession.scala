package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory.
  *
  * Scale stance: these configs are the local[32] analogs of what we'd set on
  * a 1000-executor cluster — AQE on (runtime coalesce + skew-join handling),
  * shuffle partitions sized to the parallelism actually available rather than
  * the 200 default, UTC session time zone for oracle parity.
  */
object GraftSession {
  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")

  def get(master: String = "local[32]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
