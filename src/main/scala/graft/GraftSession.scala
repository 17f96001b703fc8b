package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory — ALL entrypoints (Bench, Verify, tests) go
  * through here so verify and bench run identical configs.
  *
  * Scale stance: these configs are the local[32] analogs of what we'd set on
  * a 1000-executor cluster — AQE on (runtime coalesce + skew-join handling),
  * shuffle partitions sized to the parallelism actually available rather than
  * the 200 default, UTC session time zone for oracle parity, parquet
  * timestamps as TIMESTAMP_MICROS (portable, no INT96 legacy).
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
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // the events table carries TIMESTAMP(NANOS) which parquet-mr maps to
      // INT64; read it as long and convert in Tables.load (no nanos type in
      // Spark SQL)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Note: `getOrCreate` returns any pre-existing session unchanged — the
    * master/shufflePartitions arguments only apply to the first call in a
    * JVM. Entrypoints each run in their own forked JVM, so in practice the
    * config always applies.
    */
  def get(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
