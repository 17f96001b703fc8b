package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the harness testdata (TPC-H-ish star schema plus
  * `events`/`documents`/`embeddings`).
  *
  * Scale stance: plain `spark.read.parquet` keeps the scan declarative so
  * Catalyst pushes predicates and prunes columns into the parquet reader; on
  * a real cluster the same call distributes splits by
  * `spark.sql.files.maxPartitionBytes` with no code change.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extra: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extra

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts has shipped as two parquet physical types across fixture
    // generations, so dispatch on the dtype Spark actually loaded:
    //  - TIMESTAMP(NANOS) → INT64, surfaced as LongType via GraftSession's
    //    nanosAsLong; convert with integral `DIV` (a double division would
    //    lose precision at 2024-era epoch-nano magnitudes, ~1.7e18 > 2^53)
    //  - TIMESTAMP(MICROS) without tz → TimestampNTZType; cast to
    //    TimestampType (value-preserving under the UTC session zone) so every
    //    downstream query sees one stable type.
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
        case _                => df
      }
    } else df
  }

  /** S1's production shape: the reference's primary ingestion is four MySQL
    * round databases read table-by-table (/root/reference/synth/utils.py:308-311,
    * synth/etl.py:258,350,465). JDBC passthrough — `url` carries the
    * dialect (mysql/mariadb/derby/...), `props` anything driver-specific
    * (user, password, fetchsize). Single-partition read: right for the
    * dimension tables; use [[jdbcPartitioned]] for anything fact-sized.
    */
  def jdbc(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(props)
      .load()

  /** Range-partitioned JDBC read: Spark issues `numPartitions` bounded
    * queries over `partitionColumn` in parallel — the difference between a
    * single-connection drain and a cluster-wide parallel ingest when the
    * source table is large. Bounds don't filter (rows outside land in the
    * edge partitions); they only split the key space.
    */
  def jdbcPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, props: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .options(props)
      .load()

  /** Loads every table into a name->DataFrame map. Schema-only footer reads
    * happen at call time; no data scan until an action runs. Missing tables
    * are skipped rather than failing the whole load. Existence goes through
    * the path's own Hadoop FileSystem — a java.io.File test is local-only
    * and would silently skip every table on hdfs:///s3a:// dirs.
    */
  def loadAll(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val conf = spark.sessionState.newHadoopConf()
    all.filter { n =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$n.parquet")
      p.getFileSystem(conf).exists(p)
    }.map(n => n -> load(spark, dir, n)).toMap
  }
}
