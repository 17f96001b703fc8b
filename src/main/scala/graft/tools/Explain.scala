package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan-audit utility: prints `explain("formatted")` and wall time for the
  * named queries. Usage: Explain <sfDir> <q1,q2,...> [--no-run]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val run   = !args.contains("--no-run")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(s"local[$cpus]", shufflePartitions = cpus)
    names.foreach { name =>
      val df = if (name == "entry") SparkEntry.entry(spark)
               else SparkEntry.queries(name)(spark, sfDir)
      println(s"========== $name ==========")
      df.explain("formatted")
      if (run) {
        val t0 = System.nanoTime()
        // toRdd.count(), NOT count() — count() wraps the plan in a new
        // Aggregate and re-optimizes, letting Catalyst eliminate left
        // joins / prune the query's real work (same rationale as
        // Bench.timeOnce; a count() timing here mis-measured the
        // five-left-join DOI cascade 3× fast)
        val n = df.queryExecution.toRdd.count()
        println(f"[$name] rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
