package graft.tools

import graft.{GraftSession, SparkEntry}

/** Per-run timing of one query in a single warm JVM: separates one-time
  * codegen/JIT warmup (run 1) from steady-state execution (runs 2+).
  * usage: Time <sfDir> <name>[,name...] [runs]
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val runs  = if (args.length > 2) args(2).toInt else 4
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(s"local[$cpus]", shufflePartitions = cpus)
    names.foreach { name =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // toRdd.count() — same rationale as Bench: count() re-optimizes and
        // can eliminate joins / prune the expensive output columns
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // match Bench: blocking-drain checkpoint/persist blocks off-clock
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        sec
      }
      println(f"[$name] " + times.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
