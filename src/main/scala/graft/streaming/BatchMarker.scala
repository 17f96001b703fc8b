package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The shared exactly-once replay protocol for foreachBatch sinks that
  * append hive-partitioned by `batch_id` — used by [[IndexIngest]],
  * [[VectorIngest]] and [[PqIngest]].
  *
  * Why not "does the batch's partition dir exist": a Hadoop committer
  * commits a job's partition directories as a SEQUENCE of renames, not
  * atomically — a crash mid-commit can leave some of a batch's
  * `.../batch_id=N` dirs present and others missing, and a dir-existence
  * guard would then skip the replay forever, silently losing rows.
  *
  * Protocol per (sink, batch):
  *  1. `landed(sink, id)` — O(1) check of one zero-byte marker file under
  *     `<indexPath>/_batches/<sink>_<id>` (never a scan, never a glob).
  *  2. if not landed: `clearPartial(glob)` — delete any partial leftovers
  *     of this batch (safe precisely BECAUSE the layout partitions by
  *     batch_id: the batch owns its dirs exclusively).
  *  3. append the batch's data.
  *  4. `commit(sink, id)` — create the marker. A crash between 3 and 4
  *     replays into 2 (delete + rewrite), which is idempotent: the batch
  *     content is a pure function of the batch.
  *
  * The `_batches` directory IS the index's replay state: when cloning or
  * compacting an index to a new path, copy it along with the data tables
  * — a marker-less copy that holds batches is refused by
  * [[assertMarkeredSink]] precisely because its replay state would
  * otherwise be unknowable.
  */
object BatchMarker {

  private def markerPath(indexPath: String, sink: String, batchId: Long) =
    new Path(s"$indexPath/_batches", s"${sink}_$batchId")

  def landed(spark: SparkSession, indexPath: String, sink: String,
      batchId: Long): Boolean = {
    val p = markerPath(indexPath, sink, batchId)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Create the `_batches` directory BEFORE any data is appended. This is
    * what lets [[assertMarkeredSink]] tell a pre-marker sink apart from a
    * marker-era sink whose very first batch crashed between its append
    * and its marker: the protocol dir exists from the first ATTEMPT, not
    * the first success, so that crash replays (delete + rewrite) instead
    * of being mistaken for legacy data. Idempotent, O(1).
    */
  def ensureProtocol(spark: SparkSession, indexPath: String): Unit = {
    val p = new Path(s"$indexPath/_batches")
    p.getFileSystem(spark.sessionState.newHadoopConf()).mkdirs(p)
  }

  /** Delete every path matching `glob` — the crash-replay cleanup of a
    * batch's partial partition dirs.
    */
  def clearPartial(spark: SparkSession, glob: String): Unit = {
    val g = new Path(glob)
    val fs = g.getFileSystem(spark.sessionState.newHadoopConf())
    val hits = fs.globStatus(g) // null when the parent doesn't exist
    if (hits != null) hits.foreach(st => fs.delete(st.getPath, true))
  }

  def commit(spark: SparkSession, indexPath: String, sink: String,
      batchId: Long): Unit = {
    val p = markerPath(indexPath, sink, batchId)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  /** Marker GC under a compaction: advance the sink's horizon to `id` and
    * delete every per-batch marker at or below it — the roster would
    * otherwise grow one file per micro-batch FOREVER (recovery and
    * compaction listings scale with it at crawl cadence). Safe ONLY after
    * a compaction has collapsed those batches' data under one surviving
    * dir: from then on [[landedOrCollapsed]] answers "landed" for the
    * whole range from the single `<sink>_horizon_<id>` file, so a
    * pre-horizon replay still short-circuits while live markers stay
    * O(batches since last compaction). Ordering makes a crash anywhere
    * harmless: the new horizon file lands FIRST, so every marker it
    * covers is deletable debris from that point on (an older horizon
    * file is itself covered and removed the same way).
    */
  def advanceHorizon(spark: SparkSession, indexPath: String, sink: String,
      id: Long): Unit = {
    val batches = new Path(s"$indexPath/_batches")
    val fs = batches.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(batches)
    fs.create(new Path(batches, s"${sink}_horizon_$id"), true).close()
    val bare = s"${sink}_"
    fs.listStatus(batches).foreach { st =>
      val nm = st.getPath.getName
      val old = nm.stripPrefix(s"${sink}_horizon_")
      // nonEmpty guards: a malformed marker name (bare prefix, no id)
      // must never crash the GC — compaction would then fail forever
      if (nm.startsWith(s"${sink}_horizon_") && old != id.toString &&
          old.nonEmpty && old.forall(_.isDigit) && old.toLong < id)
        fs.delete(st.getPath, false)
      else if (nm.startsWith(bare) && !nm.startsWith(s"${sink}_horizon_")) {
        val tail = nm.stripPrefix(bare)
        if (tail.nonEmpty && tail.forall(_.isDigit) && tail.toLong <= id)
          fs.delete(st.getPath, false)
      }
    }
  }

  /** The sink's marker-GC horizon, -1 when none has ever been set.
    * O(listing of the live marker roster).
    */
  def horizon(spark: SparkSession, indexPath: String, sink: String): Long = {
    val batches = new Path(s"$indexPath/_batches")
    val fs = batches.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(batches)) return -1L
    fs.listStatus(batches).foldLeft(-1L) { (acc, st) =>
      val tail = st.getPath.getName.stripPrefix(s"${sink}_horizon_")
      if (st.getPath.getName.startsWith(s"${sink}_horizon_") &&
          tail.nonEmpty && tail.forall(_.isDigit)) math.max(acc, tail.toLong)
      else acc
    }
  }

  /** [[landed]] extended across marker GC: a batch at or below the sink's
    * compaction horizon counts as landed (its rows live in the collapsed
    * dir; its marker was GC'd). Marker first — the O(1) steady-state —
    * then the horizon listing only on a miss.
    */
  def landedOrCollapsed(spark: SparkSession, indexPath: String, sink: String,
      batchId: Long): Boolean =
    landed(spark, indexPath, sink, batchId) ||
      batchId <= horizon(spark, indexPath, sink)

  /** Refuse to resume a sink written before the marker protocol: batches
    * that landed under the old dir-existence guard carry no markers, so
    * every one of them would replay as "never landed" and re-append
    * duplicates. Detection is O(1) steady-state: the glob only runs when
    * the sink has NO `_batches` directory at all (first contact), which
    * on a marker-era sink exists from its first batch onward.
    */
  def assertMarkeredSink(spark: SparkSession, indexPath: String,
      dataGlob: String): Unit = {
    val batches = new Path(s"$indexPath/_batches")
    val fs = batches.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(batches)) {
      val hits = fs.globStatus(new Path(dataGlob))
      if (hits != null && hits.nonEmpty)
        throw new IllegalStateException(
          s"$indexPath holds committed batches but no _batches markers — " +
            "written by a pre-marker version of this sink; replaying onto " +
            "it would duplicate every batch. Rebuild the sink (or create " +
            "markers for the landed batch ids) before resuming.")
    }
  }
}
