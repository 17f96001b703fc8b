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
  */
object BatchMarker {

  private def markerPath(indexPath: String, sink: String, batchId: Long) =
    new Path(s"$indexPath/_batches", s"${sink}_$batchId")

  def landed(spark: SparkSession, indexPath: String, sink: String,
      batchId: Long): Boolean = {
    val p = markerPath(indexPath, sink, batchId)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
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
}
