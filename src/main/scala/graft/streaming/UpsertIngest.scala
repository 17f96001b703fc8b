package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streamed keyed upsert as a CHANGELOG table — the merge-on-read shape
  * of [[graft.sinks.Upsert]] under the [[BatchMarker]] exactly-once
  * protocol: each micro-batch of (key, attrs) rows appends verbatim under
  * `log/batch_id=<b>/` (the batch id IS the version — monotone by the
  * streaming engine's contract), and the serving read resolves each key
  * to its highest-batch row with one per-key window. This is the
  * Hudi/Iceberg-style ingest posture: writes are pure appends at any
  * rate; read amplification grows with log depth and is paid back by
  * compacting the resolved view over the log
  * ([[graft.sinks.Upsert.merged]] of latest → fresh log).
  *
  * Within one batch the caller owes one row per key (the same contract
  * as [[graft.sinks.Upsert]] — enforce upstream with an
  * [[graft.operators.Expectations]] uniqueness check); across batches
  * later batch ids win, which is exactly upsert semantics.
  */
object UpsertIngest {

  def start(updates: DataFrame, tablePath: String, checkpoint: String,
      uniqueKey: Option[String] = None): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, tablePath, uniqueKey)
      }
      .start()

  /** One micro-batch, callable from tests and backfills directly.
    *
    * @param uniqueKey when set, the one-row-per-key-per-batch caller
    *   contract is ENFORCED: a batch carrying duplicate keys fails here,
    *   before anything lands, naming the offending keys — instead of the
    *   violation resolving silently (deterministically, but silently) at
    *   read time. One extra aggregation over the batch; leave None when
    *   the upstream already guarantees uniqueness.
    */
  def processBatch(batch: DataFrame, batchId: Long, tablePath: String,
      uniqueKey: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val log = s"$tablePath/log"
    BatchMarker.assertMarkeredSink(spark, tablePath, s"$log/batch_id=*")
    BatchMarker.ensureProtocol(spark, tablePath)
    recoverCompaction(spark, tablePath)
    // landedOrCollapsed: compaction GCs markers below its horizon; a
    // replay of a collapsed batch must still short-circuit
    if (BatchMarker.landedOrCollapsed(spark, tablePath, "log", batchId)) return
    BatchMarker.clearPartial(spark, s"$log/batch_id=$batchId")
    if (batch.isEmpty) {
      BatchMarker.commit(spark, tablePath, "log", batchId)
      return
    }
    uniqueKey.foreach { k =>
      val dups = batch.groupBy(col(k)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        .select(col(k)).limit(5).collect().map(_.get(0))
      if (dups.nonEmpty)
        throw new IllegalArgumentException(
          s"batch $batchId violates the one-row-per-key contract on '$k' " +
            s"(sample duplicate keys: ${dups.mkString(", ")}) — dedupe " +
            "upstream or drop uniqueKey to accept content-hash resolution")
    }
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("append").partitionBy("batch_id").parquet(log)
    BatchMarker.commit(spark, tablePath, "log", batchId)
  }

  /** Merge-on-read resolve: latest batch per key. One shuffle on the key;
    * the window ranks the few versions of one key, never the table.
    * Precondition: at least one data-bearing batch has landed — an
    * all-empty-batch log has no files and therefore no inferable schema,
    * so the read throws (Spark's own contract; a changelog table's schema
    * is unknowable before its first row).
    */
  def readLatest(spark: SparkSession, tablePath: String, keyCol: String): DataFrame = {
    recoverCompaction(spark, tablePath)
    latestPerKey(readLog(spark, tablePath), keyCol)
  }

  /** SCHEMA EVOLUTION contract: the log is read with `mergeSchema` — a
    * later batch may ADD columns (the additive half of evolution every
    * changelog store supports), and without the merged read Spark infers
    * the schema from an arbitrary file, silently dropping the new column
    * for every key depending on file order. With it, pre-evolution rows
    * surface NULL in the new columns deterministically. (Type changes and
    * drops remain the caller's migration problem, as everywhere.)
    */
  private def readLog(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(s"$tablePath/log")

  /** TIME TRAVEL: the table as of batch `asOfBatch` — the same per-key
    * resolve restricted to log rows with `batch_id <= asOfBatch` (the
    * batch id IS the version, so this is "the state after batch N
    * landed"). The batch_id partition-prunes the log scan, so an as-of
    * read lists only the surviving early directories. Retention horizon:
    * a compaction collapses all history into the highest landed id —
    * after it, as-of reads older than that id see an EMPTY (not stale)
    * state, exactly the lakehouse cleaning contract: time travel reaches
    * back only to the last compaction, and the caller trades read
    * amplification against history depth by choosing when to compact.
    */
  def readAsOf(spark: SparkSession, tablePath: String, keyCol: String,
      asOfBatch: Long): DataFrame = {
    recoverCompaction(spark, tablePath)
    latestPerKey(
      readLog(spark, tablePath).filter(col("batch_id") <= asOfBatch), keyCol)
  }

  /** INCREMENTAL consumption: the rows whose resolved state CHANGED
    * between two versions — semantically `readAsOf(to)` minus
    * `readAsOf(from)` by full row — so a downstream pipeline processes
    * per-key deltas instead of rescanning the table (updates surface with
    * their new attributes, inserts as new keys, CDC soft deletes as their
    * tombstone rows; a key untouched between the versions never appears).
    *
    * DELTA-SHAPED, not snapshot-diffed: only a key that appears in a
    * batch in `(from, to]` can differ between the endpoints, so the plan
    * is (1) a batch_id-partition-pruned scan of JUST the delta batches to
    * get the touched-key set, (2) a broadcast semi-join narrowing the log
    * to those keys (the delta key set is small by the
    * incremental-consumption premise), (3) the shared per-key resolve of
    * ONLY those keys at both endpoints, diffed. Cost is O(delta keys'
    * history), not O(2 × table) — the full log is never resolved
    * (PlanInvariantsSpec pins the partition filter and the semi-join).
    *
    * Same retention horizon as [[readAsOf]]: both endpoints must be at or
    * after the last compaction. The broadcast rides on that premise — a
    * consumer bootstrapping from the table's beginning should use
    * [[readAsOf]] (the full snapshot IS its answer), not a change read
    * whose "delta" is every key ever written.
    */
  def readChanges(spark: SparkSession, tablePath: String, keyCol: String,
      fromBatch: Long, toBatch: Long): DataFrame = {
    val (pre, post) = deltaEndpoints(spark, tablePath, keyCol, fromBatch, toBatch)
    post.exceptAll(pre)
  }

  /** The two bounded endpoint resolves every change read shares: the
    * touched-key set from a batch_id-partition-pruned scan of JUST the
    * `(from, to]` batches, semi-joined against the log (the batch_id
    * endpoint filters push through into the scans' partition filters),
    * then the shared per-key window at each endpoint. Lazy — callers
    * that consume an endpoint more than once materialize it themselves.
    */
  private[streaming] def deltaEndpoints(spark: SparkSession, tablePath: String,
      keyCol: String, fromBatch: Long, toBatch: Long): (DataFrame, DataFrame) = {
    require(fromBatch <= toBatch, "fromBatch must be <= toBatch")
    recoverCompaction(spark, tablePath)
    val log = readLog(spark, tablePath)
    val touched = log
      .filter(col("batch_id") > fromBatch && col("batch_id") <= toBatch)
      .select(col(keyCol)).distinct()
    val scoped = log.filter(col("batch_id") <= toBatch)
      .join(broadcast(touched), Seq(keyCol), "left_semi")
    (latestPerKey(scoped.filter(col("batch_id") <= fromBatch), keyCol),
      latestPerKey(scoped, keyCol))
  }

  /** CHANGE FEED between two versions — [[readChanges]] upgraded to the
    * Delta-CDF row convention: each changed key yields its post-image
    * tagged `insert` (no row at `from`) or `update_postimage`, and
    * updates ALSO yield the prior row tagged `update_preimage` — exactly
    * what a downstream INCREMENTAL consumer needs to maintain an
    * aggregate by retraction (subtract the pre-image, add the
    * post-image) instead of rescanning the table. Tombstone rows flow
    * like any update (soft-delete semantics ride in the payload, as
    * everywhere in this changelog).
    *
    * Same delta shape as [[readChanges]]: batch-pruned touched keys,
    * semi-joined resolve of ONLY those keys at both endpoints —
    * O(delta keys' history). Same retention horizon. The `_change_type`
    * column is appended last so the payload schema stays positionally
    * stable for consumers of either reader.
    */
  def readChangeFeed(spark: SparkSession, tablePath: String, keyCol: String,
      fromBatch: Long, toBatch: Long): DataFrame = {
    // the three image legs below consume each endpoint several times, and
    // Spark does not reuse the resolve subtree across them — so the feed
    // MATERIALIZES the two bounded endpoint frames (and the diff) once,
    // eagerly: O(delta) rows each by the incremental-consumption premise.
    // The delta plan shape itself stays pinned via readChanges
    // (etl_upsert_changes in PlanInvariantsSpec) and the deltaEndpoints
    // assertions in UpsertIngestSpec; the published feed plan carries NO
    // log scans at all — the proof the endpoints resolved exactly once.
    val (pre0, post0) =
      deltaEndpoints(spark, tablePath, keyCol, fromBatch, toBatch)
    val pre = pre0.localCheckpoint()
    val post = post0.localCheckpoint()
    // post-images whose full row differs from their pre-image (a key
    // re-upserted to identical values is NOT a change, matching
    // readChanges); split insert vs update on pre-key existence
    val changedPost = post.exceptAll(pre).localCheckpoint()
    val preKeys = pre.select(col(keyCol))
    val inserts = changedPost.join(broadcast(preKeys), Seq(keyCol), "left_anti")
      .withColumn("_change_type", lit("insert"))
    val updPost = changedPost.join(broadcast(preKeys), Seq(keyCol), "left_semi")
      .withColumn("_change_type", lit("update_postimage"))
    val updPre = pre.join(
        broadcast(changedPost.select(col(keyCol))), Seq(keyCol), "left_semi")
      .withColumn("_change_type", lit("update_preimage"))
    inserts.unionByName(updPost).unionByName(updPre)
  }

  /** Latest-batch-per-key resolve — the one window both [[readLatest]]
    * and [[compactLog]] use, so a compaction can never change which row
    * a key resolves to. Within one batch the caller owes one row per key;
    * a violation still resolves DETERMINISTICALLY (content-hash order
    * over the sorted column list, not file/task order), so reruns and
    * pre/post-compaction reads agree instead of flapping — and truly
    * identical duplicate rows tie harmlessly.
    */
  private def latestPerKey(log: DataFrame, keyCol: String): DataFrame = {
    val tie = xxhash64(log.columns.filter(_ != "batch_id").sorted.map(col): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("batch_id").desc, tie.desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "batch_id")
  }

  /** Changelog health: batch-dir depth and data-file count — the two
    * read-amplification axes. O(listing), no data read.
    */
  final case class LogStats(nBatches: Int, nFiles: Int, nBytes: Long,
                            maxBatchId: Long)

  def logStats(spark: SparkSession, tablePath: String): LogStats = {
    val log = new Path(s"$tablePath/log")
    val fs = log.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(log)) return LogStats(0, 0, 0L, -1L)
    val dirs = fs.listStatus(log).toIndexedSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
    val files = dirs.flatMap(d => fs.listStatus(d.getPath))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val maxId = dirs.map(_.getPath.getName.stripPrefix("batch_id=").toLong)
      .foldLeft(-1L)(math.max)
    LogStats(dirs.size, files.size, files.map(_.getLen).sum, maxId)
  }

  /** The compaction POLICY — the scheduler shape around [[compactLog]]:
    * collapse the changelog whenever its depth exceeds `maxBatches` OR its
    * file count exceeds `maxFiles`. Called between batches (foreachBatch
    * is serial per query, so the writer is quiesced exactly then — wire it
    * into the stream via [[startWithCompaction]] or call it from a
    * maintenance schedule). Returns whether a compaction ran. At crawl
    * cadence this bounds [[readLatest]]'s read amplification to
    * O(maxBatches) versions per key instead of O(all batches ever).
    */
  def maybeCompact(spark: SparkSession, tablePath: String, keyCol: String,
      maxBatches: Int = 16, maxFiles: Int = 256,
      targetBytes: Long = 128L << 20): Boolean =
    tableLock(tablePath).synchronized {
      recoverCompaction(spark, tablePath)
      // stats AFTER recovery (a rolled-forward swap changes both axes),
      // and computed ONCE — compactLogResolved reuses them instead of
      // re-listing the whole log
      val st = logStats(spark, tablePath)
      val due = st.nBatches > maxBatches || st.nFiles > maxFiles
      if (due) compactLogResolved(spark, tablePath, keyCol, targetBytes)
      due
    }

  /** [[start]] with the maintenance policy folded into the ingest loop:
    * after each batch lands, the policy check runs while the writer is
    * quiescent (foreachBatch delivers batches serially).
    */
  def startWithCompaction(updates: DataFrame, tablePath: String,
      checkpoint: String, keyCol: String, maxBatches: Int = 16,
      maxFiles: Int = 256, validateUnique: Boolean = false): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, tablePath,
          if (validateUnique) Some(keyCol) else None)
        maybeCompact(batch.sparkSession, tablePath, keyCol,
          maxBatches, maxFiles)
        ()
      }
      .start()

  /** Collapse the changelog to ONE batch holding the resolved view —
    * [[readLatest]] → fresh log, the merge-on-read debt payment. The
    * resolved rows land under the HIGHEST landed batch id, and every
    * existing `_batches` marker is preserved, so the exactly-once replay
    * contract survives: a replayed pre-compaction batch short-circuits on
    * its marker (its effects are already inside the resolved view), and
    * post-compaction batches keep winning on their higher ids.
    *
    * Crash safety (no multi-dir rename is atomic — the BatchMarker
    * lesson): the resolved view is staged under `_compact_tmp` first,
    * then an INTENT marker `_batches/compactlog_<id>` commits the
    * decision, then the old batch dirs are deleted and the staged dir
    * renamed in (one rename), then the intent is cleared.
    * [[recoverCompaction]] — called by [[processBatch]] and
    * [[readLatest]] — rolls an interrupted pass forward from the intent
    * marker: before the intent exists the old log is untouched (the pass
    * simply re-runs); after it, the staged view is the truth and recovery
    * finishes the swap. In-process entry points all serialize on a
    * per-table monitor, so concurrent serving reads can never interleave
    * one swap's non-idempotent steps. Caller contract: the writer is
    * quiescent (run it from the foreachBatch loop or a paused-stream
    * maintenance window), and — as for the append protocol itself — one
    * process owns the table's maintenance. UNMARKERED batch dirs
    * (crashed partials of never-committed batches) are cleared before
    * the resolve, never folded in: their batch will replay in full, and
    * a resolved view staged under a marker-less id would be deleted
    * wholesale by that replay's clearPartial.
    *
    * Output file sizing follows [[graft.sinks.Compaction]]: file count
    * from on-disk log bytes over `targetBytes` (an upper bound on the
    * resolved size — resolve only drops rows), via a shuffle-free
    * coalesce.
    */
  def compactLog(spark: SparkSession, tablePath: String, keyCol: String,
      targetBytes: Long = 128L << 20): Unit =
    tableLock(tablePath).synchronized {
      recoverCompaction(spark, tablePath)
      compactLogResolved(spark, tablePath, keyCol, targetBytes)
    }

  /** The pass proper — callers hold the table lock and have recovered. */
  private def compactLogResolved(spark: SparkSession, tablePath: String,
      keyCol: String, targetBytes: Long): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(tablePath).getFileSystem(conf)
    // UNMARKERED batch dirs are crashed partials of never-committed
    // batches: their rows will be re-appended when the batch replays, and
    // folding them into the resolved view would be fatal — the staged
    // view would land under an id with NO marker, so that batch's replay
    // clearPartial would delete the entire compacted table. Clear the
    // debris now (exactly what the replay itself would do first); the
    // quiescent-writer contract makes this safe.
    val log = new Path(s"$tablePath/log")
    if (fs.exists(log))
      fs.listStatus(log).toIndexedSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
        .filterNot(s => BatchMarker.landedOrCollapsed(spark, tablePath, "log",
          s.getPath.getName.stripPrefix("batch_id=").toLong))
        .foreach(s => fs.delete(s.getPath, true))
    val st = logStats(spark, tablePath) // marker-covered dirs only, now
    if (st.nBatches <= 1) return // already compact (or empty)
    val tmp = new Path(s"$tablePath/_compact_tmp")
    fs.delete(tmp, true) // pre-intent leftovers of a dead pass
    val nOut = math.max(1, math.ceil(st.nBytes.toDouble / targetBytes).toInt)
    // resolve via the shared window (not readLatest: keep this pass free
    // of the recovery re-entrance) and stage under the winning batch id's
    // hive dir name
    latestPerKey(readLog(spark, tablePath), keyCol)
      .coalesce(nOut)
      .write.mode("overwrite")
      .parquet(s"$tablePath/_compact_tmp/batch_id=${st.maxBatchId}")
    // COMMIT POINT: from here the staged view is the table's truth
    BatchMarker.commit(spark, tablePath, "compactlog", st.maxBatchId)
    finishCompaction(spark, tablePath, st.maxBatchId)
  }

  /** One monitor per table path: every recovery/compaction/serving-read
    * entry point serializes on it, so concurrent readers (readLatest
    * auto-recovers) can never interleave the non-idempotent steps of one
    * swap. CROSS-PROCESS exclusion is the caller's contract, exactly as
    * for the append protocol itself: one maintenance actor per table
    * (BatchMarker assumes a single writer; compaction assumes a single
    * recoverer the same way).
    */
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def tableLock(tablePath: String): Object =
    tableLocks.computeIfAbsent(tablePath, _ => new Object)

  /** Roll forward an interrupted [[compactLog]]: an intent marker without
    * its finished swap means the staged view (or the already-renamed log)
    * is the truth — finish the deletes/rename and clear the intent.
    * No-op in O(1) listing when no intent marker exists.
    */
  def recoverCompaction(spark: SparkSession, tablePath: String): Unit =
    tableLock(tablePath).synchronized {
      val batches = new Path(s"$tablePath/_batches")
      val fs = batches.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(batches)) return
      fs.listStatus(batches).toIndexedSeq
        .map(_.getPath.getName)
        .filter(_.startsWith("compactlog_"))
        .map(_.stripPrefix("compactlog_").toLong)
        .sorted
        .foreach(id => finishCompaction(spark, tablePath, id))
    }

  private def finishCompaction(spark: SparkSession, tablePath: String,
      maxBatchId: Long): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(tablePath).getFileSystem(conf)
    val staged = new Path(s"$tablePath/_compact_tmp/batch_id=$maxBatchId")
    val log = new Path(s"$tablePath/log")
    if (fs.exists(staged)) {
      // deletes are idempotent; the staged dir still holds the truth
      if (fs.exists(log))
        fs.listStatus(log).toIndexedSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
          .foreach(s => fs.delete(s.getPath, true))
      else fs.mkdirs(log)
      if (!fs.rename(staged, new Path(log, s"batch_id=$maxBatchId")))
        throw new IllegalStateException(
          s"compaction rename failed: $staged -> $log/batch_id=$maxBatchId")
    }
    // else: rename already happened in a previous attempt — only the
    // intent (and tmp debris) are left to clear
    fs.delete(new Path(s"$tablePath/_compact_tmp"), true)
    // marker GC below the horizon BEFORE the intent clears (idempotent —
    // a crash between the two just re-runs this roll-forward)
    BatchMarker.advanceHorizon(spark, tablePath, "log", maxBatchId)
    fs.delete(new Path(s"$tablePath/_batches/compactlog_$maxBatchId"), false)
  }
}
