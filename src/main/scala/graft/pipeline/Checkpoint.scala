package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable runs with ATOMIC commits, modeling Iceberg snapshot semantics
  * on plain filesystem primitives (no Iceberg runtime jar in this sandbox —
  * SURVEY.md §7; a real catalog swap is a `TableIO` config change):
  *
  *  - each commit is a `batch`: data files under `extracted/<batch>/`,
  *    manifest rows (url + per-partition lineage + metrics) under
  *    `_manifest/<batch>/`;
  *  - both are first written to dot-prefixed staging directories (hidden
  *    from every Spark/Hadoop reader), then published with two renames,
  *    DATA FIRST, MANIFEST LAST — the manifest rename is the single atomic
  *    commit point;
  *  - readers go through [[readExtracted]], which lists committed manifests
  *    and reads ONLY the data batches they reference. A crash between the
  *    two renames leaves an orphan data directory that no reader sees and
  *    whose urls the next run re-extracts into a fresh batch — exactly-once
  *    output, not at-least-once;
  *  - resume is a left-anti join of the input against committed manifest
  *    urls, so a re-submitted 10^12-row job re-reads only undone work.
  *
  * The north_rule's "checkpoints per-partition with lineage + metrics" maps
  * to manifest rows (url, spark_partition_id, n_chars, decode_failures,
  * batch) — enough to resume, attribute output to input splits, and roll up
  * run metrics without re-reading the output table.
  */
object Checkpoint {

  def manifestPath(outDir: String): String = s"$outDir/_manifest"
  def dataPath(outDir: String): String = s"$outDir/extracted"

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def newBatchId(): String =
    "batch_" + java.util.UUID.randomUUID.toString.replace("-", "").take(16)

  private def manifestRows(done: Dataset[ExtractedDoc], batch: String): DataFrame =
    done
      .select(col("url"), col("n_chars"), col("decode_failures"))
      .withColumn("part_id", spark_partition_id())
      .withColumn("batch", lit(batch))

  private def publish(spark: SparkSession, staging: String, target: String): Unit = {
    val fs = fsOf(spark, target)
    val dst = new Path(target)
    fs.mkdirs(dst.getParent)
    // stamp the commit time BEFORE the rename (rename preserves mtimes, so
    // without this Snapshot.commitMs would order concurrent committers by
    // when they STAGED, not when they committed). Stamping pre-rename means
    // a listed manifest always carries its stamped time — there is no
    // window where a published manifest is visible with a stale mtime; the
    // stamp trails the true commit point by at most the rename duration.
    // Best-effort: a filesystem without setTimes keeps the staging-write
    // mtime (documented on snapshots()).
    try fs.setTimes(new Path(staging), System.currentTimeMillis(), -1)
    catch { case _: Exception => () }
    if (!fs.rename(new Path(staging), dst))
      throw new IllegalStateException(s"commit rename failed: $staging -> $target")
  }

  /** Atomically commit a batch of extracted docs: stage data + manifest,
    * rename data into place, then rename the manifest — the commit point.
    * Returns the batch id. */
  def commitWithData(done: Dataset[ExtractedDoc], outDir: String): String = {
    val spark = done.sparkSession
    val batch = newBatchId()
    val dataStaging = s"${dataPath(outDir)}/.staging_$batch"
    val manStaging = s"${manifestPath(outDir)}/.staging_$batch"
    // the data write and the manifest write are two jobs over `done`; pin it
    // so (a) the (possibly expensive) upstream runs once and (b) a
    // nondeterministic upstream cannot produce a manifest whose url set
    // differs from the data actually written. Respect a caller's own cache.
    val wasCached = done.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    if (!wasCached) done.persist()
    try {
      // data goes through the TableIO format seam (spark.graft.table.format);
      // the manifest is engine bookkeeping and stays parquet
      done.toDF().write.format(tableFormat(spark)).save(dataStaging)
      manifestRows(done, batch).write.parquet(manStaging)
    } finally {
      if (!wasCached) done.unpersist()
    }
    publish(spark, dataStaging, s"${dataPath(outDir)}/$batch")
    publish(spark, manStaging, s"${manifestPath(outDir)}/$batch")
    batch
  }

  /** Manifest-only commit (marks urls done without writing output data —
    * e.g. work completed by an earlier system). Same atomic publish. */
  def commit(done: Dataset[ExtractedDoc], outDir: String): Unit = {
    val spark = done.sparkSession
    val batch = newBatchId()
    val manStaging = s"${manifestPath(outDir)}/.staging_$batch"
    manifestRows(done, batch = "").write.parquet(manStaging)
    publish(spark, manStaging, s"${manifestPath(outDir)}/$batch")
  }

  /** The ONE listing predicate for committed manifest entries: `batch_`
    * directories (new layout) and flat `part-` files (the pre-atomic
    * legacy layout — honored so an outDir written by an older run keeps
    * its resume/metrics validity; its rows read with a null `batch`).
    * Staging dirs are dot-prefixed and never listed. Every consumer
    * ([[committedManifests]], [[snapshots]]) goes through here. */
  private def manifestStatuses(spark: SparkSession, outDir: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val root = new Path(manifestPath(outDir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.filter(s =>
      (s.isDirectory && s.getPath.getName.startsWith("batch_")) ||
        (s.isFile && s.getPath.getName.startsWith("part-")))
  }

  private def committedManifests(spark: SparkSession, outDir: String): Seq[String] =
    manifestStatuses(spark, outDir).map(_.getPath.toString)

  private def readManifests(spark: SparkSession, dirs: Seq[String]): DataFrame =
    // mergeSchema: legacy manifests lack the `batch` column
    spark.read.option("mergeSchema", "true").parquet(dirs: _*)

  private def tableFormat(spark: SparkSession): String =
    spark.conf.get("spark.graft.table.format", "parquet")

  /** Rows of `pages` not yet present in any committed manifest. Left-anti on
    * `url`; the manifest side is small relative to the input and
    * broadcast-eligible per AQE, so resume adds no full shuffle of the page
    * table. Refuses to run while a [[compact]] holds the maintenance lock —
    * resuming inside the compaction window would re-extract urls whose
    * manifests are transiently absent and duplicate them permanently. */
  def resume(pages: Dataset[PageRow], outDir: String): Dataset[PageRow] = {
    val spark = pages.sparkSession
    assertNoMaintenance(spark, outDir)
    doneUrls(spark, outDir) match {
      case Some(d) => pages.join(d, Seq("url"), "left_anti").as[PageRow](pages.encoder)
      case None    => pages
    }
  }

  def doneUrls(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val dirs = committedManifests(spark, outDir)
    if (dirs.isEmpty) None
    else Some(readManifests(spark, dirs).select("url").distinct())
  }

  /** Distinct data-batch names referenced by the given manifests' ROWS
    * (manifest-only commits reference none; all-legacy manifests have no
    * `batch` column at all). */
  private def referencedBatches(spark: SparkSession, manifests: Seq[String]): Seq[String] =
    if (manifests.isEmpty) Nil
    else {
      val man = readManifests(spark, manifests)
      if (!man.columns.contains("batch")) Nil
      else man.select("batch").where(col("batch").isNotNull && col("batch") =!= "")
        .distinct().collect().map(_.getString(0)).toSeq
    }

  /** Assemble the output table from committed batch dirs plus (when a
    * LEGACY manifest vouches for them) the pre-atomic flat part-files
    * directly under `extracted/`. Legacy files predate the format seam and
    * are always parquet. Gating legacy data on legacy MANIFESTS — not on
    * any manifest — keeps exactly-once: a legacy run that crashed between
    * its data write and its manifest write left flat files that no
    * manifest vouches for; they stay invisible and their urls re-extract. */
  private def assembleTable(spark: SparkSession, outDir: String,
      batches: Seq[String], includeLegacy: Boolean): DataFrame = {
    val legacyFiles =
      if (!includeLegacy) Nil
      else {
        val root = new Path(dataPath(outDir))
        val fs = fsOf(spark, dataPath(outDir))
        if (!fs.exists(root)) Nil
        else fs.listStatus(root).toSeq
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          .map(_.getPath.toString)
      }
    val batchDf =
      if (batches.isEmpty) None
      else Some(spark.read.format(tableFormat(spark))
        .load(batches.map(b => s"${dataPath(outDir)}/$b"): _*))
    val legacyDf = if (legacyFiles.isEmpty) None else Some(spark.read.parquet(legacyFiles: _*))
    (batchDf, legacyDf) match {
      case (Some(b), Some(l)) => b.unionByName(l, allowMissingColumns = true)
      case (Some(b), None)    => b
      case (None, Some(l))    => l
      case (None, None)       =>
        // schema-carrying empty table, so .select("url")/.as[ExtractedDoc]
        // work on a fresh or manifest-only outDir
        spark.emptyDataset(org.apache.spark.sql.Encoders.product[ExtractedDoc]).toDF()
    }
  }

  /** The committed output table: data batches referenced by a committed
    * manifest — an orphan data directory from a crashed run is invisible —
    * plus the implicit legacy flat batch when a legacy manifest exists
    * (see [[assembleTable]]). Definitionally the as-of read at the end of
    * time, so the two read paths cannot drift apart. */
  def readExtracted(spark: SparkSession, outDir: String): DataFrame =
    readExtractedAsOf(spark, outDir, Long.MaxValue)

  /** One committed snapshot. `name` is the manifest entry ("" only for the
    * coalesced legacy snapshot); `commitMs` is the commit time ([[publish]]
    * stamps the manifest just before the rename; on a filesystem without
    * setTimes it degrades to the staging-write mtime, which still orders
    * single-committer histories correctly). Ties at millisecond
    * granularity order by name and are both included by an inclusive
    * as-of read. */
  final case class Snapshot(manifest: String, name: String, commitMs: Long)

  /** Commit history, oldest first — the Iceberg-snapshot analogue over the
    * manifest model: every committed manifest is one snapshot; the table
    * "as of" snapshot k is the union of the data batches referenced by
    * manifests 1..k. The pre-atomic legacy layout (flat part- manifest
    * files) is ONE logical commit regardless of its part-file count and
    * appears as a single snapshot with name = "" at its newest file's
    * mtime — as-of reads before that instant see none of the legacy data,
    * from it onward all of it. */
  def snapshots(spark: SparkSession, outDir: String): Seq[Snapshot] = {
    val (legacy, batchDirs) = manifestStatuses(spark, outDir).partition(_.isFile)
    val batchSnaps = batchDirs.map(s =>
      Snapshot(s.getPath.toString, s.getPath.getName, s.getModificationTime))
    val legacySnap =
      if (legacy.isEmpty) Nil
      else Seq(Snapshot(manifestPath(outDir), "", legacy.map(_.getModificationTime).max))
    (legacySnap ++ batchSnaps).sortBy(s => (s.commitMs, s.manifest))
  }

  /** Time travel: the committed output table as of `commitMs` — the same
    * manifest-gated read as [[readExtracted]] (data batches resolved from
    * the manifests' ROWS, so manifest-only commits contribute nothing and
    * legacy flat data participates exactly when a legacy manifest is in
    * range), restricted to the manifests published at or before that
    * instant. `readExtractedAsOf(outDir, snapshots.last.commitMs)` equals
    * `readExtracted(outDir)`. */
  def readExtractedAsOf(spark: SparkSession, outDir: String, commitMs: Long): DataFrame = {
    val keep = snapshots(spark, outDir).filter(_.commitMs <= commitMs)
    // only batch manifests carry batch references; the coalesced legacy
    // snapshot's `manifest` is the _manifest DIR and must not be globbed
    assembleTable(spark, outDir,
      referencedBatches(spark, keep.filter(_.name.nonEmpty).map(_.manifest)),
      includeLegacy = keep.exists(_.name.isEmpty))
  }

  def maintenanceLockPath(outDir: String): String = s"$outDir/_maintenance_lock"

  /** Acquire the advisory maintenance lock (atomic file create). A lock
    * older than `staleMs` is presumed crashed and replaced. Throws on a
    * live concurrent lock. */
  private def acquireMaintenanceLock(spark: SparkSession, outDir: String,
      staleMs: Long): Unit = {
    val fs = fsOf(spark, outDir)
    val p = new Path(maintenanceLockPath(outDir))
    fs.mkdirs(p.getParent)
    if (fs.exists(p)) {
      val age = System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
      if (age < staleMs)
        throw new IllegalStateException(
          s"maintenance already in progress on $outDir (lock age ${age} ms); " +
            "retry after it completes or remove a stale lock manually")
      fs.delete(p, false)
    }
    if (!fs.createNewFile(p))
      throw new IllegalStateException(s"lost the maintenance-lock race on $outDir")
  }

  private def releaseMaintenanceLock(spark: SparkSession, outDir: String): Unit =
    fsOf(spark, outDir).delete(new Path(maintenanceLockPath(outDir)), false)

  /** Acquire the maintenance lock, HEARTBEAT it (mtime refresh every
    * staleMs/4 from a daemon thread) while `body` runs, release on exit.
    * Without the heartbeat a maintenance step that outlives `staleMs`
    * loses lock protection mid-flight: [[assertNoMaintenance]] would let a
    * concurrent resume run inside compact's step-3/step-4 window (permanent
    * url duplication), and a second maintenance run would reclaim the LIVE
    * lock and operate concurrently. With it, `staleMs` only has to bound a
    * CRASHED holder's reclaim delay, not the step's duration. */
  private[graft] def withMaintenanceLock[A](spark: SparkSession, outDir: String,
      staleMs: Long)(body: => A): A = {
    require(staleMs >= 4000, s"maintenance lock staleMs=$staleMs too small to heartbeat")
    acquireMaintenanceLock(spark, outDir, staleMs)
    val fs = fsOf(spark, outDir)
    val p = new Path(maintenanceLockPath(outDir))
    val stop = new java.util.concurrent.CountDownLatch(1)
    val beat = new Thread(() => {
      while (!stop.await(staleMs / 4, java.util.concurrent.TimeUnit.MILLISECONDS)) {
        try fs.setTimes(p, System.currentTimeMillis(), -1)
        catch { case _: Exception => () } // lost lock surfaces via the holder's own failure
      }
    }, s"graft-maintenance-heartbeat")
    beat.setDaemon(true)
    beat.start()
    try body
    finally {
      stop.countDown()
      beat.join(5000)
      releaseMaintenanceLock(spark, outDir)
    }
  }

  /** Throws when a live maintenance lock is present — called by [[resume]]
    * so an incremental run cannot observe the transient "not done" window
    * of a concurrent [[compact]] and re-extract (then duplicate) its urls. */
  private[pipeline] def assertNoMaintenance(spark: SparkSession, outDir: String,
      staleMs: Long = MaintenanceLockStaleMs): Unit = {
    val fs = fsOf(spark, outDir)
    val p = new Path(maintenanceLockPath(outDir))
    if (fs.exists(p) &&
        System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime < staleMs)
      throw new IllegalStateException(
        s"maintenance in progress on $outDir — resume would re-extract " +
          "urls mid-compaction and duplicate them; retry when it completes")
  }

  val MaintenanceLockStaleMs: Long = 6L * 3600 * 1000

  /** Compact many small committed data batches into one size-targeted
    * batch — the Iceberg `rewrite_data_files` analogue for this sink
    * (small-file maintenance: a long-running incremental job commits many
    * batches, each a handful of files; readers then pay per-file open
    * cost). Ordering preserves the sink's crash contract ("done and
    * visible, or invisible and re-extractable; never duplicates") at
    * every step:
    *
    *  1. stage compacted data + its manifest;
    *  2. publish the DATA dir — an invisible orphan (readers follow only
    *     manifest-referenced batches);
    *  3. remove the replaced manifests — their urls become "not done"; a
    *     crash here costs re-extraction work, never correctness;
    *  4. publish the new manifest — the commit point;
    *  5. delete the replaced data dirs — garbage collection; a crash
    *     leaves invisible orphans.
    *
    * Concurrency: the steps are guarded by the advisory maintenance lock
    * (atomic create of `_maintenance_lock`), and [[resume]] REFUSES to run
    * while it is held — without that guard, a resume landing between steps
    * 3 and 4 would see the compacted urls as not-done, re-extract and
    * re-commit them, and the table would show them twice forever. Writers
    * that bypass this library's API must honor the lock themselves.
    * Concurrent READS during the window see a transiently partial table,
    * and a long-running read started before compaction can fail when step
    * 5 removes files under it (this sink has no immutable-metadata
    * snapshot isolation) — schedule maintenance accordingly.
    *
    * Two documented deviations from Iceberg's rewrite: snapshot HISTORY
    * collapses (the replaced manifests are gone, so time travel spans only
    * commits after the last compaction — a filesystem sink without a
    * metadata log cannot keep rewritten lineage alive), and manifest
    * `part_id` lineage is re-derived over the compacted layout (original
    * extraction partition attribution does not survive). Manifest-only
    * commits and the legacy flat layout are untouched. Returns the new
    * batch id; None when < 2 data batches exist. */
  def compact(spark: SparkSession, outDir: String,
      targetFileBytes: Long = 128L << 20,
      lockStaleMs: Long = MaintenanceLockStaleMs): Option[String] = {
    import spark.implicits._
    val mans = committedManifests(spark, outDir)
    val dataBatches = referencedBatches(spark, mans)
    if (dataBatches.size <= 1) return None
    withMaintenanceLock(spark, outDir, lockStaleMs) {
      val fs = fsOf(spark, outDir)
      val dataDirs = dataBatches.map(b => s"${dataPath(outDir)}/$b")
      val totalBytes = dataDirs
        .map(d => fs.getContentSummary(new Path(d)).getLength).sum
      val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
      val batch = newBatchId()
      val dataStaging = s"${dataPath(outDir)}/.staging_$batch"
      val manStaging = s"${manifestPath(outDir)}/.staging_$batch"
      val source = spark.read.format(tableFormat(spark)).load(dataDirs: _*)
      // coalesce only shrinks; growing past the read parallelism (small
      // target on big input) needs a real repartition
      val sized =
        if (nFiles < source.rdd.getNumPartitions) source.coalesce(nFiles)
        else if (nFiles > source.rdd.getNumPartitions) source.repartition(nFiles)
        else source
      sized.write.format(tableFormat(spark)).save(dataStaging)
      // manifest rows re-derive from the compacted data: the url set equals
      // the union of the replaced batches' data by construction
      manifestRows(spark.read.format(tableFormat(spark)).load(dataStaging)
        .as[ExtractedDoc], batch).write.parquet(manStaging)
      publish(spark, dataStaging, s"${dataPath(outDir)}/$batch") // step 2
      // commitWithData names each manifest dir after its one data batch, so
      // the replaced manifests are exactly those named by a compacted batch
      // (manifest-only and legacy entries never carry such a name) — a pure
      // name check, no per-manifest read jobs
      val replaced = mans.filter(m => dataBatches.contains(new Path(m).getName))
      replaced.foreach(m => fs.delete(new Path(m), true)) // step 3
      publish(spark, manStaging, s"${manifestPath(outDir)}/$batch") // step 4
      dataDirs.foreach(d => fs.delete(new Path(d), true)) // step 5
      Some(batch)
    }
  }

  /** Remove orphaned sink artifacts — (a) data-batch directories no
    * committed manifest references (crash leftovers from the window
    * between a data publish and its manifest publish, or from [[compact]]
    * step 5 dying) and (b) `.staging_*` dirs under both the data and
    * manifest roots (a commit or compact that died mid-write) — the
    * Iceberg `remove_orphan_files` analogue. Only artifacts older than
    * `graceMs` are touched: an IN-FLIGHT commit's data dir is briefly
    * unreferenced and its staging dir briefly present by design, so a
    * concurrent committer inside the grace window is never broken. The
    * legacy flat files (vouched by legacy manifests, not batch
    * references) are never touched. Returns the removed names.
    *
    * Vacuum runs UNDER the maintenance lock: without it, a vacuum with a
    * small `graceMs` racing a concurrent [[compact]] could delete the
    * just-published compacted data dir (unreferenced between compact's
    * steps 2 and 4), after which step 4 commits a manifest referencing
    * deleted data — permanent loss. Holding the lock serializes the two
    * maintenance operations (and, via [[assertNoMaintenance]], briefly
    * blocks resume — vacuum is a listing pass, so the window is short);
    * the manifest referencing step-2 data can then never land mid-vacuum. */
  def vacuum(spark: SparkSession, outDir: String,
      graceMs: Long = 24L * 3600 * 1000,
      lockStaleMs: Long = MaintenanceLockStaleMs): Seq[String] =
    withMaintenanceLock(spark, outDir, lockStaleMs) {
      val fs = fsOf(spark, outDir)
      val cutoff = System.currentTimeMillis() - graceMs
      def removeUnder(root: Path, keep: String => Boolean): Seq[String] =
        if (!fs.exists(root)) Nil
        else fs.listStatus(root).toSeq
          .filter(st => st.isDirectory && !keep(st.getPath.getName) &&
            st.getModificationTime < cutoff)
          .map { st => fs.delete(st.getPath, true); st.getPath.getName }
      val referenced = referencedBatches(spark, committedManifests(spark, outDir)).toSet
      removeUnder(new Path(dataPath(outDir)),
        name => !(name.startsWith("batch_") && !referenced.contains(name)) &&
          !name.startsWith(".staging_")) ++
        removeUnder(new Path(manifestPath(outDir)),
          name => !name.startsWith(".staging_"))
    }

  /** Run-level metrics rollup from the committed manifests. */
  def metrics(spark: SparkSession, outDir: String): DataFrame = {
    val dirs = committedManifests(spark, outDir)
    require(dirs.nonEmpty, s"no committed manifests under ${manifestPath(outDir)}")
    readManifests(spark, dirs)
      .agg(
        count(lit(1)).as("docs_done"),
        sum("n_chars").as("total_chars"),
        sum("decode_failures").as("total_decode_failures"))
  }
}
