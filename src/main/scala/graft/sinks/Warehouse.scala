package graft.sinks

import graft.sources.{LayoutSpec, Sdf}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100 TB sink: a parquet warehouse with an idempotent,
  * file-granularity ingest manifest.
  *
  * Mirrors the reference's incremental bookkeeping — the `sdf_file`
  * table (/root/reference/pubchem2sqlite/utils.py:222) and
  * `get_sdf_files_not_in_db` (utils.py:272) — but cluster-safe: the
  * manifest is itself a small parquet table, the "files not yet
  * loaded" set is a local anti-filter over the driver-side file
  * listing (thousands of filenames, not data rows), and compound
  * rows are appended partition-parallel.
  *
  * Divergence from the reference, on purpose: lowest/highest CID are
  * computed from the DATA (min/max of extracted cid per file), not
  * parsed out of the filename (utils.py:330) — filename-derived
  * ranges silently break on any non-PubChem naming scheme.
  */
object Warehouse {
  final case class IngestResult(filesLoaded: Seq[String], rowsLoaded: Long)

  def compoundsDir(warehouseDir: String): String = s"$warehouseDir/compounds"
  def manifestDir(warehouseDir: String): String = s"$warehouseDir/_manifest"

  /** Cross-JVM writer lease file at the warehouse root, shared by
    * ingest and compact (see [[graft.FsLease]]): the manifest append
    * and the compaction swap both assume a single writer, and the
    * unrecoverable compact crash state (dir+old+tmp all present) is
    * precisely an ingest interleaving a compaction — one lease for
    * both writers makes that state unreachable instead of merely
    * documented. */
  private[graft] val WriterLockName = "_graft_writer_lock"

  private def withWriterLease[T](spark: SparkSession, warehouseDir: String)(body: => T): T = {
    val root = new Path(warehouseDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    graft.FsLease.withLease(fs, root, WriterLockName)(body)
  }

  /** Manifest rows: filename, lowest_cid, highest_cid, date_added,
    * n_compounds — the sdf_file schema (utils.py:222-227). */
  def manifest(spark: SparkSession, warehouseDir: String): DataFrame = {
    val path = new Path(manifestDir(warehouseDir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // schema memo (r20): the manifest is a flat unpartitioned dir and
    // every warehouse entry re-reads it several times per run — the
    // bare read re-paid a footer-inference job each time. The memo
    // keys on the file listing, so an appended manifest re-infers.
    if (fs.exists(path)) graft.Tables.parquetCached(spark, path.toString)
    else spark.emptyDataFrame
  }

  /** Point lookup by primary key — the reference's headline query
    * (indexed cid lookup: the SQLite pk + WITH_INDEX role,
    * utils.py:181,334) at warehouse scale. The manifest's per-file
    * [lowest_cid, highest_cid] spans ARE the index: a driver-side
    * scan of the manifest (file-count-sized — the same bounded table
    * the ingest skip-set reads) picks candidate source files, the
    * isin predicate on the PARTITION column prunes the compounds
    * scan to those directories statically, and the pushed pk filter
    * plus parquet row-group stats finish inside them. At 100 TB the
    * data touched is O(one partition), not O(corpus); plan-pinned
    * (partition filters present, pk pushed). */
  /** Span-matching files above which the lookup stops inlining the
    * prune set as an `isin` literal: on a healthy warehouse the
    * per-file [lowest, highest] spans barely overlap and a pk
    * matches O(1) files, but a pathologically interleaved ingest
    * history could match the whole manifest — collecting millions of
    * names to build a million-term predicate would hurt both driver
    * memory and planning. Past the cap the lookup falls back to the
    * pushed pk filter alone (row-group stats still skip most of the
    * corpus); the static partition prune is an optimization, never a
    * correctness dependency. */
  val MaxLookupPruneFiles = 10000

  def lookup(spark: SparkSession, warehouseDir: String, cid: Long,
             layout: LayoutSpec = LayoutSpec.default): DataFrame = {
    val pk = layout.columns.find(_.primaryKey).map(_.name)
      .getOrElse(layout.columns.head.name)
    val files = manifest(spark, warehouseDir)
      .filter(col("lowest_cid") <= cid && col("highest_cid") >= cid)
      .select("filename").limit(MaxLookupPruneFiles + 1)
      .collect().map(_.getString(0)).toSeq
    val compounds = spark.read.parquet(compoundsDir(warehouseDir))
    if (files.isEmpty) compounds.filter(lit(false))
    else if (files.length > MaxLookupPruneFiles) compounds.filter(col(pk) === cid)
    else compounds.filter(col("src_filename").isin(files: _*) && col(pk) === cid)
  }

  /** Secondary-index lookup — the reference's OTHER headline query
    * (WITH_INDEX columns like InChIKey, utils.py:334): no manifest
    * span exists for a non-pk key, so the index is a BUCKETED
    * published table ([[publishBucketed]] with `key` = the indexed
    * column). An equality filter on the bucket column lets Spark's
    * bucket pruning select ONE bucket's files statically
    * (SelectedBucketsCount: 1 out of N in the scan), the pushed
    * filter plus the per-bucket sortBy's row-group stats finish
    * inside it — at 100 TB the read is corpus/N-buckets, sized by
    * the bucket count chosen at publish time (thousands at
    * warehouse scale). Plan-pinned in SinksSpec.
    *
    * Spark's autoBucketedScan heuristic only credits bucketing that
    * AVOIDS A SHUFFLE, so it disables the bucketed scan under a pure
    * filter — discarding exactly the bucket PRUNING this lookup is
    * for. The plan is therefore forced (queryExecution.executedPlan
    * is memoized) under a THREAD-LOCAL conf override
    * ([[org.apache.spark.sql.graftbridge.ConfBridge]]): planner
    * rules read `SQLConf.get`, which consults the thread-local
    * first, so concurrent planning on the same session never
    * observes the flipped value (ADVICE r13 — the previous
    * set/restore on the shared session conf was racy and re-wrote
    * an explicit value even when the conf had been unset). */
  def lookupIndexed(spark: SparkSession, table: String, key: String,
                    value: String): DataFrame = {
    val df = spark.table(table).filter(col(key) === value)
    org.apache.spark.sql.graftbridge.ConfBridge.withConfOverrides(spark,
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      df.queryExecution.executedPlan
    }
    df
  }

  /** Manifest rows above which the skip set is no longer collected
    * to the driver: beyond it, pending files come from a distributed
    * anti-join instead (only the PENDING names — bounded by the new
    * work per run — ever reach the driver). */
  val ManifestCollectMax = 100000

  /** Files under `all` not yet recorded in the manifest. Small
    * manifests (the PubChem scale the reference documents —
    * thousands of files) use a driver-side Set, one collect, same as
    * the reference's `get_sdf_files_not_in_db`. A manifest past
    * `ManifestCollectMax` rows switches to a left-anti join of the
    * listing against the manifest table, so a million-file warehouse
    * never materializes its full history on the driver. The probe
    * `limit(max + 1)` makes the choice without a separate count
    * job. */
  private def pendingFiles(spark: SparkSession, warehouseDir: String,
                           all: Seq[String]): Seq[String] = {
    val m = manifest(spark, warehouseDir)
    if (!m.columns.contains("filename")) return all.sorted
    val probe = m.select("filename").limit(ManifestCollectMax + 1)
      .collect().map(_.getString(0))
    if (probe.length <= ManifestCollectMax) {
      val done = probe.toSet
      all.filterNot(f => done.contains(basename(f))).sorted
    } else {
      import spark.implicits._
      all.map(p => (p, basename(p))).toDF("path", "filename")
        .join(m.select("filename"), Seq("filename"), "left_anti")
        .select("path").as[String].collect().toSeq.sorted
    }
  }

  /** List input files matching the glob (driver-side metadata op —
    * O(#files), same as the reference's glob at utils.py:308). */
  def listSdfFiles(spark: SparkSession, glob: String): Seq[String] = {
    val path = new Path(glob)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(path)).map(_.toSeq.map(_.getPath.toString)).getOrElse(Nil)
  }

  private def basename(p: String): String = p.substring(p.lastIndexOf('/') + 1)

  /** Ingest every not-yet-loaded file under `glob` into the
    * warehouse: extract per `layout`, append to compounds/, append
    * per-file stats to the manifest. Re-running with the same inputs
    * is a no-op (the skip set is filename-based, matching
    * `get_sdf_files_not_in_db` utils.py:282). */
  def ingest(spark: SparkSession, glob: String, warehouseDir: String,
             layout: LayoutSpec = LayoutSpec.default): IngestResult = {
    val all = listSdfFiles(spark, glob)
    // lease held across pending-set computation + data write +
    // manifest append: a concurrent ingest/compact against the same
    // root fails loudly instead of double-appending manifest rows or
    // racing the compaction swap. The pending set MUST be computed
    // inside the lease — reading the manifest before acquisition
    // could miss an in-flight writer's append and re-ingest its
    // files the moment it releases.
    withWriterLease(spark, warehouseDir) {
      val todo = pendingFiles(spark, warehouseDir, all)
      if (todo.isEmpty) IngestResult(Nil, 0L)
      else ingestFiles(spark, todo, warehouseDir, layout)
    }
  }

  /** Streaming twin of [[ingest]] (round 19, VERDICT r18 item 7):
    * SDF file ARRIVAL drives the warehouse — `readStream.text` with
    * the `$$$$` record delimiter watches the glob, and each
    * micro-batch lands through the SAME per-file transaction the
    * batch path uses, under `Trigger.AvailableNow` (drain what has
    * arrived, then stop — the nightly-ingest shape; a `new File
    * every N minutes` deployment just swaps the trigger).
    *
    * The manifest skip-set stays the source of truth, NOT the
    * stream's checkpoint: inside the writer lease each batch's file
    * list passes through [[pendingFiles]] before any write, so a
    * FRESH checkpoint over already-ingested files is a no-op (the
    * reference's own re-run semantics, utils.py:272) and a batch
    * ingest interleaved with streaming cannot double-load. The file
    * source schedules whole files per micro-batch, so the per-file
    * manifest rows (span + count) are computed from complete record
    * sets — the same single-pass stats as the batch path.
    *
    * A file the micro-batches cannot SEE still needs its manifest
    * row (ADVICE r19): the batch list is derived from the record
    * frame, which is post-cid-filter — an SDF file with zero
    * parseable CIDs (or zero bytes) contributes no rows to any
    * batch, so the foreachBatch loop alone would never manifest it
    * and every fresh-checkpoint run would re-read it, diverging
    * from the batch path's "every PROCESSED file gets a manifest
    * row" guarantee. After the stream drains, a catch-up sweep
    * re-lists the glob and runs the ordinary batch transaction over
    * whatever is still unmanifested — on the normal path that
    * pending set is empty (one bounded manifest probe, no data
    * read), and on the degenerate path it lands the n_compounds=0
    * rows exactly as batch ingest would.
    *
    * Scale shape: identical to N successive [[ingest]] calls — the
    * stream adds arrival tracking, not a new write path. Returns
    * the files loaded across all micro-batches plus the catch-up
    * sweep. */
  def ingestStream(spark: SparkSession, glob: String, warehouseDir: String,
                   checkpoint: String,
                   layout: LayoutSpec = LayoutSpec.default): Seq[String] = {
    import org.apache.spark.sql.streaming.Trigger
    val loaded = scala.collection.mutable.ArrayBuffer.empty[String]
    val records = Sdf.records(
      spark.readStream.option("lineSep", "$$$$").text(glob))
    val q = records.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // distinct file list of this batch: bounded by files-per-
        // trigger, the unit the source schedules
        val files = batch.select(col("src_file")).distinct()
          .collect().map(_.getString(0)).toSeq
        if (files.nonEmpty) withWriterLease(spark, warehouseDir) {
          val todo = pendingFiles(spark, warehouseDir, files)
          if (todo.nonEmpty) {
            val r = ingestFrame(spark,
              batch.filter(col("src_file").isin(todo: _*)), todo,
              warehouseDir, layout)
            loaded.synchronized { loaded ++= r.filesLoaded }
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
    // catch-up sweep for record-less files (see scaladoc): the same
    // batch transaction, a no-op when the micro-batches manifested
    // everything the glob matches
    val swept = ingest(spark, glob, warehouseDir, layout)
    loaded.toSeq ++ swept.filesLoaded
  }

  private def ingestFiles(spark: SparkSession, todo: Seq[String], warehouseDir: String,
                          layout: LayoutSpec): IngestResult =
    // One distributed read over exactly the pending files. Keeping
    // src_file through extraction lets both the manifest stats and
    // the append happen in a single pass over the data.
    ingestFrame(spark, Sdf.read(spark, todo), todo, warehouseDir, layout)

  /** Core of one ingest transaction over an already-read record
    * frame (sdf, src_file, cid rows covering exactly `todo`) —
    * shared by the batch path (which reads the pending files
    * itself) and the streaming path (whose micro-batch already
    * holds the records). Caller holds the writer lease. */
  private def ingestFrame(spark: SparkSession, read: DataFrame, todo: Seq[String],
                          warehouseDir: String, layout: LayoutSpec): IngestResult = {
    val extracted = Sdf.filterNotNull(
      read.select(Seq(col("src_file")) ++
        layout.columns.map(c => Sdf.extractColumn(col("sdf"), c)): _*),
      layout)
    extracted.cache()
    try {
      val pk = layout.columns.find(_.primaryKey).map(_.name).getOrElse(layout.columns.head.name)
      // Compounds are PARTITIONED BY SOURCE FILENAME and written with
      // dynamic partition overwrite: the manifest append (below)
      // happens after the data write, so a crash between the two
      // leaves the file un-manifested — and the re-run then
      // OVERWRITES that file's partition instead of duplicating its
      // rows. Per-file reprocessing also gets partition pruning.
      extracted
        .withColumn("src_filename", element_at(split(col("src_file"), "/"), -1))
        .drop("src_file")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("src_filename")
        .parquet(compoundsDir(warehouseDir))
      // Every PROCESSED file gets a manifest row — even one whose
      // rows were all NOT_NULL-filtered (n_compounds = 0). Otherwise
      // such a file would be re-read on every ingest, forever.
      import spark.implicits._
      val processed = todo.map(basename).toDF("filename")
      val stats = extracted
        .groupBy(element_at(split(col("src_file"), "/"), -1).as("filename"))
        .agg(min(col(pk)).as("lowest_cid"), max(col(pk)).as("highest_cid"),
          count(lit(1)).as("n_compounds"))
      processed.join(stats, Seq("filename"), "left")
        .na.fill(0L, Seq("n_compounds"))
        .withColumn("date_added", date_format(current_date(), "yyyy-MM-dd"))
        .select("filename", "lowest_cid", "highest_cid", "date_added", "n_compounds")
        .write.mode("append").parquet(manifestDir(warehouseDir))
      val rows = extracted.count()
      IngestResult(todo.map(basename), rows)
    } finally extracted.unpersist()
  }

  /** The live compounds table. src_filename is pinned to string at
    * the source: partition-column type inference would narrow an
    * all-digit filename corpus to a numeric type, and every consumer
    * that round-trips partition VALUES back into partition PATHS
    * (retract's staged rewrite, compact's sizing join) needs the
    * lexical form preserved ('00123', not 123). The pin costs a
    * second relation resolution only in the degenerate all-digit
    * case — real SDF names carry '.sdf' and infer string, so the
    * guard is a schema check on the already-resolved read. */
  def compounds(spark: SparkSession, warehouseDir: String): DataFrame = {
    val df = spark.read.parquet(compoundsDir(warehouseDir))
    val needsPin = df.schema.exists(f =>
      f.name == "src_filename" && f.dataType != org.apache.spark.sql.types.StringType)
    if (!needsPin) df
    else spark.read.schema(org.apache.spark.sql.types.StructType(df.schema.map(f =>
      if (f.name == "src_filename") f.copy(dataType = org.apache.spark.sql.types.StringType)
      else f))).parquet(compoundsDir(warehouseDir))
  }

  /** Drop-and-recreate semantics of the reference's
    * `initialize_db(reset=True)` (utils.py:217-219): removes the
    * compounds data, the ingest manifest, AND any catalog tables
    * published from this warehouse — the reference drops the
    * compounds table outright, so published surfaces must not keep
    * serving pre-reset rows. */
  def reset(spark: SparkSession, warehouseDir: String,
            publishedTables: Seq[String] = Nil): Unit = {
    publishedTables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new Path(warehouseDir)
    val fs = base.getFileSystem(conf)
    val dirs = Seq(compoundsDir(warehouseDir), manifestDir(warehouseDir)).map(new Path(_)) ++
      publishedTables.map(t => new Path(s"$warehouseDir/bucketed_$t"))
    dirs.foreach(p => if (fs.exists(p)) fs.delete(p, true))
  }

  /** Compact the compounds table's accumulated small files: rewrites
    * each src_filename partition into ~`targetFileBytes` output
    * files. Incremental per-file ingest writes one file set per
    * source SDF per run; at warehouse scale thousands of tiny files
    * tax the metadata service and every scan's split planning. The
    * rewrite goes to a sibling temp directory and swaps in with two
    * renames, under the shared writer lease (a concurrent ingest or
    * second compactor fails loudly at acquisition — round 8; before
    * that, single-writer was an honor-system assumption); the
    * manifest is untouched, so incremental ingest semantics survive
    * compaction unchanged.
    *
    * Sizing is driven by a driver-side file listing (a metadata op,
    * O(#files)): partitions get ceil(bytes/target) output files via
    * a salted repartition, so a hot partition still splits while
    * small ones collapse to one file. Returns the new file count. */
  def compact(spark: SparkSession, warehouseDir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Long =
    // same lease as ingest: the swap and the crash-recovery renames
    // assume no other writer; a second compactor or a concurrent
    // ingest now fails loudly at acquisition
    withWriterLease(spark, warehouseDir)(compactLocked(spark, warehouseDir, targetFileBytes))

  private def compactLocked(spark: SparkSession, warehouseDir: String,
                            targetFileBytes: Long): Long = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(compoundsDir(warehouseDir))
    val fs = dir.getFileSystem(conf)
    val tmp = new Path(s"${compoundsDir(warehouseDir)}.compact_tmp")
    val old = new Path(s"${compoundsDir(warehouseDir)}.compact_old")
    // Leftovers mean a previous compaction crashed. Every crash
    // state is mechanically recoverable under the documented
    // single-writer assumption, so recover instead of refusing
    // (round 3 refused outright, which left a crash between the two
    // swap renames with NO table at the canonical path and no
    // automated way back):
    //  - dir present + tmp leftover (no old): crash before the swap
    //    began — dir is still the canonical full table; the rewrite
    //    is derived data, safe to discard and redo.
    //  - dir absent + old + tmp: crash BETWEEN the renames. tmp
    //    passed the row-preservation gate before the swap started,
    //    so completing the swap (tmp → dir, drop old) is exactly the
    //    interrupted operation.
    //  - dir present + old leftover + NO tmp: crash after the swap,
    //    before the cleanup delete (tmp is gone because the swap-in
    //    rename consumed it) — dir is the compacted full table;
    //    finish the delete.
    //  - dir present + old + tmp ALL exist: NOT a pure compact crash
    //    — the only writer that re-creates dir while old+tmp survive
    //    is an ingest that ran after a between-renames crash, so dir
    //    holds ONLY post-crash partitions while old/tmp hold the
    //    full pre-crash table. No mechanical merge is safe (blind
    //    restore would drop the manifested post-crash ingests; blind
    //    cleanup would delete the only full copies) — refuse loudly.
    //  - dir absent + old only: the stage-aside rename succeeded but
    //    the swap never started (or tmp was lost) — old IS the
    //    canonical table; restore it.
    if (fs.exists(old)) {
      if (fs.exists(dir)) {
        require(!fs.exists(tmp),
          s"compact: $dir, $old and $tmp all exist — an ingest ran after a mid-swap " +
            "compaction crash, so the canonical directory holds only post-crash " +
            "partitions. Manually merge (restore old, re-ingest the new partitions " +
            "from dir) before compacting again.")
        fs.delete(old, true)
      }
      else if (fs.exists(tmp)) {
        require(fs.rename(tmp, dir), s"compact: recovery could not complete swap $tmp -> $dir")
        fs.delete(old, true)
      } else require(fs.rename(old, dir), s"compact: recovery could not restore $old -> $dir")
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (!fs.exists(dir)) return 0L
    // bytes per partition directory (src_filename=<escaped value>) —
    // names must be UNESCAPED before matching against column VALUES
    // (Spark percent-escapes special chars in partition paths; a raw
    // compare would orphan those partitions' rows)
    val partSizes = fs.listStatus(dir).filter(_.isDirectory).map { st =>
      val name = st.getPath.getName
      val bytes = fs.listStatus(st.getPath).filter(_.isFile).map(_.getLen).sum
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(name.substring(name.indexOf('=') + 1)) -> bytes
    }.toSeq
    if (partSizes.isEmpty) return 0L
    val nOut = partSizes
      .map { case (p, b) => (p, math.max(1L, (b + targetFileBytes - 1) / targetFileBytes)) }
    val targets = nOut.toDF("src_filename", "n_out")
    val data = spark.read.parquet(dir.toString)
    // salt on a data column's hash: deterministic spread of a hot
    // partition across its n_out output files. LEFT join + coalesce:
    // a partition that somehow missed the sizing list still keeps
    // every row (in one file) rather than being dropped.
    val saltSrc = data.columns.find(_ != "src_filename")
      .getOrElse(sys.error("compact: no data columns"))
    val shuffleParts = math.max(spark.sparkContext.defaultParallelism.toLong,
      nOut.map(_._2).sum).min(Int.MaxValue).toInt
    data
      .join(broadcast(targets), Seq("src_filename"), "left")
      .withColumn("__salt", pmod(xxhash64(col(saltSrc)), coalesce(col("n_out"), lit(1L))))
      // explicit partition count: the default would cap the spread at
      // spark.sql.shuffle.partitions, merging salt groups of hot
      // partitions into files far above the target size
      .repartition(shuffleParts, col("src_filename"), col("__salt"))
      .drop("__salt", "n_out")
      .write.mode("overwrite").partitionBy("src_filename").parquet(tmp.toString)
    // row-preservation gate BEFORE the destructive swap: a rewrite
    // that lost rows (a future join/escape bug) must abort with both
    // directories intact, never replace the table
    val (nOld, nNew) = (data.count(), spark.read.parquet(tmp.toString).count())
    require(nOld == nNew, s"compact: rewrite has $nNew rows, source has $nOld — aborting, no swap")
    require(fs.rename(dir, old), s"compact: could not stage $dir aside")
    require(fs.rename(tmp, dir), s"compact: could not swap in $tmp")
    fs.delete(old, true)
    fs.listStatus(dir).filter(_.isDirectory)
      .map(p => fs.listStatus(p.getPath).count(s => s.isFile && s.getPath.getName.endsWith(".parquet")))
      .sum
  }

  final case class RetractResult(partitionsRewritten: Seq[String],
                                 partitionsDropped: Seq[String],
                                 rowsRetracted: Long)

  /** Takedown for the compounds warehouse (round 18 — the
    * reference-surface symmetry of [[graft.operators.Retract]]):
    * delete a CID set from the published partitioned table and
    * repair the ingest manifest's per-file spans, WITHOUT touching
    * any partition the set does not hit.
    *
    * The takedown batch is a bounded, human-generated list
    * (thousands at most), so it rides as a broadcast relation. Work
    * is scoped by the same index the point lookup uses — the
    * manifest's [lowest_cid, highest_cid] spans: a broadcast range
    * join of the span table (file-count-sized) against the CID set
    * names the candidate source files, the scan prunes statically to
    * those partitions, and ONE pass over them yields, per file, the
    * retracted count and the survivors' new span. At 100 TB the data
    * read is O(partitions hit), never O(corpus).
    *
    * Repairs, in crash-safe order under the shared writer lease:
    *  1. partitions with survivors STAGE to a sibling tmp dir,
    *     where a delete-only row-count gate verifies the survivors
    *     before any live byte changes (round 19 — the r18 form
    *     checked after the commit, which detects but cannot
    *     prevent); only the verified staged bytes then commit via
    *     dynamic partition overwrite (per-write option — untouched
    *     partitions keep their files byte for byte);
    *  2. partitions emptied by the takedown are deleted outright;
    *  3. the manifest rewrites through a tmp + two-rename swap (the
    *     [[compact]] pattern): affected files keep their row and
    *     date_added but carry the survivors' lowest/highest span
    *     (null when emptied) and n_compounds — the row STAYS even at
    *     n_compounds = 0, because manifest presence is what makes
    *     re-ingest skip the file (the reference's own all-filtered
    *     semantics, utils.py:272); dropping it would resurrect the
    *     retracted rows on the next ingest run.
    * A crash between 1/2 and 3 leaves stale (wider) spans over
    * repaired data: lookups stay correct (spans are a prune, the pk
    * filter decides membership) and re-running retract converges —
    * including for a partition deleted before its manifest row was
    * repaired (the re-run detects the missing directory and repairs
    * the row to n_compounds = 0). */
  def retract(spark: SparkSession, warehouseDir: String, cids: Seq[Long],
              layout: LayoutSpec = LayoutSpec.default): RetractResult =
    withWriterLease(spark, warehouseDir)(retractLocked(spark, warehouseDir, cids, layout))

  private def retractLocked(spark: SparkSession, warehouseDir: String, cids: Seq[Long],
                            layout: LayoutSpec): RetractResult = {
    import spark.implicits._
    val pk = layout.columns.find(_.primaryKey).map(_.name)
      .getOrElse(layout.columns.head.name)
    val conf = spark.sparkContext.hadoopConfiguration
    val dataDir = new Path(compoundsDir(warehouseDir))
    val fs = dataDir.getFileSystem(conf)
    recoverManifestSwap(fs, warehouseDir)
    val m = manifest(spark, warehouseDir)
    if (!m.columns.contains("filename") || cids.isEmpty)
      return RetractResult(Nil, Nil, 0L)
    val ret = cids.toDF(pk)
    // span prune: candidate files, bounded by the manifest
    val cand = m.join(broadcast(ret),
        col("lowest_cid") <= col(pk) && col("highest_cid") >= col(pk), "left_semi")
      .select("filename").distinct().as[String].collect().toSeq
    if (cand.isEmpty) return RetractResult(Nil, Nil, 0L)
    val part = compounds(spark, warehouseDir)
      .filter(col("src_filename").isin(cand: _*))
    // one pass over the candidate partitions: per-file retracted
    // count + the survivors' replacement span
    val hitStats = part
      .join(broadcast(ret.withColumn("__ret", lit(1))), Seq(pk), "left")
      .groupBy(col("src_filename"))
      .agg(count(col("__ret")).as("n_ret"),
        count(when(col("__ret").isNull, 1)).as("n_kept"),
        min(when(col("__ret").isNull, col(pk))).as("new_lo"),
        max(when(col("__ret").isNull, col(pk))).as("new_hi"))
      .filter(col("n_ret") > 0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toSeq
    // convergence for a prior mid-crash: a candidate file whose
    // manifest row still claims rows but whose partition directory
    // is GONE was emptied by an interrupted retract — repair its
    // row now (no data work left to do)
    val hitNames = hitStats.map(_._1).toSet
    val staleEmpty = m.filter(col("filename").isin(cand: _*) && col("n_compounds") > 0)
      .select("filename").as[String].collect().toSeq
      .filterNot(hitNames)
      .filterNot { f =>
        val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(f)
        fs.exists(new Path(dataDir, s"src_filename=$esc"))
      }
      .map(f => (f, 0L, 0L, Option.empty[Long], Option.empty[Long]))
    val stats = hitStats ++ staleEmpty
    if (stats.isEmpty) return RetractResult(Nil, Nil, 0L)
    val (rewritten, emptied) = stats.partition(_._3 > 0L)
      if (rewritten.nonEmpty) {
        val names = rewritten.map(_._1)
        // delete-only gate, BEFORE anything live changes (ADVICE
        // r18: the r18 form verified after the dynamic overwrite
        // had committed — detect, not prevent). Survivors stage to
        // a sibling tmp dir first; the count check runs against the
        // staged bytes, and only a verified stage is committed (the
        // commit re-reads the STAGED files, so the bytes that land
        // live are the bytes that passed the gate — and the
        // overwrite never reads the directory it rewrites). A crash
        // after the gate leaves either the old partitions (commit
        // not reached) or the verified survivors (idempotent
        // re-run); the tmp dir is derived data, deleted on entry.
        val stage = new Path(dataDir.toString + ".retract_stage")
        fs.delete(stage, true)
        part.filter(col("src_filename").isin(names: _*))
          .join(broadcast(ret), Seq(pk), "left_anti")
          .write.mode("overwrite")
          .partitionBy("src_filename")
          .parquet(stage.toString)
        // partition-column inference on the read-back could narrow
        // an all-digit filename to a numeric type, and a post-hoc
        // cast cannot restore the lexical form inference already
        // lost ('00123' infers as 123, casts back to '123' — the
        // commit would then write a NEW partition and leave the
        // retracted rows live in 'src_filename=00123'). An explicit
        // schema declaring src_filename string makes the partition
        // value round-trip byte-identically (ADVICE r19).
        val stageSchema = org.apache.spark.sql.types.StructType(part.schema.map(f =>
          if (f.name == "src_filename")
            f.copy(dataType = org.apache.spark.sql.types.StringType)
          else f))
        val stagedDf = spark.read.schema(stageSchema).parquet(stage.toString)
        val after = stagedDf.count()
        val want = rewritten.map(_._3).sum
        require(after == want,
          s"retract: staged rewrite holds $after rows, expected $want survivors — live data untouched")
        stagedDf.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("src_filename")
          .parquet(dataDir.toString)
        fs.delete(stage, true)
      }
      emptied.foreach { case (f, _, _, _, _) =>
        val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(f)
        fs.delete(new Path(dataDir, s"src_filename=$esc"), true)
      }
      // manifest repair through the tmp + swap pattern
      val repairs = stats.map { case (f, _, kept, lo, hi) =>
        (f, lo.map(long2Long).orNull, hi.map(long2Long).orNull, long2Long(kept))
      }.toDF("filename", "rep_lo", "rep_hi", "rep_n")
      val repaired = m.join(broadcast(repairs), Seq("filename"), "left")
        .select(col("filename"),
          when(col("rep_n").isNotNull, col("rep_lo")).otherwise(col("lowest_cid")).as("lowest_cid"),
          when(col("rep_n").isNotNull, col("rep_hi")).otherwise(col("highest_cid")).as("highest_cid"),
          col("date_added"),
          coalesce(col("rep_n"), col("n_compounds")).as("n_compounds"))
      val mDir = new Path(manifestDir(warehouseDir))
      val mTmp = new Path(manifestDir(warehouseDir) + ".retract_tmp")
      val mOld = new Path(manifestDir(warehouseDir) + ".retract_old")
      fs.delete(mTmp, true)
      repaired.write.mode("overwrite").parquet(mTmp.toString)
      require(fs.rename(mDir, mOld), s"retract: could not stage aside $mDir")
      require(fs.rename(mTmp, mDir), s"retract: could not swap in $mTmp")
      fs.delete(mOld, true)
      RetractResult(rewritten.map(_._1), emptied.map(_._1), stats.map(_._2).sum)
  }

  /** Crash recovery for [[retract]]'s manifest swap, run at entry
    * under the lease: the manifest rewrite is derived data until the
    * first rename, so every leftover state resolves mechanically
    * (the [[graft.sinks.ZOrder.reclusterZOrdered]] matrix — old
    * without canonical restores, anything else discards leftovers). */
  private def recoverManifestSwap(fs: org.apache.hadoop.fs.FileSystem,
                                  warehouseDir: String): Unit = {
    val mDir = new Path(manifestDir(warehouseDir))
    val mTmp = new Path(manifestDir(warehouseDir) + ".retract_tmp")
    val mOld = new Path(manifestDir(warehouseDir) + ".retract_old")
    if (fs.exists(mOld)) {
      if (!fs.exists(mDir)) {
        if (fs.exists(mTmp)) {
          require(fs.rename(mTmp, mDir), s"retract: recovery could not complete swap $mTmp -> $mDir")
          fs.delete(mOld, true)
        } else require(fs.rename(mOld, mDir), s"retract: recovery could not restore $mOld -> $mDir")
      } else fs.delete(mOld, true)
    }
    fs.delete(mTmp, true)
  }

  /** Publish the warehouse compounds as a BUCKETED catalog table:
    * co-locates rows by primary key so key-equi joins and lookups
    * against other tables bucketed the same way need NO shuffle —
    * the 100 TB substitute for the reference's SQLite indexes.
    * (Bucketed writes must go through the catalog; plain
    * `.parquet()` paths cannot carry bucket metadata.) */
  def publishBucketed(spark: SparkSession, warehouseDir: String, table: String,
                      buckets: Int = 16, key: String = "cid"): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    compounds(spark, warehouseDir)
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", s"$warehouseDir/bucketed_$table")
      .saveAsTable(table)
  }
}
