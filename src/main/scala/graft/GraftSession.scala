package graft

import org.apache.spark.sql.SparkSession

/** One place to build a correctly-configured session.
  *
  * Scale-relevant settings live here so every entry point (Verify,
  * Bench, specs, library users) gets the same execution profile:
  *  - AQE on, with skew-join handling and partition coalescing — at
  *    cluster scale this is what re-plans shuffle joins as broadcast
  *    when a side is genuinely small and splits skewed partitions;
  *  - shuffle partitions sized to the local core count (on a real
  *    cluster this would be per-job; AQE coalescing makes the exact
  *    number less critical);
  *  - `nanosAsLong` set once at session construction (events.parquet
  *    is TIMESTAMP(NANOS)); setting it per-read would be a racy
  *    global-conf mutation.
  */
object GraftSession {
  /** Shuffle/spill scratch root (spark.local.dir). Thread dumps of the
    * r21 bench at local[32] showed the suite FILESYSTEM-bound, not
    * CPU-bound: in one sample 30/32 task threads sat BLOCKED on the
    * single IndexShuffleBlockResolver lock (whose critical section
    * does index/checksum file writes + renames on disk), and the
    * "running" remainder were inside FileOutputStream.open /
    * FileChannel mmap/unmap syscalls on /tmp — 3 files per map task x
    * 32 concurrent tasks serializing on the root fs. That is why the
    * 8-core suite outran the 32-core one (VERDICT r20 item 2). tmpfs
    * removes the media latency from the commit critical section; the
    * same move the streaming checkpoints made in round 5. A cluster
    * deployment instead points spark.local.dir at per-node fast local
    * disks (guide §2.1 — shuffle files must outlive executors there
    * and can exceed RAM); locally the sf0.1–sf10 shuffle volume is
    * MB-sized, and a bigger local scale run can set
    * GRAFT_LOCAL_DIR=/tmp (or any disk path) to opt out. */
  private def localScratchDir: String =
    sys.env.get("GRAFT_LOCAL_DIR").getOrElse {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) {
        val d = shm.resolve("graft_spark_local")
        try java.nio.file.Files.createDirectories(d) catch { case _: Exception => }
        d.toString
      } else System.getProperty("java.io.tmpdir")
    }

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.local.dir", localScratchDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // coalescePartitions.parallelismFirst stays at Spark's default
      // (true): an A/B across the suite measured the byte-sized
      // alternative (false, 64 MB advisory) 1.3-1.8x SLOWER on every
      // mid-size shuffle (q3 0.54->0.95 s) and never faster on the
      // tiny ones — at local scale the parallelism the default
      // preserves beats the per-task overhead it costs. A cluster
      // deployment sizing reducers for 100 TB should revisit
      // advisoryPartitionSizeInBytes per job, not flip this global.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Scan-split granularity: the default 128 MB packs a whole
      // mid-size table into 1-2 map tasks (sf10 events = 194 MB ->
      // 2 tasks on 32 cores; the scan was the measured floor under
      // every events entry). 16 MB aligns with the ~27-33 MB row
      // groups the testdata generators emit, filling the machine at
      // the scale correctness runs at. The 100 TB story is
      // unchanged: there a scan has millions of splits whatever the
      // setting, and a cluster deployment re-derives this per job
      // from executor memory (SURVEY §E) — what must NOT happen is
      // a row group so large the file stops splitting at all
      // (gen_sf.py caps row groups for the same reason).
      // Env-overridable (ADVICE r14): 16m is tuned to the local
      // bench corpus; a deployment whose scans are genuinely large
      // sets GRAFT_MAX_PARTITION_BYTES (e.g. "128m") instead of
      // remembering a per-job conf override — the tuned value stays
      // the default so every local entrypoint keeps the measured
      // profile.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // InferFiltersFromGenerate turns every explode(kernel(text))
      // into an inferred `size(kernel(text)) > 0` filter; predicate
      // pushdown then substitutes the kernel INTO the filter and
      // sinks it below the repartition exchanges into the scan
      // stage — re-running the expensive shingle/token kernels
      // serially on the (often single-partition) pre-shuffle side.
      // Measured at sf0.1: 1.7 s of a 3.5 s dedup_ngram_jaccard run
      // in a one-task filter stage. The filter only ever helps a
      // corpus dominated by empty arrays; the engine's kernels are
      // cheap-per-row but never cheaper than the generate itself.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")

  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // native functions (fnv1a64, vec_dot, vec_sqdist) available in
    // every graft session — public helpers like Dedup.dot must not
    // depend on some other operator having registered them first
    functions.GraftFunctions.register(s)
    s
  }
}
