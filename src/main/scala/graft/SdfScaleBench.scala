package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness for VERDICT r13 item 5: decade evidence for the
  * reference surface. The SDF path's correctness is pinned on the
  * reference's own 8-compound files plus SdfScaleSpec's synthetic
  * split-boundary corpus; this harness generates a LAYOUT-FAITHFUL
  * multi-file corpus at GB scale (every default-layout tag present,
  * NOT_NULL satisfiable, realistic record sizes), then times the
  * full warehouse lifecycle:
  *
  *   ingest (manifest skip-set, per-file extract, partitioned write)
  *   → pk lookup (manifest-span prune → partition prune → pushed pk)
  *   → publishBucketed + secondary-index lookup (bucket pruning)
  *   → compact → re-lookup (latency invariant under compaction)
  *
  * The claim being evidenced (SURVEY §2A): lookup cost is O(one
  * partition), so it must stay flat as corpus size grows 10x —
  * recorded in BASELINE.md as (corpus size, files, ingest s,
  * lookup ms) rows.
  *
  * Usage: runMain graft.SdfScaleBench <nFiles> <molsPerFile> <root>
  */
object SdfScaleBench {
  /** One synthetic molecule record, default-layout-faithful (tag set
    * mirrors the reference's real PubChem dump fields used by
    * default_db_layout.json; sizes ~0.9-1.5 KB like real records
    * once the filler block is counted). */
  private def record(cid: Long, rng: java.util.Random): String = {
    val filler = {
      val sb = new StringBuilder
      val lines = 8 + rng.nextInt(12)
      for (_ <- 0 until lines) {
        sb.append("  ")
        for (_ <- 0 until 60) sb.append(('A' + rng.nextInt(26)).toChar)
        sb.append('\n')
      }
      sb.toString
    }
    val key1 = (0 until 14).map(_ => ('A' + rng.nextInt(26)).toChar).mkString
    s"""mol-$cid
       |  -GRAFT- synthetic
       |
       |$filler> <PUBCHEM_COMPOUND_CID>
       |$cid
       |
       |> <PUBCHEM_IUPAC_INCHI>
       |InChI=1S/C${cid % 40 + 1}H${cid % 60 + 2}/c$cid
       |
       |> <PUBCHEM_IUPAC_INCHIKEY>
       |$key1-GRAFTKEY${cid % 10}-N
       |
       |> <PUBCHEM_OPENEYE_CAN_SMILES>
       |C1CCCCC1N$cid
       |
       |> <PUBCHEM_OPENEYE_ISO_SMILES>
       |C1CCCCC1[N+]$cid
       |
       |> <PUBCHEM_XLOGP3${if (cid % 3 == 0) "_AA" else ""}>
       |${(cid % 80).toDouble / 10 - 3}
       |
       |> <PUBCHEM_EXACT_MASS>
       |${100.0 + (cid % 9000).toDouble / 10}
       |
       |> <PUBCHEM_MOLECULAR_FORMULA>
       |C${cid % 40 + 1}H${cid % 60 + 2}N${cid % 5}
       |
       |> <PUBCHEM_MOLECULAR_WEIGHT>
       |${101.0 + (cid % 9000).toDouble / 10}
       |""".stripMargin + "\n$$$$\n"
  }

  /** Generate the corpus, optionally as `.sdf.gz` — what PubChem
    * actually ships (reference utils.py:285 opens via gzip). Gzip is
    * not splittable, so a `.gz` file is ONE task however large; the
    * bench's gz mode exists to measure that file-level parallelism
    * (PubChem ships thousands of files) still saturates the box. */
  def generate(root: String, nFiles: Int, molsPerFile: Int,
               gz: Boolean = false): String = {
    val dir = java.nio.file.Paths.get(root, if (gz) "sdfgz" else "sdf")
    java.nio.file.Files.createDirectories(dir)
    val rng = new java.util.Random(42)
    val ext = if (gz) ".sdf.gz" else ".sdf"
    var cid = 1L
    for (f <- 0 until nFiles) {
      val p = dir.resolve(f"Compound_$f%05d$ext")
      if (!java.nio.file.Files.exists(p)) {
        val out = java.nio.file.Files.newOutputStream(p)
        val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          if (gz) new java.util.zip.GZIPOutputStream(out, 1 << 16) else out,
          java.nio.charset.StandardCharsets.UTF_8))
        try for (_ <- 0 until molsPerFile) { w.write(record(cid, rng)); cid += 1 }
        finally w.close()
      } else cid += molsPerFile
    }
    s"$dir/*$ext"
  }

  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 20
    val molsPerFile = if (args.length > 1) args(1).toInt else 50000
    val root = if (args.length > 2) args(2) else "/tmp/graft_sdf_scale"
    val gz = args.length > 3 && args(3) == "gz"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = GraftSession.local(cpus)

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sdfscale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val glob = timed(s"generate ${nFiles}x$molsPerFile${if (gz) " gz" else ""}")(
      generate(root, nFiles, molsPerFile, gz))
    val wh = s"$root/wh"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))

    val res = timed("ingest")(sinks.Warehouse.ingest(spark, glob, wh))
    println(s"[sdfscale] ingested files=${res.filesLoaded.length} rows=${res.rowsLoaded}")
    timed("ingest_noop_rerun")(sinks.Warehouse.ingest(spark, glob, wh))

    val total = nFiles.toLong * molsPerFile
    // pk lookups: cold then repeated — the manifest-span prune +
    // static partition prune + pushed pk must touch O(one partition)
    for (i <- 1 to 3) {
      val cid = total / 2 + i
      timed(s"lookup_pk_$i")(assert(
        sinks.Warehouse.lookup(spark, wh, cid).collect().length == 1))
    }
    timed("lookup_pk_miss")(assert(
      sinks.Warehouse.lookup(spark, wh, total + 999999).collect().isEmpty))

    timed("publish_bucketed")(
      sinks.Warehouse.publishBucketed(spark, wh, "graft_scale_compounds",
        buckets = 64, key = "InChIKey"))
    // secondary lookups by a real key value from the corpus
    val sampleKeys = spark.table("graft_scale_compounds")
      .filter(col("cid").isin(total / 3, total / 2, 2 * total / 3))
      .select("InChIKey").collect().map(_.getString(0))
    sampleKeys.zipWithIndex.foreach { case (k, i) =>
      timed(s"lookup_inchikey_$i")(assert(
        sinks.Warehouse.lookupIndexed(spark, "graft_scale_compounds", "InChIKey", k)
          .collect().nonEmpty))
    }

    timed("compact")(sinks.Warehouse.compact(spark, wh))
    for (i <- 1 to 3) {
      val cid = total / 3 + i
      timed(s"lookup_pk_postcompact_$i")(assert(
        sinks.Warehouse.lookup(spark, wh, cid).collect().length == 1))
    }
    val rows = spark.read.parquet(s"$wh/compounds").count()
    println(s"[sdfscale] final_rows=$rows expected=$total")
    assert(rows == total)

    // retraction decade evidence (round 19, VERDICT r18 item 4):
    // takedown cost must scale with partitions HIT, never corpus —
    // 8 CIDs spanning exactly 2 of the nFiles partitions, timed
    // against the full-corpus ingest above
    val span = molsPerFile.toLong
    val retractSet = (0L until 5L).map(span / 2 + _) ++ (0L until 3L).map(5 * span + 7 + _)
    val rr = timed("retract_8cids_2files")(
      sinks.Warehouse.retract(spark, wh, retractSet))
    println(s"[sdfscale] retract rewritten=${rr.partitionsRewritten.length} " +
      s"dropped=${rr.partitionsDropped.length} rows=${rr.rowsRetracted}")
    assert(rr.rowsRetracted == 8 && rr.partitionsRewritten.length == 2
      && rr.partitionsDropped.isEmpty)
    // survivors still served, retracted keys gone, count repaired
    timed("lookup_post_retract")(assert(
      sinks.Warehouse.lookup(spark, wh, total / 2 + 1).collect().length == 1))
    timed("lookup_retracted_miss")(assert(
      sinks.Warehouse.lookup(spark, wh, span / 2).collect().isEmpty))
    timed("retract_noop_rerun")(assert(
      sinks.Warehouse.retract(spark, wh, retractSet).rowsRetracted == 0))
    val afterRetract = spark.read.parquet(s"$wh/compounds").count()
    assert(afterRetract == total - 8, s"$afterRetract != ${total - 8}")
    spark.stop()
  }
}
