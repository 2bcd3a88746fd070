package graft

import graft.sources.LayoutSpec

/** Thin CLI twin of the reference's build driver
  * (/root/reference/build_pubchem_db.py:31-54): positional base dir
  * holding `sdf/` (and the output `db/`), `--gzip`, `--reset`, and
  * `--db_layout_fn` for the same JSON layout format. The build
  * itself is [[sinks.Warehouse.ingest]] — incremental, idempotent,
  * distributed — writing the parquet warehouse under `<base>/db`;
  * pass `--jdbc-url` to additionally publish the compounds table to
  * a JDBC database ([[sinks.JdbcSink]]), the reference's sink shape.
  *
  * Usage:
  *   BuildDb <base_dir> [--gzip] [--reset] [--db_layout_fn path]
  *           [--jdbc-url url] [--cores n]
  */
object BuildDb {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty || args(0).startsWith("--")) {
      System.err.println("usage: BuildDb <base_dir> [--gzip] [--reset] " +
        "[--db_layout_fn path] [--jdbc-url url] [--cores n]")
      sys.exit(2)
    }
    val baseDir = args(0)
    val flags = args.drop(1)
    val valueFlags = Set("--db_layout_fn", "--jdbc-url", "--cores")
    def opt(name: String): Option[String] =
      flags.indexOf(name) match {
        case -1 => None
        case i if i + 1 >= flags.length || flags(i + 1).startsWith("--") =>
          // fast-fail instead of silently ignoring a trailing or
          // value-less flag ("--jdbc-url" with the URL forgotten)
          System.err.println(s"error: $name requires a value")
          sys.exit(2)
        case i => Some(flags(i + 1))
      }
    flags.filter(_.startsWith("--"))
      .filterNot(f => f == "--gzip" || f == "--reset" || valueFlags(f))
      .foreach { f => System.err.println(s"error: unknown flag $f"); sys.exit(2) }
    val gzip = flags.contains("--gzip")
    val reset = flags.contains("--reset")
    val layout = opt("--db_layout_fn")
      .map(p => LayoutSpec.fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(p))))
      .getOrElse(LayoutSpec.default)
    val cores = opt("--cores").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

    val spark = GraftSession.local(cores)
    val warehouseDir = s"$baseDir/db"
    try {
      if (reset) sinks.Warehouse.reset(spark, warehouseDir)
      val glob = if (gzip) s"$baseDir/sdf/*.sdf.gz" else s"$baseDir/sdf/*.sdf"
      val result = sinks.Warehouse.ingest(spark, glob, warehouseDir, layout)
      println(s"loaded ${result.filesLoaded.length} files, ${result.rowsLoaded} rows " +
        s"-> $warehouseDir (total ${sinks.Warehouse.compounds(spark, warehouseDir).count()})")
      opt("--jdbc-url").foreach { url =>
        sinks.JdbcSink.write(sinks.Warehouse.compounds(spark, warehouseDir),
          url, "compounds", layout)
        println(s"published compounds to $url")
      }
    } finally spark.stop()
  }
}
