package graft

import org.apache.spark.sql.functions._

/** Phase-timing probe for the MVCC publish path: builds an index-shaped
  * frame at sf0.1 scale, then times compactIndex's pieces — staging
  * write, publishVia (rename + stats + swap), vacuum, and the footer vs
  * scan stats builders head-to-head on the published files.
  * Run: sbt -batch "Test/runMain graft.PublishProbe"
  */
object PublishProbe extends SparkSpec {
  def main(args: Array[String]): Unit = {
    val s = spark
    import s.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graft_io/probe/publish_idx"
    val p = new org.apache.hadoop.fs.Path(dir)
    val hfs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (hfs.exists(p)) hfs.delete(p, true)
    hfs.delete(new org.apache.hadoop.fs.Path(s"${dir}_compact_staging"), true)

    // index-shaped rows: (n_id long, cell int, pcode binary[8]) at the
    // sf0.1 embeddings cardinality (~120k rows)
    val n = 120000
    val idx = s.range(n.toLong)
      .select(col("id").as("n_id"),
        (col("id") % 64).cast("int").as("cell"),
        expr("CAST(CONCAT(CAST(id AS STRING), 'xxxxxxxx') AS BINARY)").as("pcode"))
      .transform(graft.Materialize.checkpoint)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { rep =>
      val served = t(s"compactIndex rep$rep") {
        graft.sim.Similarity.compactIndex(idx, dir)
      }
      t(s"serve_count rep$rep") { served.count() }
    }
    val paths = graft.sources.FsListing.listDataFiles(hfs, p)
    println(s"PROBE files: ${paths.size}")
    val schema = s.read.parquet(paths: _*).schema
    (1 to 2).foreach { rep =>
      t(s"footerStats rep$rep") {
        graft.sources.FileManifest.footerStats(s, paths, schema, Seq("cell")).count()
      }
      t(s"scan fileStats rep$rep") {
        graft.sources.FileManifest.fileStats(
          s.read.option("basePath", dir).parquet(paths: _*),
          Seq("cell"), Nil, 65536L, 0.01).count()
      }
    }
    t("vacuum") { graft.sources.FileManifest.vacuum(s, dir, keepVersions = 2) }
  }
}
