package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the q171 regression hunt (not part of
  * the library surface; deleted once settled).
  */
object ProfQ171 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    import s.implicits._

    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROF $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"== rep $rep ==")
      val root = s"${sys.props("java.io.tmpdir")}/graft_prof/q171"
      val rootP = new org.apache.hadoop.fs.Path(root)
      val hfs = rootP.getFileSystem(s.sessionState.newHadoopConf())
      if (hfs.exists(rootP)) hfs.delete(rootP, true)
      val table = s"$root/table"
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"))
      t("writeThrough") {
        graft.sources.FileManifest.writeThrough(
          o.repartitionByRange(4, col("o_orderkey")),
          table, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
          mode = "overwrite")
      }
      t("view@v1") {
        graft.sources.FileManifest.readAsOf(s, table, 1L)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"))
          .write.mode("overwrite").parquet(s"$root/mv/v1")
      }
      val bnd = o.agg(min("o_orderkey"), max("o_orderkey")).head()
      val (mnK, mxK) = (bnd.getLong(0), bnd.getLong(1))
      val spanK = mxK - mnK + 1
      (0 until 3).foreach { b =>
        val batch = t(s"batch$b build") {
          val df = o.filter(col("o_orderkey") % 997 === 0 &&
              expr(s"((o_orderkey - $mnK) * 3) div $spanK") === b)
            .select(col("o_orderkey"), lit(-(b + 1).toLong).as("o_custkey"))
            .unionByName(Seq((900000000L + b, -100L - b))
              .toDF("o_orderkey", "o_custkey"))
          df.cache().count()
          df
        }
        val vBefore = graft.sources.FileManifest.versions(s, table).max
        t(s"batch$b mergeKeys") {
          graft.sources.FileManifest.mergeKeys(
            s, table, batch, "o_orderkey", Seq("o_orderkey"),
            bloomCols = Seq("o_orderkey"))
        }
        val vAfter = graft.sources.FileManifest.versions(s, table).max
        val delta = t(s"batch$b changesBetween") {
          graft.sources.FileManifest
            .changesBetween(s, table, vBefore, vAfter)
            .select(col("o_custkey"),
              when(col("change_type") === "insert", lit(1L))
                .otherwise(lit(-1L)).as("sgn"),
              col("o_orderkey"))
            .groupBy("o_custkey")
            .agg(sum("sgn").as("n"),
              sum(col("sgn") * col("o_orderkey")).as("key_sum"))
        }
        t(s"batch$b viewUpdate") {
          s.read.parquet(s"$root/mv/v$vBefore")
            .unionByName(delta)
            .groupBy("o_custkey")
            .agg(sum("n").as("n"), sum("key_sum").as("key_sum"))
            .filter(col("n") > 0)
            .write.mode("overwrite").parquet(s"$root/mv/v$vAfter")
        }
        t(s"batch$b prune") {
          graft.sources.ChangeFeedTail.pruneSnapshots(
            s, s"$root/mv", "v", keep = 3)
        }
      }
    }
    spark.stop()
  }
}
