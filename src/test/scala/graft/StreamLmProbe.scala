package graft

import org.apache.spark.sql.functions._

/** Phase-timing probe for q155's cost split (judge adjudication): the
  * materialized LM train, the arrivals fabrication copy, the streaming
  * run, and the sink read — against the q151 batch twin as the floor.
  * Run: SPARK_GRAFT_SF_DIR=... sbt -batch "Test/runMain graft.StreamLmProbe"
  */
object StreamLmProbe extends SparkSpec {
  def main(args: Array[String]): Unit = {
    val s = spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { rep =>
      t(s"q151_batch rep$rep") {
        graft.SparkEntry.queries("q151_bigram_lm_nll")(s, d).collect()
      }
      t(s"q155_full rep$rep") {
        graft.SparkEntry.queries("q155_stream_lm_score")(s, d).collect()
      }
      // phase split of the stream gate's pieces, re-run standalone
      val root = s"${sys.props("java.io.tmpdir")}/graft_io/probe/stream_lm"
      val rootP = new org.apache.hadoop.fs.Path(root)
      val hfs = rootP.getFileSystem(s.sessionState.newHadoopConf())
      if (hfs.exists(rootP)) hfs.delete(rootP, true)
      val docs = graft.Tables.documents(s, d)
      t(s"lmTrain_materialized rep$rep") {
        val (c2, c1, v) = graft.queries.TextQueries.lmTrain(docs, materialize = true)
        (c2.count(), c1.count(), v.count())
      }
      t(s"arrivals_copy rep$rep") {
        docs.select("doc_id", "text").repartition(3)
          .write.parquet(s"$root/arrivals")
      }
    }
  }
}
