package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate over the WHOLE query registry: the
  * invariants that make the 100 TB claims true stay pinned, so a future
  * edit that silently degrades a plan (a dropped equi-join condition
  * turning into a cartesian product, a lost broadcast turning the probe
  * side into a full shuffle) fails here, not in production.
  *
  * Streaming queries drain eagerly when constructed, so at sf0.001 this
  * doubles as an everything-still-runs smoke over the registry.
  */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  /** Audits run with [[Materialize]] transparent: an eager localCheckpoint
    * truncates the plan to an RDD scan, which would hide every join and
    * exchange upstream of the registry's ~14 materialization points from
    * this gate (a cartesian introduced inside a checkpointed subtree
    * could never fail it). Transparent mode skips the checkpoints, so the
    * audited plan is the FULL logical pipeline — the same visibility the
    * audit had when those sites were persist()-based.
    */
  private def withWholePlans[A](body: => A): A =
    Materialize.withTransparent(body)

  /** Queries whose BroadcastNestedLoopJoin is the DESIGN, not a missed
    * equi-join: a small broadcast side streamed against the corpus with a
    * non-equi predicate (ANN query sets, point-in-polygon) — one corpus
    * scan, no shuffle, exactly what those operators want.
    */
  private val deliberateBnlj = Set(
    "q30_cosine_topk", // broadcast query set x corpus, q_id <> n_id
    "q80_quantized_ann", // same shape, quantized scores
    "q100_ann_pq", // same shape, PQ-decoded corpus (encode itself is an equi-join on j)
    "q145_ann_opq", // q100's cross in OPQ-rotated space (broadcast query set x corpus)
    "q39_spatial_join", // broadcast polygons, PointInPolygon predicate
    "q32_ann_ivf", // broadcast centroids x corpus: map-side cell argmin
    "q66_ann_ivf_nprobe", // same centroid-assignment cross
    "q106_ann_ivf_pq", // same cross at index build/probe; search is equi-on-cell
    "q107_incremental_ann", // q106's cross, split base/delta index builds
    "q108_ann_residual_pq", // q106's cross, plus centroids x codebook for the per-cell ADC tables
    "q109_ann_tombstones", // q107's cross; the tombstone exclusion itself is an equi anti-join
    "q135_ann_rerank", // q106's cross; the refine joins only depth x |queries| winners
    "q110_ann_drift", // centroid-assignment cross + broadcast 1-row train-distortion divisor
    "q139_semdedup", // centroid-assignment cross; the dedup prune itself is an equi-join on cell
    "q146_ann_compact", // q107's cross re-run at compaction (rebuild from live rows)
    "q147_stream_ann_ingest", // centroid-assignment cross on each micro-batch's delta
    "q148_ann_upsert", // q107's cross over the upserted corpus state
    "q149_ann_filtered", // q106's cross; the allow-set restriction is an equi semi-join
    "q150_ann_cell_stats", // centroid-assignment cross; the histogram is an equi groupBy
    "q76_freq_sketch", // broadcast 1-row total for the support threshold
    "q87_gap_fill_daily", // calendar x event-type frame: both sides tiny
    "q143_bm25_topk", // broadcast 1-row corpus stats + 1-row df vector onto candidates
    "q151_bigram_lm_nll", // broadcast 1-row vocab size onto the bigram stream
    // (q155 shares q151's cross but it runs inside foreachBatch — the
    // audited return plan is just the sink read, so no whitelist entry)
    "q156_tfidf_cosine", // broadcast 1-row corpus count onto the tf table
    "q157_mixture_waterfill", // 1-row budget/kstar/lam frames onto the K-source table
    "q159_ccnet_buckets" // q151's 1-row vocab cross under the bucket roll-up
  )

  test("selective queries prune columns and push filters to the scan") {
    // q04: a 1-column aggregate over a 6-column table — the scan must
    // read ONLY o_orderdate, and the year-range predicate must reach the
    // parquet reader as pushed data filters (year(x) >= c rewrites to a
    // date-range filter Catalyst can push)
    val q04 = SparkEntry.queries("q04_year_range")(spark, Sf)
      .queryExecution.sparkPlan.toString
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(q04).getOrElse("")
    assert(read.contains("o_orderdate"), read)
    for (c <- Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority"))
      assert(!read.contains(c), s"q04 scan reads unneeded column $c: $read")
    assert(q04.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      s"q04 filter not pushed:\n$q04")

    // q08: the dim side of the broadcast join must scan only its join
    // key + projected column, and the fact side only the key it joins on
    val q08 = SparkEntry.queries("q08_join_broadcast_dim")(spark, Sf)
      .queryExecution.sparkPlan.toString
    assert(q08.contains("BroadcastHashJoin"), s"q08 lost its broadcast:\n$q08")

    // q73: the equality predicate must reach the ORC reader (columnar
    // formats beyond parquet keep their pushdown)
    val q73 = SparkEntry.queries("q73_orc_roundtrip")(spark, Sf)
      .queryExecution.sparkPlan.toString
    assert(q73.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"q73 ORC filter not pushed:\n$q73")

    // q42: the lang predicate must prune PARTITIONS (directory-level
    // elimination), not just filter rows post-scan
    val q42 = SparkEntry.queries("q42_partitioned_staging")(spark, Sf)
      .queryExecution.sparkPlan.toString
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(q42).isDefined,
      s"q42 lang predicate not a partition filter:\n$q42")

    // q121: map-side classifier inference — the documents scan must read
    // only (doc_id, text); at 100 TB reading lang/source/n_chars for a
    // 2-column projection is real wasted bandwidth
    val q121 = SparkEntry.queries("q121_hashed_classifier")(spark, Sf)
      .queryExecution.sparkPlan.toString
    val r121 = "ReadSchema: [^\\n]*".r.findFirstIn(q121).getOrElse("")
    for (c <- Seq("lang", "source", "n_chars"))
      assert(!r121.contains(c), s"q121 scan reads unneeded column $c: $r121")

    // q129: the embedding audit must not read vec_id
    val q129 = SparkEntry.queries("q129_embedding_audit")(spark, Sf)
      .queryExecution.sparkPlan.toString
    val r129 = "ReadSchema: [^\\n]*".r.findFirstIn(q129).getOrElse("")
    assert(!r129.contains("vec_id"), s"q129 scan reads unneeded vec_id: $r129")
  }

  test("no cartesian product in any registered plan; BNLJ only where deliberate") {
    withWholePlans {
      val offenders = scala.collection.mutable.ArrayBuffer[String]()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val df = fn(spark, Sf)
        val plan = df.queryExecution.sparkPlan.toString
        if (plan.contains("CartesianProduct"))
          offenders += s"$name: CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin") && !deliberateBnlj(name))
          offenders += s"$name: unexpected BroadcastNestedLoopJoin"
        spark.sharedState.cacheManager.clearCache()
      }
      assert(offenders.isEmpty, s"plan regressions:\n${offenders.mkString("\n")}")
    }
  }

  test("the BNLJ whitelist is live: each whitelisted site is actually seen") {
    // guards the audit itself: if materialization (or a refactor) hides a
    // whitelisted deliberate-BNLJ site from the audited plan, the
    // whitelist entry goes silently dead and a later regression at that
    // site could never fail the gate — require every entry to be observed
    withWholePlans {
      val dead = deliberateBnlj.filterNot { name =>
        SparkEntry.queries(name)(spark, Sf)
          .queryExecution.sparkPlan.toString.contains("BroadcastNestedLoopJoin")
      }
      assert(dead.isEmpty,
        s"whitelisted BNLJ sites not visible to the audit: ${dead.mkString(", ")}")
    }
  }
}
