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
    "q165_chunk_retrieval", // broadcast query-embedding set x chunk table, q_id <> doc_id
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

  // ---- broadcast-cardinality lint -----------------------------------------
  //
  // A `broadcast()` HINT is a promise that the frame stays driver-sized at
  // ANY corpus scale — the optimizer obeys it unconditionally, so a hint on
  // a corpus-growing frame is a guaranteed OOM at 100 TB that no sf0.001
  // test can feel (round 14 shipped three: a per-document split map, the
  // documents dim, the vocabulary df table). This lint makes the class
  // unshippable: every broadcast-hinted join side in every registered
  // query's OPTIMIZED LOGICAL plan (hints live there; the physical plan
  // also auto-broadcasts anything tiny at test scale, which is fine and
  // not our business) must be provably bounded:
  //   - LocalRelation: driver-built books/probes/dims — bounded by
  //     construction (it already fit on the driver);
  //   - global aggregate (no grouping keys): 1 row;
  //   - grouped aggregate OVER a bounded input: ≤ input rows;
  //   - GlobalLimit / sampled top-K: K rows;
  //   - scans of the catalog dim tables (region/nation: fixed at 5/25);
  //   - joins/unions/unary ops of bounded inputs;
  // or carry an entry in `boundedByDesign` naming the query, a treeString
  // marker, and WHY that frame is bounded in production. An entry that
  // stops matching fails the liveness check, so the whitelist cannot rot.
  private def isBounded(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{LogicalRelation, HadoopFsRelation}
    p match {
      case _: LocalRelation => true
      case a: Aggregate => a.groupingExpressions.isEmpty || isBounded(a.child)
      case _: GlobalLimit => true
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          val paths = fs.location.rootPaths.mkString(",")
          Seq("region.parquet", "nation.parquet").exists(paths.contains)
        case _ => false
      }
      case j: Join => isBounded(j.left) && isBounded(j.right)
      case u: Union => u.children.forall(isBounded)
      case u: UnaryNode => isBounded(u.child)
      case _ => false
    }
  }

  /** Hinted-broadcast frames the structural classifier can't prove bounded
    * but that are bounded by the operator's production semantics. Marker =
    * substring of the hinted side's treeString; every entry must match a
    * live hinted side (liveness-checked below). Two recurring shapes:
    *
    * PROBES — the ANN/decontamination query sets are corpus slices at gate
    * scale (`vec_id % 100 = 0` etc.) so the classifier sees an unbounded
    * scan, but in production the broadcast side is the QUERY WORKLOAD
    * (benchmark suite, search traffic batch) — bounded by the caller, and
    * the corpus/index side of those joins is never hinted. The winners
    * re-join and per-cell ADC-table frames derive from the same probe set
    * (× k or × nprobe — still workload-sized).
    *
    * DOMAIN AGGREGATES — grouped aggregates whose key set is a bounded
    * attribute domain (order priorities, event types, languages, sources,
    * CMS cell geometry, mixture sources, index batches): output rows = K
    * whatever the corpus size; the classifier can't know a column's
    * cardinality, so these carry the adjudication here.
    */
  private val probeSlice = "% 100) = 0"
  private val boundedByDesign: Map[String, Seq[(String, String)]] = Map(
    "q08_join_broadcast_dim" -> Seq(("Project [s_suppkey",
      "reference J2 semantics: the table plays the curated species-dim role, catalog-sized in the reference's data model")),
    "q16_dim_get_or_create" -> Seq(("Union false, false",
      "get-or-create dim: existing dim rows ∪ distinct new names — bounded by the location-name domain")),
    "q30_cosine_topk" -> Seq((probeSlice, "probe workload")),
    "q32_ann_ivf" -> Seq((probeSlice, "probe workload, cell-assigned")),
    "q57_ann_lsh" -> Seq((probeSlice, "probe workload, LSH-bucketed")),
    "q64_quantile_sketch" -> Seq(("percentile_approx",
      "per-order-priority sketch: K = |priority domain| rows")),
    "q66_ann_ivf_nprobe" -> Seq((probeSlice, "probe workload, nprobe cells")),
    "q67_decontaminate" -> Seq(("% 250) = 0",
      "benchmark shingle set: the eval suite is fixed-size; gate models it as a corpus slice")),
    "q80_quantized_ann" -> Seq((probeSlice, "probe workload, int8-quantized")),
    "q87_gap_fill_daily" -> Seq(("Aggregate [event_type",
      "event-type × calendar-day frame: both domains bounded")),
    "q100_ann_pq" -> Seq((probeSlice, "probe workload")),
    "q101_embed_decontaminate" -> Seq(("% 50) = 0",
      "benchmark embedding set (vectors + their LSH bands): fixed eval suite")),
    "q106_ann_ivf_pq" -> Seq((probeSlice, "probe workload: ADC tables + winners re-join")),
    "q107_incremental_ann" -> Seq((probeSlice, "probe workload")),
    "q108_ann_residual_pq" -> Seq((probeSlice, "probe workload")),
    "q109_ann_tombstones" -> Seq((probeSlice, "probe workload")),
    "q110_ann_drift" -> Seq(("Aggregate [batch",
      "per-index-batch mean distortion: K = |batches| rows (grouped over the corpus, batch-count out)")),
    "q127_rank_normalize" -> Seq(("_off#",
      "cumeDistByKey bucket offsets: K buckets, and the hint is applied only behind a measured counts.count() <= hintMaxGroups guard")),
    "q128_stratified_topn" -> Seq(("count(1) AS __cnt",
      "StratifiedTopN per-group counts: K = |lang domain| rows")),
    "q132_pipeline_e2e" -> Seq(("% 250) = 0",
      "q67's benchmark shingle set inside the composed pipeline")),
    "q135_ann_rerank" -> Seq((probeSlice, "probe workload + depth×|queries| winners")),
    "q141_cms_state_merge" -> Seq(("sum(cnt",
      "CMS sketch cells: fixed d×w geometry, corpus-size-invariant")),
    "q142_stream_cms_state" -> Seq(("sum(cnt",
      "CMS sketch cells read back from state: fixed d×w geometry")),
    "q145_ann_opq" -> Seq((probeSlice, "probe workload, OPQ-rotated")),
    "q146_ann_compact" -> Seq((probeSlice, "probe workload over the compacted index")),
    "q147_stream_ann_ingest" -> Seq((probeSlice, "probe workload over base+streamed delta")),
    "q148_ann_upsert" -> Seq((probeSlice, "probe workload over upserted state")),
    "q149_ann_filtered" -> Seq((probeSlice, "probe workload; the allow-set semi-join is equi")),
    "q156_tfidf_cosine" -> Seq((probeSlice,
      "query-doc postings: workload-sized; the vocabulary df side is deliberately NOT hinted")),
    "q157_mixture_waterfill" -> Seq(("kstar",
      "water-level frames over the K-source allocation table: K rows by construction")),
    "q160_uncertainty_sample" -> Seq(("count(1) AS __cnt",
      "StratifiedTopN per-source counts: K = |source domain| rows")),
    "q165_chunk_retrieval" -> Seq((probeSlice,
      "query-document embedding set: retrieval workload, not the corpus"))
    // (deletion-vector application needs no entry: the dv rows
    // materialize eagerly into a LocalRelation — driver-built,
    // metadata-sized — which the structural classifier proves bounded
    // on its own)
  )

  private def hintedSides(df: org.apache.spark.sql.DataFrame)
    : Seq[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, BROADCAST}
    df.queryExecution.optimizedPlan.collect {
      case j: Join =>
        Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).collect {
          case (Some(h), side) if h.strategy.contains(BROADCAST) => side
        }
    }.flatten
  }

  test("broadcast lint rejects a corpus-derived hinted frame (sensitivity)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    // the round-14 q156 bug in miniature: a vocabulary-sized aggregate
    // under a forced broadcast
    val dft = docs.select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
    val bad = docs.select(explode(split(col("text"), " ")).as("token"))
      .join(broadcast(dft), "token")
    val sides = hintedSides(bad)
    assert(sides.nonEmpty, "hint not visible in optimized plan")
    assert(sides.exists(!isBounded(_)), "lint failed to flag a corpus-sized broadcast")
    // and the shapes we bless ARE provably bounded
    val global = docs.agg(count(lit(1)).as("n"))
    assert(hintedSides(docs.crossJoin(broadcast(global))).forall(isBounded))
    val dim = spark.read.parquet(s"$Sf/nation.parquet")
    assert(hintedSides(docs.join(broadcast(dim),
      col("doc_id") === col("n_nationkey"))).forall(isBounded))
  }

  test("every broadcast-hinted frame in every registered plan is bounded") {
    withWholePlans {
      val offenders = scala.collection.mutable.ArrayBuffer[String]()
      val used = scala.collection.mutable.Set[(String, String)]()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val df = fn(spark, Sf)
        hintedSides(df).filterNot(isBounded).foreach { side =>
          val tree = side.treeString
          boundedByDesign.getOrElse(name, Nil)
            .find { case (marker, _) => tree.contains(marker) } match {
            case Some((marker, _)) => used += ((name, marker))
            case None =>
              offenders += s"$name: unbounded broadcast-hinted frame:\n" +
                tree.linesIterator.take(8).mkString("\n")
          }
        }
        spark.sharedState.cacheManager.clearCache()
      }
      assert(offenders.isEmpty,
        s"corpus-growing broadcast hints:\n${offenders.mkString("\n---\n")}")
      val dead = boundedByDesign.toSeq.flatMap { case (q, ms) =>
        ms.collect { case (m, _) if !used((q, m)) => s"$q/$m" }
      }
      assert(dead.isEmpty, s"dead boundedByDesign entries: ${dead.mkString(", ")}")
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
