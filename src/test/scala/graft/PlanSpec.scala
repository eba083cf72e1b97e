package graft

/** Plan-shape regression guards: the optimizations the engine depends on
  * must be visible in the physical plan (prompt: "explain the plan and
  * iterate until it's the plan you'd want"). These assertions catch
  * silent regressions — a dropped pushdown or broadcast won't fail
  * correctness, only scale. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("q02: filters pushed into the parquet scan, schema pruned") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), p.take(2000))
    // pruning: untouched columns must not appear anywhere in the plan
    assert(!p.contains("l_shipdate") && !p.contains("l_tax"), "unpruned scan")
  }

  test("q03: dimension joins broadcast, top-k is TakeOrderedAndProject") {
    val p = plan("q03_shipping_priority")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast join")
    assert(p.contains("TakeOrderedAndProject"), "expected top-k operator")
  }

  test("q04/q07: semi and anti joins use the dedicated join types") {
    assert(plan("q04_priority_semi").contains("LeftSemi"))
    assert(plan("q07_customers_without_orders").contains("LeftAnti"))
  }

  test("q01: whole-stage codegen covers the agg pipeline") {
    // AQE only shows final stages after execution
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf0001)
    df.collect()
    // codegen'd stages carry the "*(n)" prefix in the simple plan string
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(") && p.contains("HashAggregate"), p.take(1500))
  }

  test("q30: LSH candidate join is an equi-join, not a cartesian product") {
    val p = plan("q30_dedup_minhash_lsh")
    assert(!p.contains("CartesianProduct"), "all-pairs join leaked in")
    assert(!p.contains("BroadcastNestedLoopJoin"), "non-equi join leaked in")
  }

  test("q43: bucketed range join avoids nested-loop execution") {
    val p = plan("q43_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("q33: query side is broadcast against the corpus") {
    assert(plan("q33_cosine_topk").contains("BroadcastHashJoin") ||
      plan("q33_cosine_topk").contains("BroadcastNestedLoopJoin"))
  }

  test("q55: inverted-index search joins stats by broadcast, no LIKE rescan") {
    val p = plan("q55_inverted_index")
    assert(p.contains("BroadcastHashJoin"), "df/n_docs should broadcast")
    assert(!p.toLowerCase.contains("like"), "search must not rescan text")
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q76: trained-IVF training and probe never go unbounded-cartesian") {
    // the codebook assigns are broadcast(K-row) nested loops by design —
    // bounded; what must never appear is a CartesianProduct (corpus ×
    // corpus). The probe itself is the q54 cluster equi-join.
    val p = plan("q76_ivf_trained")
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q59: component labeling never leaves equi-join land") {
    val p = plan("q59_dedup_groups_cc")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "label propagation must join on node keys only")
  }

  test("q78: as-of join is one window over a union — no inequality join at all") {
    val p = plan("q78_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    // the union-window formulation must not degrade into any join
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "as-of should be join-free:\n" + p.take(1500))
    assert(p.contains("Window"), p.take(1500))
  }

  test("q80/q86: quality and repetition gates are map-only — no hash exchange") {
    // all metrics are per-row HOF expressions (q86's n-grams included:
    // windowed transform+slice, never explode→groupBy); the only
    // exchange allowed is the presentation sort's range partitioning
    for (q <- Seq("q80_quality_filters", "q86_repetition_filter")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"), s"$q:\n" + p.take(1500))
    }
  }

  test("q87: random projection is map-only — the sign matrix is a literal") {
    val p = plan("q87_random_projection")
    assert(!p.contains("Exchange hashpartitioning"), p.take(1500))
    assert(!p.contains("md5"), "sign matrix must be folded, not hashed per row")
  }

  test("q90: domain quota plans through TopKPerKey, not a window sort") {
    // partial per-partition heaps → winner-only exchange; the window
    // row_number formulation would shuffle + sort the whole corpus
    val p = plan("q90_domain_quota")
    assert(p.contains("TopKPerKey "), p.take(1500))
    assert(!p.contains("Window"), "quota must not fall back to a window")
  }

  test("q92: training mix composes through TopKPerKey with no cartesian") {
    val p = plan("q92_training_mix")
    assert(p.contains("TopKPerKey "), "quota stage must use the custom operator")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("q67/q82/q92: drop-list joins carry NO forced broadcast hint; anti key is the long id") {
    // the drop/flag lists scale with the duplicate/contamination RATE,
    // not a dim-table bound — a forced broadcast() is a driver OOM at
    // web-scale dup rates. The hint must be absent (AQE may still
    // broadcast when the list actually fits) and the anti-join must key
    // on the 8-byte doc_id, never on text.
    // q92 localCheckpoints its survival frame (truncating the visible
    // plan), so its anti-join is pinned on the un-checkpointed
    // Corpus.trainingMixSurv — the exact expression the query materializes
    val frames = Seq(
      "q67_dedup_apply" -> SparkEntry.queries("q67_dedup_apply")(spark, sf0001),
      "q82_corpus_gate" -> SparkEntry.queries("q82_corpus_gate")(spark, sf0001),
      "q92 surv" -> graft.operators.Corpus.trainingMixSurv(spark, sf0001))
    for ((q, df) <- frames) {
      assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
        s"$q carries a forced join-strategy hint")
      if (q != "q82_corpus_gate") {
        val p = df.queryExecution.executedPlan.toString
        val anti = p.linesIterator.filter(_.contains("LeftAnti")).toSeq
        assert(anti.nonEmpty, s"$q: expected an anti-join:\n" + p.take(1500))
        assert(anti.forall(_.matches(""".*doc_id#\d+L.*""")),
          s"$q: anti-join must key on the long doc_id:\n" + anti.mkString("\n"))
      }
    }
  }

  test("q79/q81/q91: semantic/contamination/passage dedup stay in equi-join land") {
    for (q <- Seq("q79_semantic_dedup", "q81_contamination", "q91_passage_dedup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q:\n" + p.take(1500))
    }
  }

  test("q62: BM25 stats join by broadcast, postings filtered before exchange") {
    val p = plan("q62_bm25_rank")
    assert(p.contains("BroadcastHashJoin"), "df stats should broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-100 should be TakeOrdered")
  }

  test("q60/q61/q63: corpus prep ops are join-free (per-row / per-shard)") {
    for (q <- Seq("q60_stratified_sample", "q61_pii_redaction", "q63_token_packing")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q should have no join: ${p.take(800)}")
    }
  }

  test("q99: PQ encode and ADC scan are broadcast equi-joins, no cartesian") {
    val p = plan("q99_pq_adc")
    assert(!p.contains("CartesianProduct"), "corpus×corpus leaked into PQ")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "codebook / distance tables should broadcast:\n" + p.take(1500))
  }

  test("pq_adc is compiled, never interpreted (codegen pin)") {
    // the native Expression's entire value is the fused int loop
    // compiled into generated code — if it ever regressed to a
    // CodegenFallback the measured 1.5× over the HOF chain (which IS
    // interpreted) would silently evaporate (the round-12 stale-claim
    // lesson). Two pins: (a) the class does not take the fallback
    // trait; (b) on a clean scan the operator computing pq_adc sits
    // inside a whole-stage-codegen span ("[codegen id : N]" in the
    // formatted executed plan). In q99 itself the scoring Project rides
    // directly on the BroadcastNestedLoopJoin whose build side is an
    // ObjectHashAggregate, which keeps that particular SPAN out of WSC —
    // but ProjectExec still compiles its expressions via UnsafeProjection
    // codegen, so the fused loop runs compiled there too.
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.functions.PqAdc]),
      "PqAdc must implement doGenCode, not fall back")
    // codes must depend on a non-foldable input (range id) or the whole
    // expression constant-folds into a LocalTableScan before execution
    val df = spark.range(2)
      .selectExpr("array(CAST(id AS INT), 1) AS codes",
        "array(array(10L, 20L), array(30L, 40L)) AS dt")
      .selectExpr("pq_adc(codes, dt) AS d")
    df.write.format("noop").mode("overwrite").save()
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val adcInCodegen = formatted.split("\\n\\n").exists(b =>
      b.contains("pq_adc") && b.contains("[codegen id :"))
    assert(adcInCodegen,
      "pq_adc fell out of whole-stage codegen:\n" + formatted.take(4000))
    // id=0 → t[0][0]+t[1][1] = 50; id=1 → t[0][1]+t[1][1] = 60
    assert(df.orderBy("d").collect().map(_.getLong(0)).toSeq === Seq(50L, 60L))
  }

  test("q100: Hamming scan touches signatures only; vectors read post-filter") {
    val df = SparkEntry.queries("q100_binary_quant_rerank")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "query signatures / candidate list should broadcast:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), "all-pairs over full vectors")
    assert(!p.contains("SortMergeJoin"),
      "rerank fetch must stay broadcast — candidates are Q×R rows:\n" + p.take(1500))
  }

  test("q101: LM training and scoring stay in equi-join land; V broadcasts") {
    val p = plan("q101_lm_perplexity")
    assert(!p.contains("CartesianProduct"), "corpus×corpus leaked into the LM")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the one-row vocab count should ride along broadcast:\n" + p.take(1500))
  }

  test("q102: DSIR selection is TakeOrderedAndProject, never a global window") {
    val p = plan("q102_dsir_selection")
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 must be a distributed top-k, not sort-all or a window:\n" + p.take(1500))
    assert(!p.contains("Window"), "global row_number would single-partition")
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q105/q110/q115: curation joins stay in equi-join land") {
    for (q <- Seq("q105_dup_gram_fraction", "q110_leakage_safe_split",
        "q115_snapshot_diff")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q:\n" + p.take(1500))
    }
  }

  test("q104: each GD pass is a map-side-combinable aggregate, join-free") {
    // the training passes run inside the query function; the RETURNED
    // plan is the confusion aggregate over the same feature frame — it
    // must be a partial/final HashAggregate pair with no join anywhere
    val df = SparkEntry.queries("q104_quality_classifier")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    // localCheckpoint truncates the executed plan; assert on the shape
    // of a raw (un-checkpointed) training pass instead
    val f = graft.operators.Curation.featureFrameOf(
      graft.core.Tables.load(spark, sf0001, "documents"))
    val pass = f.agg(org.apache.spark.sql.functions.avg("x1"))
      .queryExecution.executedPlan.toString
    assert(pass.contains("HashAggregate") && pass.contains("partial_avg"),
      "GD pass must partial-aggregate map-side:\n" + pass.take(1500))
    assert(!pass.contains("Join"), "GD pass must be join-free")
    assert(df.collect().length === 1 && p.nonEmpty)
  }

  test("q109: tokenize joins the vocab without a cartesian") {
    val p = plan("q109_bpe_tokenize")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("q121: recount filters to sketch candidates BEFORE the aggregate") {
    // the scalability claim: pass 2's exchange carries only rows matching
    // ≤cap candidate literals — the IN filter must sit under the partial
    // aggregate, so the full token domain never crosses a shuffle
    val p = plan("q121_heavy_hitters")
    val aggAt = p.indexOf("partial_count")
    // Spark prints a large literal IN as INSET, a small one as IN
    val filterAt = math.max(p.indexOf(" INSET "), p.indexOf(" IN ("))
    assert(aggAt >= 0 && filterAt >= 0, p.take(1500))
    assert(aggAt < filterAt, // root-first print: child filter BELOW the agg
      "candidate IN-filter must be a child of the partial aggregate:\n" +
        p.take(1500))
    assert(!p.contains("Window"), "no window in the heavy-hitter plan")
  }

  test("q122: phash dedup is one hash agg over fingerprints, no joins") {
    val p = plan("q122_image_phash_dedup")
    assert(!p.contains("Join"), "no pairwise comparisons:\n" + p.take(1500))
    assert(p.contains("partial_count"), "fingerprint agg must combine map-side")
  }

  test("q123: quantile histogram pass is a partial agg — no sort/window") {
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).toDF("v")
    val p = graft.operators.ExactQuantile
      .histogramPass(df, "v", Seq((0, 0L, 999L, 250L), (1, 100L, 499L, 100L)))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count"), "bucket counts must combine map-side:\n" + p)
    assert(!p.contains("Sort") && !p.contains("Window"),
      "no sort/window anywhere in the selection pass:\n" + p)
  }

  test("q124: chunking is map-only until the presentation sort") {
    val p = plan("q124_doc_chunking")
    assert(!p.contains("Exchange hashpartitioning"), p.take(1500))
    assert(!p.contains("Join"), "chunking must not join")
  }

  test("q126: weighted sample is TakeOrderedAndProject, never a sort") {
    val p = plan("q126_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("Join"), "priority sampling must not join")
  }

  test("q127: every PageRank round stays in equi-join land") {
    val p = plan("q127_neardup_pagerank")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("q131/q132: normalization and blocklist gates are map-only") {
    for (q <- Seq("q131_nfc_normalize", "q132_blocklist_gate")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"), s"$q:\n" + p.take(1500))
      assert(!p.contains("Join"), s"$q must not join")
    }
    // the NFC expression must sit inside a whole-stage-codegen span
    // (AQE only shows final stages after execution — q01's technique)
    val df = SparkEntry.queries("q131_nfc_normalize")(spark, sf0001)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("*(") && executed.contains("nfc_normalize"),
      executed.take(1500))
  }

  test("q133: canonical pick is one partial-aggregable max_by, no window") {
    val p = plan("q133_canonical_by_quality")
    assert(p.contains("max_by"), p.take(1500))
    assert(!p.contains("Window"), "no window sort for the canonical pick")
  }

  test("q134: sparse cosine ranks through TopKPerKey, no window, no cartesian") {
    val p = plan("q134_sparse_cosine_topk")
    assert(p.contains("TopKPerKey "), p.take(2000))
    assert(!p.contains("Window"), "top-3 must not window-sort the pair set")
    assert(!p.contains("CartesianProduct"), "postings join must stay equi")
  }

  test("q135: retention cohorts stay in equi-join land") {
    val p = plan("q135_retention_cohorts")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("Window"), "cohort assignment is an agg, not a window")
  }

  test("q136: stratified exact-k plans through TopKPerKey, not a window") {
    val p = plan("q136_stratified_exact_k")
    assert(p.contains("TopKPerKey "), p.take(1500))
    assert(!p.contains("Window"), "per-stratum k must not window-sort")
  }

  test("q137: entropy gate is map-only — no exchange but the sort") {
    val p = plan("q137_entropy_gate")
    assert(!p.contains("Exchange hashpartitioning"), p.take(1500))
    assert(!p.contains("Join") && !p.contains("Generate"),
      "entropy must stay per-row: no join, no explode")
  }

  test("q138: exact set-sim join is equi-only, no window, no cartesian") {
    val p = plan("q138_exact_setsim_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("Window"), "per-doc ordering must be sort_array, not a window")
  }

  test("q167: Pareto deciles assign map-side — no window, no global sort") {
    val p = plan("q167_revenue_pareto")
    assert(!p.contains("Window"),
      "decile assignment must be broadcast-edge comparisons, not ntile:\n" +
        p.take(1500))
  }

  test("no partition-less window anywhere in main source") {
    // Window.orderBy without partitionBy moves ALL rows through one task
    // — the q167/q99 scale-killers round 10's verdict flagged. Pin it to
    // zero so a future query can't reintroduce one silently.
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get("src/main/scala")
    val hits = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        new String(Files.readAllBytes(p)).linesIterator.zipWithIndex
          .filter(_._1.contains("Window.orderBy"))
          .map { case (l, i) => s"$p:${i + 1}: ${l.trim}" }
      }.toList
    assert(hits.isEmpty, "partition-less windows found:\n" + hits.mkString("\n"))
  }

  test("q171: PII redaction is map-only to the agg, nation dim broadcast") {
    val p = plan("q171_pii_redact")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      "redaction must stay per-row + broadcast dim:\n" + p.take(1500))
  }

  test("q172: recall eval joins pair keys equi-only") {
    val p = plan("q172_lsh_recall_eval")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q176: HTML extraction is map-only to the agg — no join, no window") {
    val p = plan("q176_html_strip")
    assert(!p.contains("Join") && !p.contains("Window"),
      "the scrub must stay per-row:\n" + p.take(1500))
  }

  test("q178: incremental IVF assignment broadcasts the codebook") {
    val p = plan("q178_ivf_incremental")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "codebook must broadcast:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      p.take(1500))
  }

  test("q179: drift join is equi-only, decimal sums exact") {
    val p = plan("q179_corpus_drift")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(p.contains("FullOuter"), "snapshot diff must be a full outer join")
  }

  test("q139: image near-dup candidates come from a band equi-join") {
    val p = plan("q139_image_phash_neardup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "phash pairs must band-join, never all-pairs:\n" + p.take(2000))
  }

  test("q183: AVI frame sampling stays partition-local — no join, no window") {
    val p = plan("q183_avi_frame_sample")
    assert(!p.contains("Join") && !p.contains("Window"),
      "video decode must be per-row map work:\n" + p.take(1500))
  }

  test("q188/q189: keyframe + acoustic near-dup candidates band-join") {
    for (q <- Seq("q188_video_phash_neardup", "q189_audio_fingerprint_neardup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q fingerprint pairs must band-join, never all-pairs:\n" + p.take(2000))
    }
  }

  test("q191: IVF eval search joins are cluster-equi; no cartesian") {
    val p = plan("q191_ivf_recall_eval")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // BroadcastNestedLoopJoins here are only the intended bounded
    // attaches: the K-row centroid broadcast inside the probe leg and
    // the n/100-query brute-force ground truth — both now sit BEHIND
    // localCheckpoints (the single shared nprobe=4 candidate frame), so
    // the final plan may contain no BNLJ at all. If one remains, its
    // build side must be a broadcast, never the corpus.
    assert(!p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BuildRight") || p.contains("BuildLeft"), p.take(1500))
  }

  test("q193: archive ingest stays partition-local — no join, no window") {
    val p = plan("q193_warc_gzip_ingest")
    assert(!p.contains("Join") && !p.contains("Window"),
      "gzip member walk must be per-row map work:\n" + p.take(1500))
  }

  test("q194: trimmed means broadcast the edge frame — no sort, no cartesian") {
    val p = plan("q194_trimmed_mean")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"),
      "per-group edges must broadcast to the value scan:\n" + p.take(1500))
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      p.take(1500))
  }

  test("q190: cross-modal dedup report is four fingerprint groupBys — no join") {
    val p = plan("q190_multimodal_dedup_report")
    assert(!p.contains("Join") && !p.contains("Window"),
      "every modality leg must be map-fingerprint + hash groupBy:\n" + p.take(2000))
    assert(p.contains("Union"), p.take(1500))
  }

  test("q185: shot stats stay partition-local — no join, no window") {
    val p = plan("q185_video_shot_stats")
    assert(!p.contains("Join") && !p.contains("Window"),
      "shot detection must be per-row map work:\n" + p.take(1500))
  }

  test("q186: video dedup is hash groupBys on the fingerprint — no join") {
    val p = plan("q186_video_exact_dedup")
    assert(!p.contains("Join") && !p.contains("Window"),
      "exact video dedup must never pair videos:\n" + p.take(1500))
    assert(p.contains("HashAggregate"), p.take(1500))
  }

  test("q187: cut accounting joins equi-only — never doc×doc") {
    val p = plan("q187_substring_dedup_cut")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "flagged windows must equi-join on hash:\n" + p.take(2000))
  }

  test("q184: span pairing is equi-only; islands window is partitioned") {
    val p = plan("q184_longest_dup_span")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "matched windows must equi-join on the hash, never all-pairs:\n" +
        p.take(2000))
  }

  test("q196: HLL registers reduce map-side — partial agg before exchange") {
    val p = plan("q196_hll_cardinality")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // the register fold must be a two-phase hash aggregate: a
    // partial_max(rho) above the scan is the sketch's mergeability
    assert(p.contains("partial_max"),
      "register max must partial-aggregate map-side:\n" + p.take(2000))
  }

  test("q197/q198: bounded sketch/bitset sides broadcast to the probes") {
    val p197 = plan("q197_cms_frequency")
    assert(p197.contains("BroadcastHashJoin"),
      "the 2048-cell CMS table must broadcast:\n" + p197.take(2000))
    assert(!p197.contains("CartesianProduct"), p197.take(1500))
    val p198 = plan("q198_bloom_prefilter")
    assert(p198.contains("BroadcastHashJoin"),
      "the occupied-bit set must broadcast:\n" + p198.take(2000))
    assert(!p198.contains("CartesianProduct"), p198.take(1500))
  }

  test("q199: linkage candidates come from an equi-join block, no window") {
    val p = plan("q199_record_linkage")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "blocking must be a prefix equi-join, never all-pairs:\n" + p.take(2000))
    assert(!p.contains("Window"),
      "best-match must be a struct-min hash aggregate:\n" + p.take(2000))
  }

  test("q201: containment pairs come from the shingle equi-join") {
    val p = plan("q201_containment_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "snippet×doc pairs must share a shingle hash, never all-pairs:\n" +
        p.take(2000))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("q202: register merge is window-free and partial-aggregated") {
    val p = plan("q202_hll_sliding_window")
    assert(!p.contains("Window"),
      "the sliding union must be register explode + re-max, not a " +
        "distinct-over-window:\n" + p.take(2000))
    assert(p.contains("partial_max"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q203: KMV sketches build through TopKPerKeyExec, not a window") {
    val p = plan("q203_kmv_overlap")
    assert(p.contains("TopKPerKey"),
      "the k-minimum-values selection must plan as the custom " +
        "partial/final top-k operator:\n" + p.take(2000))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("q204: zone-map eval is window-free; box joins broadcast 3 rows") {
    val p = plan("q204_zorder_layout")
    assert(!p.contains("Window"),
      "bucketing must be arithmetic, not an ordered window:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the only nested-loop joins are the 3-literal-row box attaches —
    // they must build on the broadcast side
    if (p.contains("BroadcastNestedLoopJoin"))
      assert(p.contains("BuildRight") || p.contains("BuildLeft"), p.take(1500))
  }

  test("q205: funnel stages are hash aggregates + user-key equi-joins") {
    val p = plan("q205_event_funnel")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      "each step must be a grouped min + equi-join, not an ordered " +
        "per-user scan:\n" + p.take(2000))
  }

  test("q206: JL sign matrix constant-folds; projection is map-only") {
    val df = SparkEntry.queries("q206_jl_projection")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      p.take(1500))
    // the md5-derived matrix must fold at plan time: no md5 call may
    // survive into the executed plan
    assert(!p.toLowerCase.contains("md5"),
      "sign matrix should be constant-folded:\n" + p.take(2000))
  }

  test("q207: OHLC bars are one hash aggregate over a broadcast dim join") {
    val p = plan("q207_ohlc_downsample")
    assert(!p.contains("Window"),
      "open/close must be min_by/max_by aggregates, not first/last over " +
        "an ordered window:\n" + p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q208: path mining has no ordered window; per-user arrays only") {
    val p = plan("q208_event_paths")
    // (the sort_array call itself lives inside a Project whose
    // expression list the plan toString truncates — the absence of any
    // Window/Sort-within-groups operator is the pin)
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("q209: skyline's exact phase runs on the pruned broadcast set") {
    val p = plan("q209_skyline")
    assert(!p.contains("CartesianProduct"),
      "the dominance anti-join must be broadcast over the pruned " +
        "candidates, never corpus x corpus:\n" + p.take(2000))
    assert(!p.contains("Window"), p.take(1500))
    assert(p.contains("BroadcastNestedLoopJoin") &&
      (p.contains("BuildRight") || p.contains("BuildLeft")), p.take(1500))
  }

  test("q200: pagerank iterations join equi-only on node keys") {
    val p = plan("q200_pagerank_trade_graph")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "rank flow must equi-join edges to ranks:\n" + p.take(2000))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("q211: label propagation supersteps are window-free equi-joins") {
    val p = plan("q211_label_propagation")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "neighbor labels must arrive via the edge equi-join:\n" + p.take(2000))
    // argmax label = STRUCT MIN on (-count, label), never a ranked window
    assert(!p.contains("Window"), p.take(1500))
  }

  test("q212: personalized pagerank shares q200's plan discipline") {
    val p = plan("q212_personalized_pagerank")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("q213: SSSP relaxations are equi-joins + min aggregates, no window") {
    val p = plan("q213_weighted_sssp")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "each superstep must equi-join frontier to edges:\n" + p.take(2000))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("q214: trend sums are two-phase hash aggregates over a broadcast dim") {
    val p = plan("q214_price_trend")
    assert(p.contains("BroadcastHashJoin"),
      "the part dim must broadcast:\n" + p.take(2000))
    assert(p.contains("partial_sum"),
      "the OLS sums must partial-aggregate map-side:\n" + p.take(2000))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("q215: tar ingest stays partition-local — no join, no window") {
    val p = plan("q215_tar_ingest")
    assert(!p.contains("Join") && !p.contains("Window"),
      "archives must never shuffle:\n" + p.take(2000))
  }

  test("q216: intra-doc dedup is per-doc hash aggregates, no window") {
    val p = plan("q216_intradoc_dedup")
    assert(!p.contains("Window"),
      "first-occurrence must be a (doc, chunk) min aggregate:\n" +
        p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("q217: the quantile sketch reduces map-side; estimate is bounded") {
    // the bucket-count build itself (it sits behind a localCheckpoint in
    // the query, so pin its shape directly): counts must
    // partial-aggregate before the exchange — the mergeability that IS
    // the sketch
    import org.apache.spark.sql.functions._
    val sk = graft.core.Tables.load(spark, sf0001, "lineitem")
      .select(round(col("l_extendedprice") * 100, 0).cast("long").as("c"),
        col("l_returnflag").as("g"))
      .withColumn("bucket", expr(
        "shiftleft(shiftright(c, greatest(length(bin(c)) - 8, 0)), " +
          "greatest(length(bin(c)) - 8, 0))"))
      .groupBy("g", "bucket").agg(count(lit(1)).as("cnt"))
    val ps = sk.queryExecution.executedPlan.toString
    assert(ps.contains("partial_count"),
      "bucket counts must partial-aggregate map-side:\n" + ps.take(2000))
    // the full query: estimate selection is a min aggregate over the
    // bounded sketch frame, never a corpus sort or cartesian
    val p = plan("q217_hdr_quantile_sketch")
    assert(p.contains("partial_min"),
      "estimate must be a min aggregate over sketch rows:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q225: forward as-of is one user-partitioned window, no range join") {
    val p = plan("q225_asof_forward_tolerance")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the tolerance must be a post-match filter, not a range join:\n" +
        p.take(2000))
    assert(p.contains("Window"), p.take(1500))
  }

  test("q224: window quantiles merge monthly buckets — no fact re-scan") {
    val p = plan("q224_hdr_sliding_quantiles")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // the window targets broadcast to the ≤2.6k-row merged sketch
    assert(p.contains("BroadcastHashJoin"),
      "rank targets must broadcast into the bucket frame:\n" + p.take(2000))
  }

  test("q218: RRF rankers end in top-k, fusion never sorts the corpus") {
    val p = plan("q218_rrf_fusion")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("Window"),
      "positions are assigned on the bounded winner list, not a " +
        "partition-less window:\n" + p.take(2000))
  }

  test("q220: keyness ranks a bounded term frame; the fact never sorts") {
    val p = plan("q220_distinctive_terms")
    // the only nested-loop join is the broadcast ONE-ROW corpus-total
    // attach (the repo-wide scalar crossJoin pattern); a real cartesian
    // would show CartesianProduct
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the only window runs partitioned by source over the bounded
    // (source, term) count frame, and Spark's rank-limit pushdown
    // (WindowGroupLimit) caps each partition's sort at the top 5 —
    // the token stream itself is never globally ordered
    assert(p.contains("WindowGroupLimit"),
      "the rk <= 5 filter must push into the window:\n" + p.take(2000))
  }

  test("q221: join-size estimate joins two bounded cell frames") {
    val p = plan("q221_join_size_sketch")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "the ≤16k-cell orders sketch must broadcast into the dot " +
        "product:\n" + p.take(2000))
    // the cell vectors now derive from the checkpointed per-key count
    // frames (sum(cnt) per coordinate), so the map-side combine is a
    // partial_sum over the bounded key domain instead of a partial_count
    // over every exploded fact row
    assert(p.contains("partial_sum"),
      "cell counts must partial-aggregate map-side:\n" + p.take(2000))
  }

  test("q223: every blocking strategy is an equi-join on a derived key") {
    val p = plan("q223_blocking_recall")
    assert(!p.contains("CartesianProduct"),
      "candidates must come from (strategy, key) equi-joins — the " +
        "one-row n_variants attach is the only nested loop:\n" + p.take(2000))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("q222: novelty is df-join + two hash aggregates off the spill") {
    val p = plan("q222_ngram_novelty")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("q219: source-pair candidates come from the shingle equi-join") {
    val p = plan("q219_source_similarity")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "source pairs must share a shingle hash, never source×source " +
        "over rows:\n" + p.take(2000))
    assert(!p.contains("Window"), p.take(1500))
  }
}
