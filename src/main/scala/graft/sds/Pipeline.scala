package graft.sds

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** End-to-end SDS pipeline wiring (SURVEY.md §3).
  *
  * The reference's poll loop (`src/subscriber.rs:58-106`) maps to a
  * Structured Streaming query: source → decode → foreachBatch (the W1
  * per-block transaction analog). The pipeline is generic over any
  * `Dataset[String]` of JSON EventList batches:
  *  - tests: `MemoryStream[String]` (or `applyBatch` directly)
  *  - files: `fromFiles` (replay / backfill)
  *  - production: a ZMQ DSv2 `MicroBatchStream` connector (see ZmqSource)
  *
  * Crash-stop consistency (`src/subscriber.rs:91`): any batch error fails
  * the query; restart resumes from the checkpoint and the idempotent
  * merge re-applies the in-flight batch as a no-op.
  */
object Pipeline {
  /** Concurrent entity-table merges per micro-batch. Small on purpose:
    * each merge already fans out across executors; the pool only overlaps
    * job-scheduling gaps and per-table file IO. */
  private val MergeParallelism = 4


  /** One micro-batch through decode → fork-rewind → SCD2 merges → blocks
    * append (reference `handle_events`, `src/event_handler.rs:28-60`).
    *
    * @param strict raise on namespace addresses with unknown entity infix
    *               (AnotherFamily error, `src/event_handler.rs:196-200`)
    */
  def applyBatch(store: SdsStore, raw: DataFrame, strict: Boolean = true): Unit = {
    val withBlock = Decode.withBlock(Decode.parseEnvelope(raw))
    // Per-batch reuse: decode once, feed 11 table extractions + blocks.
    withBlock.persist()
    try {
      // reference errors on a batch with events but no parseable
      // block-commit (`src/event_handler.rs:89-93`)
      if (strict && !withBlock.filter(col("block_num").isNull || col("block_id").isNull).isEmpty)
        throw new IllegalArgumentException(
          "event batch with events but no parseable block-commit")
      val incoming = Decode.blocks(withBlock)
        .filter(col("block_num").isNotNull && col("block_id").isNotNull)
        // D4 last()-wins also across duplicate block_nums inside one
        // batch — deterministically, by arrival order (_seq)
        .groupBy("block_num").agg(max_by(col("block_id"), col("_seq")).as("block_id"))
      // Small per batch (reference: exactly one block per EventList).
      val incomingBlocks = incoming.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      if (incomingBlocks.isEmpty) return // D2: heartbeat-only batch

      val sc = Decode.stateChanges(withBlock)
      sc.persist()
      try {
        // ONE summary aggregation replaces ~14 per-table isEmpty probes
        // (unknown-address check, delete probe, parent-marker probes, and
        // the per-table touched tests): (infix, change_type) → count,
        // collected as a ≤ 14-entry map. At high batch rates the probe
        // jobs, not the merges, were the per-batch floor.
        val touchCounts: Map[(String, String), Long] = sc
          .groupBy(graft.sds.Addressing.infixCol(col("address")).as("_ifx"),
            col("change_type").as("_ct"))
          .count().collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        def nOf(ifx: String, ct: String): Long = touchCounts.getOrElse((ifx, ct), 0L)
        if (strict && touchCounts.keys.exists {
            case (ifx, _) => !graft.sds.Addressing.Infix.all.contains(ifx) })
          throw new IllegalArgumentException(
            "state change address matches no entity type in the certificate_registry namespace")

        // W4: a stored block_num with a different block_id ⇒ fork; rewind
        // everything from the lowest colliding block before merging.
        // Distributed: broadcast the (batch-bounded) incoming set against
        // the stored log and bring back only the min colliding block_num —
        // driver cost stays O(1) however long the chain grows, vs the old
        // full-table collect that scaled with chain length.
        val collision = store.table("blocks")
          .join(broadcast(incoming.select(col("block_num").as("_bn"),
            col("block_id").as("_in_id"))), col("block_num") === col("_bn"))
          .filter(col("block_id") =!= col("_in_id"))
          .agg(min(col("block_num"))).head()
        val fork = if (collision.isNullAt(0)) None else Some(collision.getLong(0))

        val tables = Schemas.tables.keys.toSeq.sorted
        val deletes = Decode.assertionDeletes(sc)
        val batchTag = incomingBlocks.map(_._1).max

        import graft.sds.Addressing.Infix
        val hasDeletes = nOf(Infix.Assertion, "DELETE") > 0
        // Parent version markers: child tables version under their
        // parent's update even when the new child set is empty.
        val orgEvents = Decode.orgVersionEvents(sc)
        val stdEvents = Decode.standardVersionEvents(sc)
        val hasOrgEvents = nOf(Infix.Organization, "SET") > 0
        val hasStdEvents = nOf(Infix.Standard, "SET") > 0
        val childMarkers: Map[String, (DataFrame, Boolean)] = Map(
          "accreditations" -> (orgEvents, hasOrgEvents),
          "addresses" -> (orgEvents, hasOrgEvents),
          "authorizations" -> (orgEvents, hasOrgEvents),
          "contacts" -> (orgEvents, hasOrgEvents),
          "standard_versions" -> (stdEvents, hasStdEvents))
        // table → "its entity type appears with a SET in this batch".
        // For child tables this is the PARENT's flag — a superset of the
        // exact exploded-rows probe (parent updated, zero child rows),
        // where the merge correctly reduces to the marker close-out.
        val setTouched: Map[String, Boolean] = Map(
          "organizations" -> hasOrgEvents, "accreditations" -> hasOrgEvents,
          "addresses" -> hasOrgEvents, "authorizations" -> hasOrgEvents,
          "contacts" -> hasOrgEvents,
          "agents" -> (nOf(Infix.Agent, "SET") > 0),
          "certificates" -> (nOf(Infix.Certificate, "SET") > 0),
          "requests" -> (nOf(Infix.Request, "SET") > 0),
          "standards" -> hasStdEvents, "standard_versions" -> hasStdEvents,
          "assertions" -> (nOf(Infix.Assertion, "SET") > 0))

        // Entity tables are independent (separate store dirs, no
        // cross-table reads), so their merges run CONCURRENTLY on a small
        // pool — each merge is a short chain of small Spark jobs that
        // underutilizes the cluster alone; overlapping them pipelines job
        // scheduling and IO. The Spark scheduler interleaves concurrent
        // actions safely; shared inputs (sc, orgEvents) are cached.
        def mergeTable(t: String): Unit = {
          val updates = Decode.extractors(t)(sc)
          val markers = childMarkers.get(t)
          // skip tables this batch doesn't touch — decided entirely from
          // the one collected summary, zero extra Spark jobs
          val touched = setTouched(t) ||
            (t == "assertions" && hasDeletes) || fork.isDefined
          if (touched) {
            val events = markers.map(_._1)
            def mergedOver(base: DataFrame): DataFrame = {
              val m = Scd2.merge(base, updates, Schemas.tables(t)._2, events)
              if (t == "assertions") Scd2.applyDeletes(m, deletes, "address") else m
            }
            fork match {
              case Some(b) =>
                // W4: rare full pass — rewind live ∪ history, re-merge,
                // compact the store
                store.compactTo(t, mergedOver(Scd2.rewind(store.table(t), b)), batchTag)
              case None =>
                // incremental path: merge against the LIVE set only —
                // history is immutable, so per-batch cost is
                // O(live+batch), independent of history depth
                store.applyMerged(t, mergedOver(store.live(t)), batchTag)
            }
          }
        }
        // Shared marker frames feed up to 5 concurrent child merges —
        // persist so the JSON parse/explode/distinct runs once, not per
        // consumer.
        if (hasOrgEvents) orgEvents.persist()
        if (hasStdEvents) stdEvents.persist()
        val pool = java.util.concurrent.Executors.newFixedThreadPool(MergeParallelism)
        try {
          import scala.concurrent.{Await, ExecutionContext, Future}
          implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
          try Await.result(
            Future.sequence(tables.map(t => Future(mergeTable(t)))),
            scala.concurrent.duration.Duration.Inf)
          catch { case e: Throwable =>
            // a failed merge must not leave sibling merges writing in the
            // background: the streaming engine will replay this batch, and
            // a zombie writer racing the replay's writes on the same table
            // dir corrupts the live-version pointer. Interrupt and WAIT.
            pool.shutdownNow()
            pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
            throw e
          }
        } finally {
          pool.shutdown()
          if (hasOrgEvents) orgEvents.unpersist()
          if (hasStdEvents) stdEvents.unpersist()
        }

        // W5: blocks append — one O(batch) segment; the log reconciles
        // last-id-wins at read. A fork folds the rewound log instead
        // (rare), dropping orphaned blocks past the fork point.
        fork match {
          case Some(b) =>
            val base = store.table("blocks").filter(col("block_num") < b)
              .join(incoming.select(col("block_num").as("_bn")),
                col("block_num") === col("_bn"), "left_anti")
              .select("block_num", "block_id")
            store.compactBlocks(base.unionByName(incoming), batchTag)
          case None => store.appendBlocks(incoming, batchTag)
        }
      } finally sc.unpersist()
    } finally withBlock.unpersist()
  }

  /** Start the streaming pipeline over a Dataset[String] of JSON batches. */
  def start(batches: Dataset[String], store: SdsStore, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    batches.toDF("value").writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, _: Long) => applyBatch(store, df) }
      .start()

  /** File-source replay: a directory of JSON-lines EventList batch files. */
  def fromFiles(spark: SparkSession, inputDir: String, store: SdsStore,
                checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    start(spark.readStream.text(inputDir).as[String].coalesce(1), store, checkpointDir)
  }
}

/** S1/S2/S4 production source contract (stub — no validator/ZMQ in the
  * sandbox; reference `src/subscriber.rs`).
  *
  * The real connector is a DataSource V2 `MicroBatchStream`:
  *  - `initialOffset`: handshake with `ClientEventsSubscribeRequest`
  *    carrying the last ≤10 known block ids from `Scd2Store
  *    .lastKnownBlockIds` (S3; genesis fallback NULL_BLOCK_ID), shifting
  *    the window by 10 on UNKNOWN_BLOCK until a common ancestor is found
  *    (S4 fork negotiation, `src/subscriber.rs:97-100`). The handshake
  *    logic itself is implemented transport-agnostically in
  *    `graft.sources.Negotiate` (a ZMQ connector plugs its send/recv in
  *    as the `respond` function) and is wired into the block-log
  *    connector's `initialOffset` via the `knownBlockIds` option.
  *  - `latestOffset`/`planInputPartitions`: drain the ZMQ socket into the
  *    block-ordered batch of EventList payloads (poll timeout 1 s,
  *    `src/subscriber.rs:88`); one input partition — the validator is a
  *    single ordered stream, parallelism begins at the decode stage.
  *  - server-side filter: subscription carries `REGEX_ANY ^namespace` on
  *    `address` (S2) so deltas are pre-filtered before the wire.
  */
object ZmqSource {
  // single source of truth for the handshake constants: Negotiate
  val NullBlockId = graft.sources.Negotiate.NullBlockId
  val KnownCount = graft.sources.Negotiate.KnownCount
  // The exact frames this connector speaks — envelope, subscribe
  // request/response, namespace REGEX_ANY filter — are implemented and
  // loopback-tested in graft.sources.ZmqWire (only the raw DEALER
  // socket is absent offline): a production deployment passes the
  // socket's send/recv pair to ZmqWire.respondViaFrames and drives
  // Negotiate.negotiate with it.
  def connect(endpoint: String): Nothing =
    throw new UnsupportedOperationException(
      s"ZMQ socket layer not available in this environment (endpoint=$endpoint); " +
        "the wire codec is graft.sources.ZmqWire — plug a DEALER socket in, " +
        "or use Pipeline.fromFiles / a MemoryStream")
}
