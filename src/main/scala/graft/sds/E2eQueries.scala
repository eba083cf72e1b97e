package graft.sds

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import Fixtures._

/** End-to-end SDS pipeline queries under the DuckDB correctness gate.
  *
  * The engine's signature feature — JSON wire decode → address dispatch →
  * entity transform → SCD2 merge → store round-trip (reference
  * `src/event_handler.rs:28-60,205-437`) — was previously validated only
  * by ScalaTest. These queries derive a deterministic event-batch log
  * from the fixture tables, push it through the REAL `Pipeline.applyBatch`
  * (multi-batch, so incremental cross-batch version chaining is on the
  * hook), and emit the resulting SCD2 tables; the oracle recomputes the
  * same intervals relationally in DuckDB from the same base tables.
  *
  * Inputs are bounded on purpose (≤100 blocks regardless of SF): the gate
  * checks pipeline CORRECTNESS; ingest THROUGHPUT is measured separately
  * by `graft.IngestBench`. `graft.Bench` excludes these names for the
  * same reason.
  */
object E2eQueries {

  private val MaxBlock = Long.MaxValue // 9223372036854775807

  /** Ingest per-block EventList JSON rows (`value`, keyed by `block`)
    * through the real pipeline in ordered micro-batches. Returns the
    * store and its temp root (so `detach` can reclaim it). */
  private def ingest(s: SparkSession, batches: DataFrame,
                     ranges: Seq[(Long, Long)]): (Scd2Store, String) = {
    val root = Files.createTempDirectory("sds-e2e").toString
    val store = new Scd2Store(s, root)
    ranges.foreach { case (lo, hi) =>
      val chunk = batches.filter(col("block").between(lo, hi)).select("value")
      Pipeline.applyBatch(store, chunk)
    }
    (store, root)
  }

  /** Materialize the result off the store, then delete the temp store —
    * repeated Verify runs must leave /tmp flat (the result frame would
    * otherwise pin the store paths for its whole lifetime). */
  private def detach(df: DataFrame, storeRoot: String): DataFrame = {
    val pinned = df.localCheckpoint(true)
    val p = new org.apache.hadoop.fs.Path(storeRoot)
    p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      .delete(p, true)
    pinned
  }

  val defs: Seq[Q] = Seq(

    // ---- q56: agents through decode→SCD2, multi-batch version chains ----
    // 100 supplier rows → 50 agents × 2 versions across 2 micro-batches;
    // the oracle recomputes the version intervals with a lead() window
    // (reference close-out semantics, `src/event_handler.rs:205-254`).
    Q("q56_sds_agents_scd2",
      s"""WITH upd AS (
        |  SELECT 'agent_' || CAST(s_suppkey % 50 AS VARCHAR) AS public_key,
        |         'org_' || CAST(s_suppkey % 10 AS VARCHAR) AS organization_id,
        |         s_name AS name,
        |         CAST(s_suppkey AS BIGINT) AS "timestamp",
        |         CAST(s_suppkey AS BIGINT) AS start_block_num
        |  FROM supplier WHERE s_suppkey BETWEEN 1 AND 100),
        |v AS (
        |  SELECT *, lead(start_block_num)
        |    OVER (PARTITION BY public_key ORDER BY start_block_num) AS nxt
        |  FROM upd)
        |SELECT public_key, organization_id, name, "timestamp",
        |       start_block_num,
        |       CAST(coalesce(nxt, $MaxBlock) AS BIGINT) AS end_block_num
        |FROM v
        |ORDER BY public_key, start_block_num""".stripMargin) { (s, dir) =>
      import s.implicits._
      // BETWEEN 1 AND 100, not <= 100: s_suppkey starts at 0 in the
      // testdata and block numbers must start at 1 (0 is pre-genesis)
      val batches = Tables.load(s, dir, "supplier")
        .filter(col("s_suppkey").between(1, 100))
        .select(col("s_suppkey").cast("long"), col("s_name"))
        .as[(Long, String)]
        .map { case (block, name) =>
          val key = s"agent_${block % 50}"
          (block, batch(block, s"id_$block", Seq(Change(agentAddress(key), "SET",
            container(agentJson(publicKey = key, orgId = s"org_${block % 10}",
              name = name, timestamp = block))))))
        }.toDF("block", "value")
      val (store, root) = ingest(s, batches, Seq((1L, 50L), (51L, 100L)))
      detach(store.table("agents")
        .select("public_key", "organization_id", "name", "timestamp",
          "start_block_num", "end_block_num")
        .orderBy("public_key", "start_block_num"), root)
    },

    // ---- q57: org child-table close-out under parent version markers ----
    // 25 orgs from nation, two versions each; odd orgs drop their contact
    // in v2 — the closed row exists ONLY if the parent version marker
    // machinery works (an empty replacement set has no update row of its
    // own to close the old one; `src/event_handler.rs:256-310`).
    Q("q57_sds_contacts_closeout",
      s"""WITH k AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
        |v1 AS (
        |  SELECT 'org_' || CAST(k AS VARCHAR) AS organization_id,
        |         'c_' || CAST(k AS VARCHAR) AS name,
        |         'p1_' || CAST(k AS VARCHAR) AS phone_number,
        |         'en' AS language_code,
        |         k + 1 AS start_block_num,
        |         k + 101 AS end_block_num
        |  FROM k),
        |v2 AS (
        |  SELECT 'org_' || CAST(k AS VARCHAR) AS organization_id,
        |         'c_' || CAST(k AS VARCHAR) AS name,
        |         'p2_' || CAST(k AS VARCHAR) AS phone_number,
        |         'en' AS language_code,
        |         k + 101 AS start_block_num,
        |         CAST($MaxBlock AS BIGINT) AS end_block_num
        |  FROM k WHERE k % 2 = 0)
        |SELECT * FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
        |ORDER BY organization_id, start_block_num, phone_number""".stripMargin) { (s, dir) =>
      import s.implicits._
      def contact(k: Long, tag: String): String =
        s"""{"name":"c_$k","phone_number":"${tag}_$k","language_code":"en"}"""
      def orgJson(k: Long, name: String, contacts: Option[String]): String =
        s"""{"id":"org_$k","name":"$name","organization_type":"CERTIFYING_BODY"""" +
          contacts.fold("")(c => s""","contacts":[$c]""") + "}"
      val batches = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("long"), col("n_name"))
        .as[(Long, String)]
        .flatMap { case (k, name) =>
          Seq(
            (k + 1, batch(k + 1, s"id_v1_$k", Seq(Change(orgAddress(s"org_$k"), "SET",
              container(orgJson(k, name, Some(contact(k, "p1")))))))),
            (k + 101, batch(k + 101, s"id_v2_$k", Seq(Change(orgAddress(s"org_$k"), "SET",
              container(orgJson(k, s"${name}_v2",
                if (k % 2 == 0) Some(contact(k, "p2")) else None)))))))
        }.toDF("block", "value")
      val (store, root) = ingest(s, batches, Seq((1L, 100L), (101L, 200L)))
      detach(store.table("contacts")
        .select("organization_id", "name", "phone_number", "language_code",
          "start_block_num", "end_block_num")
        .orderBy("organization_id", "start_block_num", "phone_number"), root)
    },

    // ---- q58: fork rewind e2e (W4) --------------------------------------
    // 5 region agents, an orphan block 6, then block 6 re-arrives with a
    // different id: the orphan's version must vanish entirely (not just
    // close) and the fork payload must win (`PipelineSpec` covers the
    // mechanism; this puts it under the DuckDB gate).
    Q("q58_sds_fork_rewind",
      s"""WITH base AS (
        |  SELECT 'agent_r' || CAST(r_regionkey AS VARCHAR) AS public_key,
        |         'org_r' AS organization_id, r_name AS name,
        |         CAST(r_regionkey + 1 AS BIGINT) AS "timestamp",
        |         CAST(r_regionkey + 1 AS BIGINT) AS start_block_num,
        |         CAST($MaxBlock AS BIGINT) AS end_block_num
        |  FROM region
        |  UNION ALL
        |  SELECT 'agent_x', 'org_x', 'forked', CAST(6 AS BIGINT),
        |         CAST(6 AS BIGINT), CAST($MaxBlock AS BIGINT))
        |SELECT * FROM base ORDER BY public_key""".stripMargin) { (s, dir) =>
      import s.implicits._
      def agentBatch(block: Long, id: String, key: String, name: String, org: String) =
        (block, batch(block, id, Seq(Change(agentAddress(key), "SET",
          container(agentJson(publicKey = key, orgId = org, name = name,
            timestamp = block))))))
      val regionAgents = Tables.load(s, dir, "region")
        .select(col("r_regionkey").cast("long"), col("r_name"))
        .as[(Long, String)]
        .map { case (k, name) =>
          agentBatch(k + 1, s"id_r$k", s"agent_r$k", name, "org_r")
        }.toDF("block", "value")
      val root = Files.createTempDirectory("sds-e2e").toString
      val store = new Scd2Store(s, root)
      Pipeline.applyBatch(store, regionAgents.select("value"))
      val orphanAndFork = Seq(
        agentBatch(6L, "id_orphan", "agent_x", "orphan", "org_x"),
        agentBatch(6L, "id_fork", "agent_x", "forked", "org_x"))
      orphanAndFork.foreach { case (_, json) =>
        Pipeline.applyBatch(store, s.createDataset(Seq(json)).toDF("value"))
      }
      detach(store.table("agents")
        .select("public_key", "organization_id", "name", "timestamp",
          "start_block_num", "end_block_num")
        .orderBy("public_key"), root)
    },

    // ---- q151: CDC change feed off the SCD2 store (Q-surface) -----------
    // q56's fixture (50 agents × 2 versions over 100 blocks) read back
    // through `Scd2Store.changes(since = 5)` (a cursor low enough that
    // the sf0.001 smoke fixture — 9 blocks of single versions — still
    // emits rows): post-images classify `opened`,
    // retired pre-images `closed` — the oracle recomputes the intervals
    // relationally and
    // applies the same two predicates. The read is manifest-tag pruned
    // like as-of (spec: ChangesSpec), so a near-head incremental poll
    // costs batches-since-cursor, not chain depth.
    Q("q151_sds_changes",
      s"""WITH upd AS (
        |  SELECT 'agent_' || CAST(s_suppkey % 50 AS VARCHAR) AS public_key,
        |         'org_' || CAST(s_suppkey % 10 AS VARCHAR) AS organization_id,
        |         s_name AS name,
        |         CAST(s_suppkey AS BIGINT) AS "timestamp",
        |         CAST(s_suppkey AS BIGINT) AS start_block_num
        |  FROM supplier WHERE s_suppkey BETWEEN 1 AND 100),
        |v AS (
        |  SELECT *, lead(start_block_num)
        |    OVER (PARTITION BY public_key ORDER BY start_block_num) AS nxt
        |  FROM upd),
        |t AS (
        |  SELECT public_key, organization_id, name, "timestamp",
        |         start_block_num,
        |         CAST(coalesce(nxt, $MaxBlock) AS BIGINT) AS end_block_num
        |  FROM v)
        |SELECT * FROM (
        |  SELECT *, 'opened' AS change_type FROM t
        |  WHERE start_block_num > 5
        |  UNION ALL
        |  SELECT *, 'closed' FROM t
        |  WHERE start_block_num <= 5 AND end_block_num > 5
        |    AND end_block_num <> $MaxBlock)
        |ORDER BY public_key, start_block_num""".stripMargin) { (s, dir) =>
      import s.implicits._
      val batches = Tables.load(s, dir, "supplier")
        .filter(col("s_suppkey").between(1, 100))
        .select(col("s_suppkey").cast("long"), col("s_name"))
        .as[(Long, String)]
        .map { case (block, name) =>
          val key = s"agent_${block % 50}"
          (block, batch(block, s"id_$block", Seq(Change(agentAddress(key), "SET",
            container(agentJson(publicKey = key, orgId = s"org_${block % 10}",
              name = name, timestamp = block))))))
        }.toDF("block", "value")
      val (store, root) = ingest(s, batches, Seq((1L, 50L), (51L, 100L)))
      detach(store.changes("agents", since = 5)
        .select(col("public_key"), col("organization_id"), col("name"),
          col("timestamp"), col("start_block_num"), col("end_block_num"),
          col("change_type"))
        .orderBy("public_key", "start_block_num"), root)
    }
  )
}
