package graft.sds

import org.apache.spark.sql.DataFrame

/** The store contract the SDS pipeline writes through — the seam between
  * the streaming merge logic ([[Pipeline.applyBatch]]) and the physical
  * sink. Two implementations:
  *
  *  - [[Scd2Store]]: the engine's native parquet live/history layout with
  *    manifest commits — the 100 TB path (and the documented swap target
  *    for Delta/Iceberg MERGE).
  *  - [[JdbcScd2Store]]: the literal-parity adapter for the reference's
  *    Postgres sink (`/root/reference/src/main.rs:47-56` writes via a
  *    Diesel connection; each block lands in one transaction,
  *    `src/event_handler.rs:34-35`) — same per-batch transactional
  *    semantics over any JDBC database.
  *
  * Contract (shared by both):
  *  - `applyMerged` ATOMICALLY replaces the live row set with `merged`'s
  *    live rows and appends `merged`'s newly-closed rows; history rows
  *    already closed are untouched. Replay-idempotent: re-applying the
  *    same batch leaves the table unchanged.
  *  - `compactTo` atomically replaces the WHOLE table (fork rewind /
  *    maintenance fold).
  *  - `appendBlocks` upserts the batch's (block_num, block_id) rows
  *    last-id-wins; `compactBlocks` replaces the whole log (fork).
  *  - A crash at any point leaves the previous committed state visible;
  *    the streaming engine replays the in-flight batch.
  */
trait SdsStore {
  /** Full SCD2 table (live ∪ history); `"blocks"` returns the commit log. */
  def table(name: String): DataFrame

  /** Live rows only (end_block_num = MaxBlockNum). */
  def live(name: String): DataFrame

  /** Commit one batch's merge result (see contract above). */
  def applyMerged(name: String, merged: DataFrame, tag: Long): Unit

  /** Replace the whole table atomically (fork rewind, maintenance). */
  def compactTo(name: String, full: DataFrame, tag: Long): Unit

  /** Append one batch of (block_num, block_id) to the commit log. */
  def appendBlocks(batch: DataFrame, tag: Long): Unit

  /** Replace the whole commit log (fork rewind). */
  def compactBlocks(full: DataFrame, tag: Long): Unit
}
