package graft.sds

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Schemas.MaxBlockNum

/** SCD Type 2 merge machinery (SURVEY.md §2.4, W1-W5).
  *
  * Tables are block-interval versioned: a row is valid on
  * `[start_block_num, end_block_num)`, the live version has
  * `end_block_num = MAX_BLOCK_NUM` (reference `src/event_handler.rs`
  * at_block impls). All operations below are set-wise DataFrame
  * transformations — a whole micro-batch of blocks merges in one pass
  * (window over version starts), no per-row driver loops — so the same
  * code scales from the local test store to a cluster; at 100 TB the
  * store layer would be swapped for Delta/Iceberg MERGE while this
  * version-chaining logic stays identical.
  *
  * Versioning model: `entityKey` is the close-out scope (the parent
  * entity's PK). An update at block b replaces the entity's child-row set
  * wholesale: previous versions close at b (W2), and re-applying the same
  * block is a no-op (exactly-once via idempotent merge, SURVEY §7.4).
  */
object Scd2 {

  /** Merge a batch of new entity versions into an existing SCD2 table.
    *
    * @param existing  current table contents
    * @param updates   new rows stamped (start_block_num=b, end_block_num=MAX)
    * @param entityKey columns identifying the entity whose version chain
    *                  advances (e.g. organization_id for contacts)
    */
  def merge(existing: DataFrame, updates: DataFrame, entityKey: Seq[String]): DataFrame = {
    val cols = existing.columns.toSeq
    val keyCols = entityKey.map(col)

    // A version event (entityKey, start) in `updates` replaces any stored
    // rows of the same entity version wholesale → idempotent replay.
    val newVersions = updates.select(entityKey.map(col) :+ col("start_block_num"): _*).distinct()
    val kept = existing.join(newVersions,
      entityKey :+ "start_block_num", "left_anti")

    val combined = kept.select(cols.map(col): _*)
      .unionByName(updates.select(cols.map(col): _*))

    // Close-out (W2): each version ends where the entity's next version
    // starts; rows already closed earlier (assertion DELETE, W3) keep
    // their earlier end.
    val w = Window.partitionBy(keyCols: _*).orderBy(col("start_block_num"))
    val versions = combined
      .select(entityKey.map(col) :+ col("start_block_num"): _*).distinct()
      .withColumn("_next_start", lead(col("start_block_num"), 1).over(w))

    combined
      .join(versions, entityKey :+ "start_block_num")
      .withColumn("end_block_num",
        least(col("end_block_num"), coalesce(col("_next_start"), lit(MaxBlockNum))))
      .select(cols.map(col): _*)
  }

  /** W3: close live rows matched by `keyCol` at the delete's block_num —
    * no replacement row. `deletes` = (block_num, <keyCol>); tiny per
    * batch → broadcast. */
  def applyDeletes(table: DataFrame, deletes: DataFrame, keyCol: String): DataFrame = {
    val cols = table.columns.toSeq
    val d = broadcast(deletes.groupBy(col(keyCol).as("_del_key"))
      .agg(min("block_num").as("_del_block")))
    table
      .join(d, col(keyCol) === col("_del_key"), "left")
      .withColumn("end_block_num",
        when(col("_del_block").isNotNull &&
            col("start_block_num") <= col("_del_block") &&
            col("end_block_num") > col("_del_block"),
          col("_del_block"))
          .otherwise(col("end_block_num")))
      .select(cols.map(col): _*)
  }

  /** W4 fork rewind: drop versions born at or after the fork point and
    * re-open versions that were closed by orphaned blocks. */
  def rewind(table: DataFrame, forkBlock: Long): DataFrame =
    table
      .filter(col("start_block_num") < forkBlock)
      .withColumn("end_block_num",
        when(col("end_block_num") >= forkBlock, lit(MaxBlockNum))
          .otherwise(col("end_block_num")))
}

/** Parquet-backed store for the SDS reporting tables.
  *
  * Layout: `<root>/<table>/v<N>/` + pointer file `<root>/<table>/LATEST`.
  * A merge writes the next version directory, flips the pointer, then
  * removes the previous one — readers never observe a half-written table
  * and a crash between write and flip just re-applies an idempotent
  * batch (W1's per-block transaction analog). Production swap-in: Delta
  * MERGE with partition `live = end_block_num = MAX` for partition-pruned
  * live-state reads.
  */
final class Scd2Store(spark: SparkSession, root: String) {
  import java.nio.file.{Files, Paths, Path}
  import scala.jdk.CollectionConverters._

  private def dir(name: String): Path = Paths.get(root, name)
  private def pointer(name: String): Path = dir(name).resolve("LATEST")

  private def currentVersion(name: String): Option[Int] =
    if (Files.exists(pointer(name)))
      Some(Files.readString(pointer(name)).trim.toInt)
    else None

  private def empty(name: String): DataFrame = {
    val schema = if (name == "blocks") Schemas.blocksTable else Schemas.tables(name)._1
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def read(name: String): DataFrame =
    currentVersion(name) match {
      case Some(v) =>
        val p = dir(name).resolve(s"v$v")
        // a partitioned write of an empty table leaves no data files at
        // all — schema inference would fail, so detect and short-circuit
        val hasData = Files.walk(p).iterator.asScala
          .exists(_.getFileName.toString.endsWith(".parquet"))
        if (hasData) spark.read.parquet(p.toString) else empty(name)
      case None => empty(name)
    }

  def table(name: String): DataFrame = {
    val df = read(name)
    if (df.columns.contains("_live")) df.drop("_live") else df
  }

  /** Entity tables are partitioned live vs history (SURVEY.md §4): the
    * live partition holds exactly one row per entity, so current-state
    * queries scan it alone via partition pruning no matter how deep the
    * history grows. */
  def write(name: String, df: DataFrame): Unit = {
    val prev = currentVersion(name)
    val next = prev.getOrElse(-1) + 1
    val target = dir(name).resolve(s"v$next")
    if (name == "blocks") df.write.mode("overwrite").parquet(target.toString)
    else df.withColumn("_live", col("end_block_num") === Schemas.MaxBlockNum)
      .write.mode("overwrite").partitionBy("_live").parquet(target.toString)
    Files.createDirectories(dir(name))
    Files.writeString(pointer(name), next.toString)
    prev.foreach { v =>
      val old = dir(name).resolve(s"v$v")
      if (Files.exists(old))
        Files.walk(old).iterator.asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  /** Live-state view (Q1): one row per entity, served from the live
    * partition only (partition-pruned scan). */
  def live(name: String): DataFrame = {
    val df = read(name)
    if (df.columns.contains("_live"))
      df.filter(col("_live").cast("string") === "true").drop("_live")
    else df.filter(col("end_block_num") === MaxBlockNum)
  }

  /** Point-in-time view (Q2): state as of block b. */
  def asOf(name: String, block: Long): DataFrame =
    table(name).filter(col("start_block_num") <= block && col("end_block_num") > block)

  /** Highest stored block (catch-up cursor, `src/main.rs:57-63`). */
  def maxBlock(): Option[Long] = {
    val rows = table("blocks").agg(max("block_num")).collect()
    Option(rows(0).get(0)).map(_.asInstanceOf[Long])
  }

  /** S3: last `count` known block ids, newest first; genesis fallback
    * NULL_BLOCK_ID (`src/subscriber.rs:20-21,153-178`). */
  def lastKnownBlockIds(count: Int = 10): Seq[String] = {
    val ids = table("blocks").orderBy(col("block_num").desc)
      .select("block_id").limit(count).collect().map(_.getString(0)).toSeq
    if (ids.isEmpty) Seq("0000000000000000") else ids
  }
}
