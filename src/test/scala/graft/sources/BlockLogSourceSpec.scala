package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sds.{Fixtures, Pipeline, Scd2Store}
import graft.sds.Fixtures._

/** DSv2 block-log connector: batch read, micro-batch consumption into
  * the SDS pipeline, and checkpoint-resume (the S3 catch-up cursor). */
class BlockLogSourceSpec extends SparkSpec {

  private def writeBatch(dir: String, n: Int, content: String): Unit =
    Files.writeString(Paths.get(dir, f"batch-$n%05d.json"), content + "\n")

  private val fmt = classOf[BlockLogSource].getName

  test("batch read: one row per log file, in schema (value STRING)") {
    val dir = tempDir("blocklog")
    writeBatch(dir, 1, """{"events":[]}""")
    writeBatch(dir, 2, """{"events":[]}""")
    val df = spark.read.format(fmt).option("path", dir).load()
    assert(df.schema.fieldNames.toSeq === Seq("value"))
    assert(df.count() === 2)
  }

  test("micro-batch stream feeds the SCD2 pipeline; new files picked up") {
    val dir = tempDir("blocklog")
    val store = new Scd2Store(spark, tempDir("blocklog-store"))
    writeBatch(dir, 1, batch(1, "b1", Seq(Change(agentAddress(PublicKey), "SET",
      container(agentJson(name = "v1"))))))

    val stream = spark.readStream.format(fmt).option("path", dir).load()
    import spark.implicits._
    val query = Pipeline.start(stream.as[String], store, tempDir("blocklog-ckpt"))
    try {
      query.processAllAvailable()
      assert(store.live("agents").select("name").as[String].collect().toSeq === Seq("v1"))

      writeBatch(dir, 2, batch(5, "b5", Seq(Change(agentAddress(PublicKey), "SET",
        container(agentJson(name = "v2"))))))
      query.processAllAvailable()
      assert(store.live("agents").select("name").as[String].collect().toSeq === Seq("v2"))
      assert(store.maxBlock() === Some(5L))
    } finally query.stop()
  }

  test("restart resumes from the checkpoint offset (no re-read)") {
    val dir = tempDir("blocklog")
    val ckpt = tempDir("blocklog-ckpt")
    val store = new Scd2Store(spark, tempDir("blocklog-store"))
    import spark.implicits._

    writeBatch(dir, 1, batch(1, "b1", Seq(Change(agentAddress(PublicKey), "SET",
      container(agentJson(name = "v1"))))))
    val q1 = Pipeline.start(
      spark.readStream.format(fmt).option("path", dir).load().as[String], store, ckpt)
    try q1.processAllAvailable() finally q1.stop()

    writeBatch(dir, 2, batch(2, "b2", Seq(Change(agentAddress(PublicKey), "SET",
      container(agentJson(name = "v2"))))))
    val q2 = Pipeline.start(
      spark.readStream.format(fmt).option("path", dir).load().as[String], store, ckpt)
    try q2.processAllAvailable() finally q2.stop()

    val versions = store.table("agents")
      .select("name", "start_block_num").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._2)
    assert(versions === Seq(("v1", 1L), ("v2", 2L)))
  }

  test("S4: knownBlockIds resumes past the newest known id (no checkpoint)") {
    val dir = tempDir("blocklog")
    val store = new Scd2Store(spark, tempDir("blocklog-store"))
    import spark.implicits._
    writeBatch(dir, 1, batch(1, "b1", Seq(Change(agentAddress(PublicKey), "SET",
      container(agentJson(name = "v1"))))))
    writeBatch(dir, 2, batch(2, "b2", Seq(Change(agentAddress(PublicKey), "SET",
      container(agentJson(name = "v2"))))))

    // store already holds b1 (newest-first known list) but has NO Spark
    // checkpoint — the handshake must skip file 1 and consume only file 2
    val q = Pipeline.start(
      spark.readStream.format(fmt).option("path", dir)
        .option("knownBlockIds", "b1").load().as[String],
      store, tempDir("blocklog-ckpt2"))
    try q.processAllAvailable() finally q.stop()

    val versions = store.table("agents")
      .select("name", "start_block_num").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._2)
    // only v2 ingested: v1's file was before the negotiated resume point
    assert(versions === Seq(("v2", 2L)))
    assert(store.maxBlock() === Some(2L))
  }

  test("S4: fully unknown ids fall back to genesis and replay the log") {
    val dir = tempDir("blocklog")
    val store = new Scd2Store(spark, tempDir("blocklog-store"))
    import spark.implicits._
    writeBatch(dir, 1, batch(1, "b1", Seq(Change(agentAddress(PublicKey), "SET",
      container(agentJson(name = "v1"))))))

    val q = Pipeline.start(
      spark.readStream.format(fmt).option("path", dir)
        .option("knownBlockIds", "orphan1,orphan2").load().as[String],
      store, tempDir("blocklog-ckpt3"))
    try q.processAllAvailable() finally q.stop()

    assert(store.live("agents").select("name").as[String].collect().toSeq === Seq("v1"))
  }
}
