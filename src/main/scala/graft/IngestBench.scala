package graft

import graft.sds.{Fixtures, Pipeline, Scd2Store}

/** SDS ingest throughput bench (not part of the driver contract):
  * synthesizes event batches — each block carrying an agent update, a
  * factory org (4-table fan-out), and a certificate — and drives them
  * through decode → SCD2 merge in micro-batches.
  *
  * Reference baseline for comparison: strictly sequential, one block per
  * poll-loop iteration with a 1 s idle floor and one DB transaction per
  * block (`src/subscriber.rs:87-93`, BASELINE.md). Our pipeline merges a
  * whole micro-batch of blocks set-wise.
  *
  * Usage: runMain graft.IngestBench [nBlocks] [batchSize] [sink]
  * where sink ∈ {parquet (default), jdbc} — jdbc drives the SAME
  * batches through the reference-parity `JdbcScd2Store` on embedded
  * Derby (one driver-side transaction per batch, like the reference's
  * per-block Diesel transaction), so the two sinks' throughput is
  * directly comparable on identical input.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nBlocks = args.headOption.map(_.toInt).getOrElse(1000)
    val batchSize = args.lift(1).map(_.toInt).getOrElse(100)
    val sink = args.lift(2).getOrElse("parquet")
    val spark = graft.core.GraftSession.get()
    import spark.implicits._
    import Fixtures._

    val storeRoot = java.nio.file.Files.createTempDirectory("ingest-bench").toString
    val store: graft.sds.SdsStore = sink match {
      case "jdbc" => new graft.sds.JdbcScd2Store(spark,
        s"jdbc:derby:memory:ingest_${System.nanoTime()};create=true")
      case _ => new Scd2Store(spark, storeRoot)
    }

    def mkBatch(b: Long): String = batch(b, s"block_$b", Seq(
      Change(agentAddress(s"agent_${b % 50}"), "SET",
        container(agentJson(publicKey = s"agent_${b % 50}", name = s"name_$b", timestamp = b))),
      Change(orgAddress(s"factory_${b % 20}"), "SET",
        container(factoryJson(id = s"factory_${b % 20}"))),
      Change(certAddress(s"cert_${b % 100}"), "SET",
        container(certificateJson(id = s"cert_${b % 100}")))))

    val t0 = System.nanoTime()
    (1L to nBlocks).grouped(batchSize).foreach { blocks =>
      Pipeline.applyBatch(store,
        spark.createDataset(blocks.map(mkBatch)).toDF("value"))
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val liveAgents = store.live("agents").count()
    println(f"""{"metric":"ingest_blocks_per_sec","value":${nBlocks / sec}%.1f,"sink":"$sink%s","blocks":$nBlocks,"batch_size":$batchSize,"sec":$sec%.1f,"live_agents":$liveAgents}""")
    val p = new org.apache.hadoop.fs.Path(storeRoot)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
