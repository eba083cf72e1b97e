package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Amplify, Dedup}

/** Scaling-curve measurement for the dedup/ANN paths (not part of the
  * driver contract): amplifies the sf corpus 1×/10×/50× with
  * `Amplify` (deterministic, linear duplicate structure) and measures
  * the q30→q59→q67 LSH/CC/apply chain and the q54-shaped IVF probe at
  * each scale, plus the q32 brute-force guard tripping past its bound.
  *
  * Near-linear wall-clock growth here is the EVIDENCE for the 100 TB
  * posture claims: every candidate generator is a bucket equi-join over
  * per-row signatures, so cost follows corpus size, not corpus².
  * (local[N] caveat: driver and executors share one JVM, so the peak
  * heap column is the whole process, and perfect linearity is not
  * expected once the working set outgrows CPU cache / memory bandwidth.)
  *
  * Usage: runMain graft.ScaleBench [replicasCsv]   (default "1,10,50")
  * Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  */
object ScaleBench {

  private def peakHeapMb(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(_.getPeakUsage.getUsed).sum / (1024 * 1024)
  }

  private def resetPeaks(): Unit = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .foreach(_.resetPeakUsage())
  }

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** q54's IVF shape with a FIXED codebook size: centroids come from
    * replica 0 only, so assign cost grows ∝ corpus (broadcast K) and
    * per-cluster population grows ∝ corpus/K. Production would grow K
    * with the corpus (or train it, q76) to pin cluster sizes. */
  private def ivfProbe(emb: DataFrame): DataFrame = {
    val n = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val cent = n.filter(col("vec_id") < Amplify.IdStride && col("vec_id") % 64 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    val assign = n.join(broadcast(cent))
      .withColumn("_csim", expr("cosine_sim(v, cv)"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("c_id"), struct(col("_csim"), -col("c_id"))).as("c_id"),
        first(col("v")).as("v"))
      .localCheckpoint(true)
    val q = assign.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("c_id").as("cluster"))
    val c = assign.select(col("vec_id").as("neighbor_id"), col("v"),
      col("c_id").as("cluster"))
    val rk = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    q.join(c, Seq("cluster"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
      .withColumn("rk", row_number().over(rk))
      .filter(col("rk") <= 5)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 10, 50))
    val spark = graft.core.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")

    val baseDocs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "lang", "source")
    val baseEmb = Tables.load(spark, sfDir, "embeddings")

    val rows = replicas.map { r =>
      // input prep OUTSIDE the timed window: the chains are what scale,
      // amplification is an input generator
      val docs = Amplify.docs(baseDocs, r).localCheckpoint(true)
      val emb = Amplify.embeddings(baseEmb, r).localCheckpoint(true)
      val nDocs = docs.count(); val nVecs = emb.count()
      spark.catalog.clearCache(); System.gc(); resetPeaks()

      var nPairs = 0L; var nGroups = 0L; var nKept = 0L
      val lshSec = timed {
        val cand = Dedup.lshCandidatePairsOf(docs)
          .select("doc1", "doc2").localCheckpoint(true)
        nPairs = cand.count()
        val cc = Dedup.connectedComponents(cand).localCheckpoint(true)
        nGroups = cc.select("canonical_id").distinct().count()
        val drop = cc.filter(col("doc_id") =!= col("canonical_id")).select("doc_id")
        nKept = docs.join(broadcast(drop), Seq("doc_id"), "left_anti").count()
      }
      val ivfSec = timed(noop(ivfProbe(emb)))
      val peak = peakHeapMb()
      spark.catalog.clearCache(); System.gc()
      println(s"[scale] r=$r docs=$nDocs vecs=$nVecs lsh=${f"$lshSec%.1f"}s " +
        s"ivf=${f"$ivfSec%.1f"}s pairs=$nPairs groups=$nGroups kept=$nKept peakMb=$peak")
      (r, nDocs, nVecs, nPairs, nGroups, nKept, lshSec, ivfSec, peak)
    }

    // the q32 bound: brute-force all-pairs must FAIL FAST past the
    // broadcast-able corpus size, pointing at the LSH/IVF paths —
    // amplify past the bound and trip q32's actual guard
    val overBound = (Dedup.MaxBruteForceVectors / baseEmb.count()).toInt + 1
    val guardTripped =
      try {
        Dedup.requireBruteForceable(Amplify.embeddings(baseEmb, overBound).count())
        false
      } catch { case e: IllegalArgumentException =>
        e.getMessage.contains("bounded all-pairs verifier")
      }

    val qs = rows.map { case (r, nd, nv, np, ng, nk, ls, is, pk) =>
      s"""{"replicas":$r,"docs":$nd,"vecs":$nv,"cand_pairs":$np,""" +
        s""""dup_groups":$ng,"docs_kept":$nk,"lsh_cc_apply_sec":${f"$ls%.1f"},""" +
        s""""ivf_sec":${f"$is%.1f"},"peak_heap_mb":$pk}"""
    }.mkString("[", ",", "]")
    val json = s"""{"metric":"scaling","sf":"$sfDir","guard_tripped":$guardTripped,"scales":$qs}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALING_LOCAL.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
