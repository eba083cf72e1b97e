package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Amplify, Curation, Dedup, Events, Similarity}
import graft.streaming.IncrementalDedup

/** Scaling-curve measurement for the dedup/ANN/streaming paths (not part
  * of the driver contract): amplifies the sf corpus 1×/10×/50× with
  * `Amplify` (deterministic, linear duplicate structure) and measures
  * the q30→q59→q67 LSH/CC/apply chain and the IVF probe at each scale,
  * plus the q32 brute-force guard tripping past its bound, plus the
  * incremental streaming dedup driven batch-by-batch at 10×.
  *
  * The IVF probe is `Similarity.ivfProbeOfAssigned` — the EXACT shipped
  * q54/q76 plan, not a hand copy — measured under two codebook
  * policies:
  *   - fixed:  centroids from replica 0 only (K constant), so
  *     per-cluster population grows ∝ corpus/K — the curve that bends;
  *   - scaled: K ∝ √N centroids hash-sampled across the WHOLE corpus
  *     (the classic IVF balance point: assign cost N·K and probe cost
  *     N/K·queries grow together), so per-cluster population grows only
  *     ∝ √N instead of ∝ N.
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

  private def fsDelete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Fixed-K codebook: replica-0 vectors only (q54's every-64th seed) —
    * K does NOT grow with the corpus. */
  private def fixedCentroids(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < Amplify.IdStride && col("vec_id") % 64 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))

  /** Scaled codebook: K ≈ √N centroids hash-sampled uniformly across
    * ALL replicas (a deterministic stand-in for re-training the q76
    * k-means at each scale — sampling keeps the harness fast while
    * pinning K to the policy under test). md5-sampled (the repo's
    * portable idiom) with a guaranteed-nonempty fallback: a hash sample
    * has no hit guarantee, and an empty codebook would assign NOTHING —
    * every downstream stage would silently process an empty corpus. */
  private def scaledCentroids(emb: DataFrame, n: Long): DataFrame = {
    val k = math.max(1L, math.round(math.sqrt(n.toDouble)))
    val step = math.max(1L, n / k)
    val sampled = emb.filter(
      pmod(conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10)
        .cast("long"), lit(step)) === 0)
    val base = if (sampled.isEmpty) emb.orderBy(col("vec_id")).limit(1)
               else sampled
    base.select(col("vec_id").as("c_id"), col("v").as("cv"))
  }

  /** Drive the incremental streaming dedup over `batches` deterministic
    * hash-partitioned batches of the amplified corpus, measuring
    * per-batch wall-clock (flat = per-batch cost independent of how
    * much the store has accumulated), final store size, and the
    * partition-pruned probe footprint of a trickle batch against the
    * fully-grown store — the join-input-rows ≪ store-rows evidence for
    * the bucket-partitioned layout. */
  private case class StreamingResult(
      batchSecs: Seq[Double], bytes: Long, storeDocs: Long,
      indexRows: Long, probeRowsRead: Long,
      touchedLeaves: Int, totalLeaves: Int)

  private def streamingCurve(spark: SparkSession, docs: DataFrame,
                             batches: Int): StreamingResult = {
    val storeDir = java.nio.file.Files
      .createTempDirectory("scale-inc-dedup").toString + "/sigs"
    val secs = (0 until batches).map { i =>
      val b = docs.filter(pmod(xxhash64(col("doc_id")), lit(batches)) === i)
        .select("doc_id", "text").localCheckpoint(true)
      val t = timed(noop(IncrementalDedup.processBatch(b, storeDir)))
      spark.catalog.clearCache()
      t
    }
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val nDocs = IncrementalDedup.storeSigs(spark, storeDir)
      .map(_.count()).getOrElse(0L)
    // trickle-probe footprint: an 8-doc batch against the grown store
    val probe = docs.select("doc_id", "text").orderBy("doc_id").limit(8)
      .localCheckpoint(true)
    val fp = IncrementalDedup.probeFootprint(spark, storeDir, probe)
    fs.delete(new org.apache.hadoop.fs.Path(
      storeDir.stripSuffix("/sigs")), true)
    StreamingResult(secs, bytes, nDocs, fp.rowsTotal, fp.rowsRead,
      fp.touchedLeaves, fp.totalLeaves)
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
      val emb = Amplify.embeddings(baseEmb, r)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .localCheckpoint(true)
      val nDocs = docs.count(); val nVecs = emb.count()
      spark.catalog.clearCache(); System.gc(); resetPeaks()

      var nPairs = 0L; var nGroups = 0L; var nKept = 0L
      val lshSec = timed {
        val cand = Dedup.lshCandidatePairsOf(docs)
          .select("doc1", "doc2").localCheckpoint(true)
        nPairs = cand.count()
        val cc = Dedup.connectedComponents(cand).localCheckpoint(true)
        nGroups = cc.select("canonical_id").distinct().count()
        // the exact shipped q67 apply: UNHINTED anti-join on the long id
        val drop = cc.filter(col("doc_id") =!= col("canonical_id")).select("doc_id")
        nKept = docs.join(drop, Seq("doc_id"), "left_anti").count()
      }

      // fixed-K IVF (r5's curve, kept for continuity): assign + probe
      val ivfFixedSec = timed(noop(
        Similarity.ivfProbeOf(emb, fixedCentroids(emb))))

      // scaled-K IVF: assign timed separately (ivfAssign materializes
      // eagerly via localCheckpoint), then the probe; cluster population
      // stats measured from the actual assignment
      val cent = scaledCentroids(emb, nVecs).localCheckpoint(true)
      val k = cent.count()
      var maxPop = 0L
      var assign: DataFrame = null
      val ivfAssignSec = timed { assign = Similarity.ivfAssign(emb, cent) }
      val ivfProbeSec = timed(noop(Similarity.ivfProbeOfAssigned(assign)))
      maxPop = assign.groupBy("c_id").count()
        .agg(max("count")).collect()(0).getLong(0)

      // hierarchical two-level assign over the SAME scaled codebook:
      // ~2√K dots per vector instead of K — the answer to the flat
      // assign dominating the 50× curve; agreement with the exact
      // argmax is measured, not assumed
      var hier: DataFrame = null
      val hierAssignSec = timed { hier = Similarity.ivfAssignHierarchical(emb, cent) }
      val hierProbeSec = timed(noop(Similarity.ivfProbeOfAssigned(hier)))
      val agree = assign.select(col("vec_id"), col("c_id").as("ce"))
        .join(hier.select(col("vec_id"), col("c_id").as("ch")), "vec_id")
        .filter(col("ce") === col("ch")).count()
      val agreeFrac = agree.toDouble / math.max(nVecs, 1)

      val peak = peakHeapMb()
      spark.catalog.clearCache(); System.gc()
      println(s"[scale] r=$r docs=$nDocs vecs=$nVecs lsh=${f"$lshSec%.1f"}s " +
        s"ivfFixed=${f"$ivfFixedSec%.1f"}s k=$k " +
        s"ivfScaled=${f"${ivfAssignSec + ivfProbeSec}%.1f"}s " +
        s"ivfHier=${f"${hierAssignSec + hierProbeSec}%.1f"}s agree=${f"$agreeFrac%.2f"} " +
        s"meanPop=${nVecs / math.max(k, 1)} maxPop=$maxPop " +
        s"pairs=$nPairs groups=$nGroups kept=$nKept peakMb=$peak")
      (r, nDocs, nVecs, nPairs, nGroups, nKept, lshSec,
        ivfFixedSec, k, ivfAssignSec, ivfProbeSec, maxPop,
        hierAssignSec, hierProbeSec, agreeFrac, peak)
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

    // CLUSTERED-regime agreement: the hierarchical quantizer measured on
    // a graded-similarity mixture (Amplify.clusteredVectors) — the data
    // shape it is designed for; the orthogonal-corpus rows above remain
    // the documented worst-case floor
    val clustered = {
      val nC = 20000L
      val vecs = Amplify.clusteredVectors(spark, nC).localCheckpoint(true)
      val centC = scaledCentroids(
        vecs.select(col("vec_id"), col("v")), nC).localCheckpoint(true)
      val kC = centC.count()
      val exactC = Similarity.ivfAssign(vecs, centC)
        .select(col("vec_id"), col("c_id").as("ce"))
      val hierC = Similarity.ivfAssignHierarchical(vecs, centC)
        .select(col("vec_id"), col("c_id").as("ch"))
      val agreeC = exactC.join(hierC, "vec_id")
        .filter(col("ce") === col("ch")).count().toDouble / nC
      spark.catalog.clearCache()
      s"""{"n":$nC,"centers":64,"codebook_k":$kC,""" +
        s""""hier_agree_frac":${f"$agreeC%.3f"}}"""
    }

    // BPE training (q108) across the replica ladder: ONE corpus pass
    // builds the word-frequency vocabulary; every merge step then runs
    // at VOCABULARY scale (amplification replicates docs, so the vocab
    // is near-constant while the corpus grows 50×) — train time should
    // track the single scan, not the corpus × steps.
    val bpe = {
      val rows = replicas.map { r =>
        val d = Amplify.docs(baseDocs, r)
          .select("doc_id", "text").localCheckpoint(true)
        val n = d.count()
        var vocab = 0L
        val trainSec = timed {
          val (v, m) = graft.operators.Curation.trainBpeOf(d)
          vocab = v.count()
          require(m.length == 8)
          v.unpersist()
        }
        // real-vocabulary scaling (10× rung): 256 merges via the batched
        // trainer — passes ≈ k/batch instead of k corpus-vocab aggs, the
        // property that makes a 50k-token production vocab trainable
        val batched = if (r == 10) {
          var bm = 0; var bp = 0
          val batchedSec = timed {
            val (bv, bms, bps) = graft.operators.Curation
              .trainBpeBatchedOf(d, k = 256, batchSize = 32)
            bm = bms.length; bp = bps
            bv.unpersist()
          }
          s""","batched_merges":$bm,"batched_passes":$bp,""" +
            s""""batched_sec":${f"$batchedSec%.2f"}"""
        } else ""
        spark.catalog.clearCache(); System.gc()
        s"""{"replicas":$r,"docs":$n,"vocab":$vocab,""" +
          s""""train_sec":${f"$trainSec%.2f"}$batched}"""
      }
      rows.mkString("[", ",", "]")
    }

    // Exact selection across the replica ladder: quantile narrowing's
    // pass count is a function of the VALUE DOMAIN (ceil(log_B(range))),
    // not the row count — 50× data must run the same number of scans,
    // each a map-side-combined agg, so wall should grow far slower than
    // the corpus. Heavy hitters likewise: the sketch pass's exchange
    // carries ≤cap counters per partition and the recount filters to
    // ≤cap literals before aggregating — candidates stay ≤cap at any R.
    val selection = {
      import graft.operators.ExactQuantile
      val rows = replicas.map { r =>
        val ev = Amplify.events(
          Tables.load(spark, sfDir, "events"), r, hotFrac = 0.10)
        val cents = ev.select(
          round(col("value") * 100, 0).cast("long").as("c"))
          .localCheckpoint(true)
        val n = cents.count()
        var passes = 0
        val quantSec = timed {
          val (vals, p) = ExactQuantile.kthSmallestWithPasses(
            cents, "c", Map("p50" -> ((n + 1) / 2), "p99" -> (n * 99 / 100)))
          passes = p
          require(vals.size == 2)
        }
        // heavy hitters over the hot-skewed user domain (10% of rows on
        // user 0 — far above the N/(cap+1) threshold)
        val toks = ev.select(col("user_id").cast("string").as("tok"))
          .localCheckpoint(true)
        var cands = 0
        var hits = 0L
        val cap = 32
        val mg = udaf(new graft.functions.MisraGriesAgg(cap))
        val hhSec = timed {
          val sk = toks.agg(mg(col("tok")).as("s"))
            .select(col("s.candidates"), col("s.n")).head()
          val cs = sk.getSeq[String](0)
          cands = cs.length
          hits = toks.filter(col("tok").isin(cs: _*))
            .groupBy("tok").agg(count(lit(1)).as("cnt"))
            .filter(col("cnt") * (cap + 1) > sk.getLong(1)).count()
        }
        cents.unpersist(); toks.unpersist()
        spark.catalog.clearCache(); System.gc()
        s"""{"replicas":$r,"rows":$n,"quantile_passes":$passes,""" +
          s""""quantile_sec":${f"$quantSec%.2f"},"hh_candidates":$cands,""" +
          s""""hh_heavy":$hits,"hh_sec":${f"$hhSec%.2f"}}"""
      }
      rows.mkString("[", ",", "]")
    }

    // Exact set-similarity join (q138) across the replica ladder: the
    // prefix-filtering claim is that candidates grow with the TRUE
    // near-dup pair count (linear under Amplify's Jaccard-preserving
    // replication), not with corpus² — candidate count and wall pin it.
    val setsim = {
      val rows = replicas.map { r =>
        val d = Amplify.docs(baseDocs, r)
          .select("doc_id", "text").localCheckpoint(true)
        val n = d.count()
        var cands = 0L
        var pairs = 0L
        val sec = timed {
          val (verified, cand) = Dedup.exactSetSimJoinOf(Dedup.shinglesOf(d))
          cands = cand.count()
          pairs = verified.count()
        }
        spark.catalog.clearCache(); System.gc()
        s"""{"replicas":$r,"docs":$n,"candidates":$cands,""" +
          s""""pairs":$pairs,"sec":${f"$sec%.2f"}}"""
      }
      rows.mkString("[", ",", "]")
    }

    // Longest-dup-span family (q184) across the replica ladder.
    // Amplify.docs word-ciphers each replica's text, so windows stay
    // DISJOINT across replicas (pairs scale ~linearly in r, the
    // realistic independent-corpus growth; measured 50× data ≈ 5×
    // wall). capped_hashes audits the MaxSpanWindowDocs boilerplate
    // guard — the thing that keeps the matched-window self-join from
    // squaring on a viral n-gram at 100 TB; 0 here means no window
    // crossed the bound, so the measured wall is the UNCAPPED chain.
    val span = {
      val rows = replicas.map { r =>
        val d = Amplify.docs(baseDocs, r)
          .select("doc_id", "text").localCheckpoint(true)
        val n = d.count()
        var pairs = 0L; var spanRows = 0L; var capped = 0L
        val sec = timed {
          val hist = Dedup.longestDupSpanOf(d).localCheckpoint(true)
          spanRows = hist.count()
          pairs = Option(hist.agg(sum("n_pairs")).head().get(0))
            .map(_.asInstanceOf[Long]).getOrElse(0L)
        }
        // cap audit outside the timed window: distinct-doc window
        // frequencies above the boilerplate bound. Tokenized with
        // Dedup.norm — the EXACT tokenizer the timed q184 chain uses —
        // so the audit hashes identical windows (a raw \s+ split
        // disagrees on leading/trailing whitespace and could report 0
        // capped hashes while the real chain capped some)
        capped = d
          .select(col("doc_id"), split(Dedup.norm(col("text")), " ").as("ws"))
          .filter(size(col("ws")) >= 16)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(ws) - 15)," +
              " i -> md5(array_join(slice(ws, i, 16), ' ')))")).as("h"))
          .groupBy("h").agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") > Dedup.MaxSpanWindowDocs).count()
        spark.catalog.clearCache(); System.gc()
        s"""{"replicas":$r,"docs":$n,"span_lengths":$spanRows,""" +
          s""""pairs":$pairs,"capped_hashes":$capped,"sec":${f"$sec%.2f"}}"""
      }
      rows.mkString("[", ",", "]")
    }

    // Cross-modal fingerprint banding (q188) across the replica ladder:
    // the whole corpus pays the map-only keyframe decode (container
    // walk + baseline-JPEG inverse + aHash), but the banded candidate
    // stage is quadratic only in DISTINCT fingerprints per band bucket
    // — and the fixture's fingerprint space is bounded (≤ 97·4 block
    // patterns) no matter how many videos exist, the realistic shape of
    // a recompression-heavy video corpus. Measured claim: docs ×50 ⇒
    // band_pairs FLAT, wall ~linear (decode-dominated). Decode cost
    // scales with data; pairing cost scales with content diversity.
    val fingerprints = {
      import graft.multimodal.Video
      import graft.operators.Multimodal
      val rows = replicas.map { r =>
        val d = Amplify.docs(baseDocs, r).select("doc_id").localCheckpoint(true)
        val n = d.count()
        var distinctFp = 0L; var bandPairs = 0L
        val sec = timed {
          val grp = Video.keyframePhashes(Video.synthKeyframeAvis(d)).toDF()
            .groupBy("phash")
            .agg(min(col("media_id")).as("canonical_id"),
              count(lit(1)).as("n"))
            .localCheckpoint(true)
          distinctFp = grp.count()
          bandPairs = Multimodal.bandedHammingPairs(
            grp, nBits = 64, nBands = 4, maxHam = 6).count()
        }
        spark.catalog.clearCache(); System.gc()
        s"""{"replicas":$r,"docs":$n,"distinct_fps":$distinctFp,""" +
          s""""band_pairs":$bandPairs,"sec":${f"$sec%.2f"}}"""
      }
      rows.mkString("[", ",", "]")
    }

    // Mining family (q142/q144) across the replica ladder. Fuzzy join:
    // on the dense-id name universe every candidate is a true lev≤1
    // match (lengths differ by exactly 1, so the deletion-key equi-join
    // admits no false positives), so the measured candidate count IS
    // the true pair count — candidates track matches (~6-13 per name as
    // id density grows), a vanishing fraction of the N² an all-pairs
    // fuzzy join scans (0.02% at 75k names). Triangles: r offset copies
    // of the LSH near-dup pair graph (dup groups are near-cliques, so
    // triangles exist; node-disjoint union ⇒ triangles scale exactly
    // ×r) measure the degree-oriented wedge join's wall growth.
    // Sketch + graph family (q196/q200) across the replica ladder.
    // HLL: the input stream AND its distinct key domain both grow ×r
    // (offset partkeys per replica — the hard direction for a distinct
    // counter), but the register frame crossing the final exchange
    // stays ≤ groups·4096 rows — measured, the scale invariant that
    // makes the sketch the 100 TB plan. PageRank: r node-disjoint
    // copies of the trade graph — wall tracks edges ×r and the
    // per-copy rank distribution is IDENTICAL (distinct-rank count
    // constant), the disjoint-union invariant catching any cross-copy
    // leakage.
    val sketchGraph = {
      import graft.operators.{Linkage, Sketches}
      val li0 = Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
        .localCheckpoint(true)
      val cents0 = Tables.load(spark, sfDir, "lineitem")
        .select(col("l_returnflag").as("g"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("c"))
        .localCheckpoint(true)
      val ord0 = Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_custkey").localCheckpoint(true)
      val eo0 = ord0.join(li0.select("l_orderkey", "l_suppkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct().localCheckpoint(true)
      // Replica i's keys live in [i·10M, i·10M + maxKey]; if the base
      // table's max key ever reaches 10M (partkey max = 200k·sf, i.e.
      // sf ≥ 50; custkey max = 150k·sf) the ranges overlap and replicas
      // silently MERGE — corrupting every ladder invariant. Fail loudly
      // instead of producing a subtly-wrong curve.
      val replicaOff = 10000000L
      val maxBaseKey = li0.agg(greatest(max("l_partkey"), max("l_suppkey")))
        .first().getLong(0)
        .max(ord0.agg(max("o_custkey")).first().getLong(0))
      require(maxBaseKey < replicaOff,
        s"replica key offset $replicaOff collides: max base key $maxBaseKey" +
          " — raise the offset above the max key before running the ladder")
      val rows = replicas.map { r =>
        val keys = (0 until r).map(i =>
          li0.select(col("l_returnflag").as("grp"),
            concat((col("l_partkey") + lit(i.toLong * replicaOff))
              .cast("string"), lit("-"),
              col("l_suppkey").cast("string")).as("key")))
          .reduce(_.union(_)).localCheckpoint(true)
        val n = keys.count()
        var regRows = 0L
        val hllSec = timed {
          val regs = Sketches.hllRegisters(
            keys.select(col("grp"),
              expr(Sketches.h60("key")).as("h")), Seq("grp"))
            .localCheckpoint(true)
          regRows = regs.count()
        }
        // HDR quantile sketch (q217): the bucket frame is DOMAIN-bound —
        // counts grow ×r while distinct buckets stay put, so the partial
        // aggregate keeps the exchange at n_buckets rows at any scale
        var hdrBuckets = 0L
        val hdrSec = timed {
          val vals = (0 until r).map(_ => cents0).reduce(_.union(_))
          val sk = vals.withColumn("bucket", expr(
            "shiftleft(shiftright(c, greatest(length(bin(c)) - 8, 0)), " +
              "greatest(length(bin(c)) - 8, 0))"))
            .groupBy("g", "bucket").agg(count(lit(1)).as("cnt"))
            .localCheckpoint(true)
          hdrBuckets = sk.count()
        }
        // long node ids, q200's exact convention (custkey ↦ 2k,
        // suppkey ↦ 2k+1) with a 10M per-replica key offset — the
        // ladder measures the integer-keyed chain the shipped query
        // actually runs, not a string-keyed stand-in
        val edges = (0 until r).map { i =>
          val off = lit(i.toLong * replicaOff)
          val eo = eo0.select(
            ((col("ck") + off) * 2).cast("long").as("c"),
            ((col("sk") + off) * 2 + 1).cast("long").as("sp"))
          eo.select(col("c").as("src"), col("sp").as("dst"))
            .union(eo.select(col("sp").as("src"), col("c").as("dst")))
        }.reduce(_.union(_)).localCheckpoint(true)
        val nEdges = edges.count()
        var ranks: DataFrame = null
        val prSec = timed {
          ranks = Linkage.pageRank(edges, iters = 5).localCheckpoint(true)
          ranks.count()
        }
        val distinctPr = ranks.select("pr").distinct().count()
        spark.catalog.clearCache(); System.gc()
        s"""{"replicas":$r,"keys":$n,"hll_reg_rows":$regRows,""" +
          s""""hll_sec":${f"$hllSec%.2f"},""" +
          s""""hdr_buckets":$hdrBuckets,"hdr_sec":${f"$hdrSec%.2f"},""" +
          s""""edges":$nEdges,""" +
          s""""pagerank_sec":${f"$prSec%.2f"},""" +
          s""""distinct_pr_values":$distinctPr}"""
      }
      rows.mkString("[", ",", "]")
    }

    val mining = {
      import graft.operators.Mining
      val e0 = Dedup.lshCandidatePairsOf(baseDocs)
        .select(col("doc1").as("a"), col("doc2").as("b"))
        .localCheckpoint(true)
      val m0 = e0.count()
      val rows = replicas.map { r =>
        val nNames = 1500L * r
        val clean = spark.range(nNames).select(col("id").as("cid"),
          format_string("Customer#%09d", col("id")).as("cname"))
          .localCheckpoint(true)
        var cands = 0L; var fp = 0L
        val fuzzySec = timed {
          val dirty = clean.select(col("cid").as("dirty_id"),
            Mining.dirtyName(col("cname"), col("cid")).as("dname"))
          val ck = clean.select(col("cid"), col("cname"),
            explode(Mining.deletionKeys(col("cname"))).as("k"))
          val dk = dirty.select(col("dirty_id"), col("dname"),
            explode(Mining.deletionKeys(col("dname"))).as("k"))
          val cand = dk.join(ck, "k")
            .select("dirty_id", "dname", "cid", "cname").distinct()
            .localCheckpoint(true)
          cands = cand.count()
          fp = cand.filter(levenshtein(col("dname"), col("cname")) <= 1).count()
        }
        // replica id offset derived from the ACTUAL id domain, not a
        // hardcoded bound — overlapping replicas would silently break
        // the 'triangles scale exactly ×r' invariant this bench records
        val idStride = e0.agg(greatest(max(col("a")), max(col("b"))))
          .head().getLong(0) + 1L
        val e = (0 until r).map(i => e0.select(
            (col("a") + lit(i * idStride)).as("a"),
            (col("b") + lit(i * idStride)).as("b")))
          .reduce(_ unionAll _).localCheckpoint(true)
        var tri = 0L
        val triSec = timed {
          val row = Mining.trianglesPerVertex(e)
            .agg(sum("n_triangles")).collect()(0)
          tri = Option(row.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L) / 3
        }
        spark.catalog.clearCache(); System.gc()
        s"""{"replicas":$r,"names":$nNames,"fuzzy_candidates":$cands,""" +
          s""""fuzzy_pairs":$fp,"fuzzy_sec":${f"$fuzzySec%.2f"},""" +
          s""""edges":${m0 * r},"triangles":$tri,""" +
          s""""tri_sec":${f"$triSec%.2f"}}"""
      }
      rows.mkString("[", ",", "]")
    }

    // Trained quality classifier (q104) across the replica ladder: the
    // full 12-step GD train is feature pass + moments pass + 12 agg
    // passes + 1 eval pass over a persisted 4-column projection — every
    // pass embarrassingly parallel, so wall time should grow far slower
    // than the corpus (pass count is CONSTANT in corpus size). Accuracy
    // is reported as an invariance check: replication preserves the
    // feature/label distribution, so the learned boundary should hold.
    val classifier = {
      val rows = replicas.map { r =>
        val d = Amplify.docs(baseDocs, r)
          .select("doc_id", "text").localCheckpoint(true)
        val n = d.count()
        var acc = 0.0
        val trainSec = timed {
          val f = Curation.featureFrameOf(d).persist()
          val (_, a) = Curation.trainAndScore(f)
          acc = a
          f.unpersist()
        }
        spark.catalog.clearCache(); System.gc()
        s"""{"replicas":$r,"docs":$n,"train_sec":${f"$trainSec%.2f"},""" +
          s""""accuracy":${f"$acc%.4f"}}"""
      }
      rows.mkString("[", ",", "]")
    }

    // PQ ADC at 50×: encode cost, then the identical scan scored by the
    // native codegen pq_adc expression vs the interpreted HOF chain it
    // replaced — the per-(query, corpus-row) scalar is the scan's hot
    // loop, so this ratio is the measured value of the custom Expression
    val pq = {
      val n = Amplify.embeddings(baseEmb, 50)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .localCheckpoint(true)
      val nV = n.count()
      var codes: DataFrame = null
      var dtab: DataFrame = null
      val encodeSec = timed {
        val (c, d) = Similarity.pqArtifacts(n, queryFilter = "vec_id % 2000 = 0")
        codes = c.localCheckpoint(true)
        dtab = d.localCheckpoint(true)
      }
      val nQ = dtab.count()
      // ALTERNATED, min-of-2 per arm: a single sample per arm measured
      // in a fixed order let one warm-up/GC hiccup invert the ratio
      // (round 12 recorded native 7.04 vs HOF 6.58 from exactly that;
      // alternated min-of-3 on the same code reads native 2.6 vs HOF
      // 3.9 — the 1.5× the fused int loop actually buys)
      val arms = (1 to 2).map { _ =>
        val h = timed(noop(Similarity.pqScan(codes, dtab, nativeScorer = false)))
        val nv = timed(noop(Similarity.pqScan(codes, dtab)))
        (nv, h)
      }
      val nativeSec = arms.map(_._1).min
      val hofSec = arms.map(_._2).min
      spark.catalog.clearCache(); System.gc()
      s"""{"vectors":$nV,"queries":$nQ,"encode_sec":${f"$encodeSec%.2f"},""" +
        s""""scan_native_sec":${f"$nativeSec%.2f"},""" +
        s""""scan_hof_sec":${f"$hofSec%.2f"}}"""
    }

    // SKEW stress — the two hot-key regimes, measured on the exact
    // shipped plans (never demonstrated before round 8):
    //  * q78's per-user window with ONE user owning 30% of all events
    //    (window skew: AQE join splitting does not apply — a single
    //    task sorts the hot partition);
    //  * q30/q59's LSH chain with one giant all-identical dup cluster
    //    (join skew: every cluster pair meets on single (band, bucket)
    //    keys — AQE skew-join splitting is the mitigation under test).
    val skew = {
      val evBase = Tables.load(spark, sfDir, "events")
        .select("event_id", "user_id", "event_type", "ts_ns")
      val r = 10
      val uni = Amplify.events(evBase, r).localCheckpoint(true)
      val hot = Amplify.events(evBase, r, hotFrac = 0.3).localCheckpoint(true)
      val nEv = uni.count(); hot.count()
      val asofUniSec = timed(noop(Events.asofJoinOf(uni)))
      val asofHotSec = timed(noop(Events.asofJoinOf(hot)))
      spark.catalog.clearCache(); System.gc()

      val clusterSize = 800
      val uniDocs = baseDocs.select("doc_id", "text").localCheckpoint(true)
      val skewDocs = uniDocs
        .unionByName(Amplify.giantDupCluster(baseDocs, clusterSize))
        .localCheckpoint(true)
      var uniPairs = 0L; var clusterPairs = 0L
      val lshUniSec = timed {
        val cand = Dedup.lshCandidatePairsOf(uniDocs)
          .select("doc1", "doc2").localCheckpoint(true)
        uniPairs = cand.count()
        noop(Dedup.connectedComponents(cand))
      }
      val lshSkewSec = timed {
        val cand = Dedup.lshCandidatePairsOf(skewDocs)
          .select("doc1", "doc2").localCheckpoint(true)
        clusterPairs = cand.count()
        noop(Dedup.connectedComponents(cand))
      }
      spark.catalog.clearCache(); System.gc()

      // the APPLY stage with a drop list past the broadcast threshold.
      // At web-scale dup rates the drop list is GBs — far past any real
      // threshold — so what matters is that the UNHINTED anti-join
      // degrades to a shuffle join on the 8-byte key instead of forcing
      // a driver-OOM broadcast. Locally the list is small, so the
      // regime is reproduced by keeping the RATIO (list size ≫
      // threshold): threshold lowered to 1 KB for this one measurement,
      // then restored.
      val ccSkew = Dedup.connectedComponents(
        Dedup.lshCandidatePairsOf(skewDocs).select("doc1", "doc2"))
        .localCheckpoint(true)
      val dropSkew = ccSkew.filter(col("doc_id") =!= col("canonical_id"))
        .select("doc_id").localCheckpoint(true)
      val dropRows = dropSkew.count()
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      var applyKept = 0L
      var applySec = 0.0
      var applyShuffleAnti = false
      try {
        val applyDf = skewDocs.join(dropSkew, Seq("doc_id"), "left_anti")
        applySec = timed { applyKept = applyDf.count() }
        val applyPlan = applyDf.queryExecution.executedPlan.toString
        applyShuffleAnti = (applyPlan.contains("SortMergeJoin") ||
          applyPlan.contains("ShuffledHashJoin")) &&
          !applyPlan.contains("BroadcastHashJoin")
      } finally
        // restore unconditionally: a failure here must not leak the 1 KB
        // threshold into every later measurement in the run
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.catalog.clearCache(); System.gc()

      s"""{"events":$nEv,"hot_frac":0.3,""" +
        s""""asof_uniform_sec":${f"$asofUniSec%.2f"},""" +
        s""""asof_hot_sec":${f"$asofHotSec%.2f"},""" +
        s""""asof_ratio":${f"${asofHotSec / math.max(asofUniSec, 1e-9)}%.2f"},""" +
        s""""dup_cluster_docs":$clusterSize,"uniform_pairs":$uniPairs,""" +
        s""""cluster_pairs":$clusterPairs,""" +
        s""""lshcc_uniform_sec":${f"$lshUniSec%.2f"},""" +
        s""""lshcc_cluster_sec":${f"$lshSkewSec%.2f"},""" +
        s""""lshcc_ratio":${f"${lshSkewSec / math.max(lshUniSec, 1e-9)}%.2f"},""" +
        s""""apply_drop_rows":$dropRows,"apply_bcast_threshold_bytes":1024,""" +
        s""""apply_shuffle_anti":$applyShuffleAnti,""" +
        s""""apply_sec":${f"$applySec%.2f"},"apply_kept":$applyKept}"""
    }

    // ANN recall@k: multi-probe IVF (q84's ivfProbeMulti) against the
    // q33 brute-force ground truth, per nprobe — the user-visible
    // answer-quality axis of the ANN surface (single-probe loses true
    // neighbors across quantization-cell boundaries; P probes recover
    // them at P× query-side cost, corpus side unchanged)
    val embD = baseEmb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
      .localCheckpoint(true)
    val centR = embD.filter(col("vec_id") % 64 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    val truth = {
      val q = embD.filter(expr("vec_id % 100 = 0"))
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      broadcast(q).join(embD, col("vec_id") =!= col("query_id"))
        .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
        .localCheckpoint(true)
    }
    val nTruth = truth.count()
    val assignR = Similarity.ivfAssign(embD, centR)
    val recalls = Seq(1, 2, 4).map { p =>
      val got = Similarity.ivfProbeMulti(assignR, centR, p)
        .select(col("query_id"), col("neighbor_id"))
      val hit = truth.join(got, Seq("query_id", "neighbor_id"), "left_semi").count()
      p -> hit.toDouble / math.max(nTruth, 1)
    }
    val recallJson = recalls.map { case (p, r) =>
      s"""{"nprobe":$p,"recall_at_5":${f"$r%.3f"}}""" }.mkString("[", ",", "]")

    // CLUSTERED-regime recall: the synthetic base embeddings are
    // near-orthogonal (documented floor — recall 0.25-0.49 above), so
    // the number a SemDeDup/ANN user would actually see is measured on
    // the graded-similarity mixture (Amplify.clusteredVectors), where a
    // query's true neighbors concentrate in its own + adjacent
    // quantization cells — the geometry multi-probe exists for
    val recallClustered = {
      val nC = 20000L
      val vecsC = Amplify.clusteredVectors(spark, nC).localCheckpoint(true)
      val centC = scaledCentroids(vecsC, nC).localCheckpoint(true)
      val qC = vecsC.filter(expr("vec_id % 100 = 0"))
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val wC = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      val truthC = broadcast(qC)
        .join(vecsC, col("vec_id") =!= col("query_id"))
        .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
        .withColumn("rk", row_number().over(wC)).filter(col("rk") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
        .localCheckpoint(true)
      val nT = truthC.count()
      val assignC = Similarity.ivfAssign(vecsC, centC)
      val rs = Seq(1, 2, 4).map { p =>
        val got = Similarity.ivfProbeMulti(assignC, centC, p)
          .select(col("query_id"), col("neighbor_id"))
        val hit = truthC.join(got, Seq("query_id", "neighbor_id"), "left_semi")
          .count()
        p -> hit.toDouble / math.max(nT, 1)
      }
      spark.catalog.clearCache()
      rs.map { case (p, r) =>
        s"""{"nprobe":$p,"recall_at_5":${f"$r%.3f"}}""" }.mkString("[", ",", "]")
    }

    // AS-OF depth flatness (Q2 on the SCD2 store): a synthetic entity
    // table ingested batch-by-batch to a 500-block chain and then on to
    // 5,000 blocks (10% of entities re-versioned per 50-block batch —
    // history dirs accumulate 1:1 with batches). The measured claim is
    // SURVEY §4's: near-head as-of latency is bounded by live + batches
    // SINCE the queried block (manifest tag pruning), so it stays FLAT
    // at 10× the chain depth; the deep-past number over the same
    // un-compacted 5,000-block chain is reported alongside as the
    // documented compactTo maintenance case, not a flat claim.
    val asofDepth = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_asof_depth")
      val store = new graft.sds.Scd2Store(spark, tmp.toString)
      // must be a REGISTERED table name: the live write zone-maps only
      // tables whose schema registry lists a single scope key, and the
      // point lookup resolves its key column from the same registry
      val tbl = "organizations"
      val nEnt = 2000L
      val blocksPerBatch = 50L
      var live = spark.range(nEnt)
        .select(col("id").cast("string").as("organization_id"),
          lit(0L).as("start_block_num"),
          lit(graft.sds.Schemas.MaxBlockNum).as("end_block_num"))
        .localCheckpoint(true)
      def ingestTo(fromBatch: Int, toBatch: Int): Unit =
        for (k <- fromBatch to toBatch) {
          val tag = blocksPerBatch * k
          val isUpd = col("organization_id").cast("long") % 10 === k % 10
          val closed = live.filter(isUpd)
            .withColumn("end_block_num", lit(tag))
          val fresh = live.filter(isUpd)
            .withColumn("start_block_num", lit(tag))
          store.applyMerged(tbl,
            live.filter(!isUpd).unionByName(fresh).unionByName(closed), tag)
          // coalesce BEFORE the checkpoint: filter∪fresh carries 2× the
          // parent's partitions, and localCheckpoint pins that count —
          // without this the loop doubles partitions per batch (32·2^k
          // empty tasks by batch k: the DAG scheduler, not the data,
          // becomes the bottleneck and batch ~13 never finishes)
          live = live.filter(!isUpd).unionByName(fresh)
            .coalesce(8).localCheckpoint(true)
          if (k % 10 == 0) println(s"[asof-depth] ingested batch $k")
        }
      def asofCount(b: Long): Long = store.asOf(tbl, b).count()
      ingestTo(1, 10) // chain = 500 blocks, 10 history dirs
      val nearOff = 5L
      val t500 = timed(asofCount(10 * blocksPerBatch - nearOff))
      val (dirs500, read500) =
        store.asOfFootprint(tbl, 10 * blocksPerBatch - nearOff)
      ingestTo(11, 100) // chain = 5,000 blocks, 100 history dirs
      val t5000 = timed(asofCount(100 * blocksPerBatch - nearOff))
      val (dirs5000, read5000) =
        store.asOfFootprint(tbl, 100 * blocksPerBatch - nearOff)
      val tDeep = timed(asofCount(10 * blocksPerBatch - nearOff))
      val (_, readDeep) = store.asOfFootprint(tbl, 10 * blocksPerBatch - nearOff)

      // Q1 PK point lookup through the zone-mapped live write, on the
      // same 100-batch store: re-split live at a small per-file target
      // so the manifest carries a many-file zone map (at scale the 1M
      // default yields thousands of files), then count the files a
      // lookup actually opens vs the live total and time it against
      // the pre-zone-map full-partition scan.
      val prevTarget = spark.conf.getOption(graft.sds.Scd2Store.LiveTargetRowsKey)
      val (lkFiles, lkRead, lkSec, scanSec) =
        try {
          spark.conf.set(graft.sds.Scd2Store.LiveTargetRowsKey, "100")
          ingestTo(101, 101) // rewrites live as ~20 range-split files
          val key = (nEnt / 2).toString
          val (total, read) = store.pointLookupFootprint(tbl, key)
          val tLk = timed(store.pointLookup(tbl, key).count())
          val tScan = timed(
            store.live(tbl).filter(col("organization_id") === key).count())
          (total, read, tLk, tScan)
        } finally prevTarget.fold(
          spark.conf.unset(graft.sds.Scd2Store.LiveTargetRowsKey))(
          spark.conf.set(graft.sds.Scd2Store.LiveTargetRowsKey, _))
      fsDelete(spark, tmp.toString)
      s"""{"entities":$nEnt,"blocks_per_batch":$blocksPerBatch,""" +
        s""""near_asof_500_sec":${f"$t500%.2f"},""" +
        s""""hist_dirs_500":$dirs500,"read_dirs_500":$read500,""" +
        s""""near_asof_5000_sec":${f"$t5000%.2f"},""" +
        s""""hist_dirs_5000":$dirs5000,"read_dirs_5000":$read5000,""" +
        s""""deep_asof_5000_sec":${f"$tDeep%.2f"},"deep_read_dirs":$readDeep,""" +
        s""""live_files":$lkFiles,"lookup_files_read":$lkRead,""" +
        s""""point_lookup_sec":${f"$lkSec%.2f"},""" +
        s""""live_full_scan_sec":${f"$scanSec%.2f"}}"""
    }

    // streaming dedup at 50×, ten batches: per-batch latency must stay
    // flat as the signature store accumulates the earlier batches
    val streamReplicas = 50
    val streamBatches = 10
    val streamDocs = Amplify.docs(baseDocs, streamReplicas)
      .localCheckpoint(true)
    val sr = streamingCurve(spark, streamDocs, streamBatches)

    val qs = rows.map { case (r, nd, nv, np, ng, nk, ls, fi, k, as_, ps, mp, ha, hp, af, pk) =>
      s"""{"replicas":$r,"docs":$nd,"vecs":$nv,"cand_pairs":$np,""" +
        s""""dup_groups":$ng,"docs_kept":$nk,"lsh_cc_apply_sec":${f"$ls%.1f"},""" +
        s""""ivf_fixedk_sec":${f"$fi%.1f"},"codebook_k":$k,""" +
        s""""ivf_scaledk_assign_sec":${f"$as_%.1f"},""" +
        s""""ivf_scaledk_probe_sec":${f"$ps%.1f"},""" +
        s""""mean_cluster_pop":${nv / math.max(k, 1)},"max_cluster_pop":$mp,""" +
        s""""ivf_hier_assign_sec":${f"$ha%.1f"},""" +
        s""""ivf_hier_probe_sec":${f"$hp%.1f"},""" +
        s""""hier_agree_frac":${f"$af%.3f"},""" +
        s""""peak_heap_mb":$pk}"""
    }.mkString("[", ",", "]")
    val streaming =
      s"""{"replicas":$streamReplicas,"batches":$streamBatches,""" +
        s""""batch_sec":[${sr.batchSecs.map(s => f"$s%.2f").mkString(",")}],""" +
        s""""first_sec":${f"${sr.batchSecs.head}%.2f"},""" +
        s""""last_sec":${f"${sr.batchSecs.last}%.2f"},""" +
        s""""store_bytes":${sr.bytes},"store_docs":${sr.storeDocs},""" +
        s""""index_rows":${sr.indexRows},""" +
        s""""bytes_per_doc":${sr.bytes / math.max(sr.storeDocs, 1)},""" +
        s""""probe8_rows_read":${sr.probeRowsRead},""" +
        s""""probe8_touched_leaves":${sr.touchedLeaves},""" +
        s""""probe8_total_leaves":${sr.totalLeaves}}"""
    val json = s"""{"metric":"scaling","sf":"$sfDir","guard_tripped":$guardTripped,""" +
      s""""scales":$qs,"streaming":$streaming,"ann_recall":$recallJson,""" +
      s""""ann_recall_clustered":$recallClustered,""" +
      s""""clustered":$clustered,"skew":$skew,"pq":$pq,""" +
      s""""classifier":$classifier,"bpe":$bpe,"selection":$selection,""" +
      s""""setsim":$setsim,"mining":$mining,"span":$span,""" +
      s""""sketch_graph":$sketchGraph,""" +
      s""""fingerprints":$fingerprints,""" +
      s""""asof_depth":$asofDepth}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALING_LOCAL.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
