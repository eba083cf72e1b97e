package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Corpus-preparation operators for training-data pipelines (driver
  * mandate, SURVEY.md §2.6): stratified sampling for data mixing, PII
  * redaction, and token-budget context packing.
  *
  * Scale posture: every operator here is per-row or one-window-per-shard —
  * no joins, no driver-side state. Sampling is deterministic (hash-based,
  * no RNG) so a 100 TB re-run reproduces the same corpus split, and the
  * oracle can recompute it bit-identically; that determinism is the whole
  * point for training-data lineage.
  */
object Corpus {
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadSpread(s, dir, "documents")

  private def norm(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Per-language keep rates for q60 (downsample the dominant language,
    * near-keep the rest — the classic data-mixing move). */
  private val SampleRates: Seq[(String, Double)] =
    Seq("en" -> 0.35, "zh" -> 0.90, "es" -> 0.90, "de" -> 0.90, "fr" -> 0.90)

  /** q63's packing budget (tokens per context window) and shard count. */
  private val PackBudget = 256
  private val PackShards = 8

  /** q92's survival set — quality × repetition × exact-dup gates, then
    * the passage-dedup drop list applied as an UNHINTED anti-join on the
    * 8-byte doc_id. Exposed un-checkpointed so PlanSpec can pin the
    * anti-join shape the shipped query materializes (the query itself
    * localCheckpoints this frame, which truncates the visible plan). */
  private[graft] def trainingMixSurv(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("nw", size(col("ws")).cast("long"))
      .withColumn("quality_ok",
        col("nw") >= 20 &&
          Text.topWordCount(col("ws")) / col("nw").cast("double") < 0.12 &&
          size(array_distinct(col("ws"))) / col("nw").cast("double") > 0.35)
      .withColumn("g2", Text.ngrams(col("ws"), 2))
      .withColumn("g3", Text.ngrams(col("ws"), 3))
      .withColumn("rep_ok",
        size(col("ws")) >= 3 &&
          Text.topWordCount(col("g2")) / size(col("g2")).cast("double") < 0.045 &&
          (size(col("g3")) - size(array_distinct(col("g3"))))
            / size(col("g3")).cast("double") < 0.02 &&
          Text.maxRunLength(col("ws")) <= 2)
      .withColumn("dup_ok",
        col("doc_id") === min("doc_id").over(Window.partitionBy(md5(col("text")))))
    // q91's corpus-wide ≥3-repeat chunk scan. The flagged-doc set
    // scales with the passage-duplication rate, not a fixed bound, so
    // it is applied as an UNHINTED anti-join on the 8-byte doc_id —
    // AQE broadcasts it when it fits, shuffles it when it doesn't.
    val chunks = docs(s, dir)
      .withColumn("ws", split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " "))
      .filter(size(col("ws")) >= 10)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(ws) DIV 10 - 1),
          |  b -> cast(conv(substring(md5(array_join(
          |         slice(ws, b * 10 + 1, 10), ' ')), 1, 15), 16, 10) as bigint))"""
          .stripMargin)).as("k"))
      .localCheckpoint(true)
    val hot = chunks.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 3)
    val passageDrop = chunks.join(hot, "k")
      .select("doc_id").distinct()
    base
      .filter(col("quality_ok") && col("rep_ok") && col("dup_ok"))
      .join(passageDrop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("nw"))
  }

  val defs: Seq[Q] = Seq(
    // ---- q60: stratified deterministic hash sampling --------------------
    // Training-data mixing: keep each doc iff a uniform [0,1) draw derived
    // from md5 of its id falls under its language's rate. Hash-based, not
    // RNG-based: the sample is reproducible across runs/cluster sizes,
    // joinable against lineage, and the oracle recomputes it exactly
    // (md5 is bit-identical in DuckDB). Per-row map-side work — the only
    // exchange is the final presentation sort.
    Q("q60_stratified_sample", {
      val rateCase = SampleRates
        .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
      s"""WITH u AS (
        |  SELECT doc_id, lang, source,
        |    ('0x'||substr(md5('s60:'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT
        |      / 4294967296.0 AS draw,
        |    CASE lang $rateCase ELSE 1.0 END AS rate
        |  FROM documents)
        |SELECT doc_id, lang, source FROM u
        |WHERE draw < rate ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val draw = conv(substring(md5(concat(lit("s60:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") / lit(4294967296.0)
      val rate = SampleRates.foldRight(lit(1.0)) { case ((l, r), acc) =>
        when(col("lang") === l, lit(r)).otherwise(acc)
      }
      docs(s, dir)
        .filter(draw < rate)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // ---- q61: PII redaction ---------------------------------------------
    // Regex masking of emails/phones with per-doc match counts. The
    // fixture text is synthetic, so PII is injected deterministically
    // (same expression on both sides) before redaction — the operator
    // under test is the redact/count pipeline, which is pure per-row
    // regexp work (codegen'd, zero shuffle until the presentation sort).
    // Patterns stay in the Java∩RE2 common subset so Spark and DuckDB
    // agree; DuckDB needs the 'g' flag to match Spark's replace-all.
    Q("q61_pii_redaction", {
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phone = "\\+1-555-[0-9]{4}"
      s"""WITH aug AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@mail.example.com' ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN ' or call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(t, '$email', '<EMAIL>', 'g'),
        |    '$phone', '<PHONE>', 'g') AS redacted
        |FROM aug ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phone = "\\+1-555-[0-9]{4}"
      val aug = concat(
        col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" or call +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      docs(s, dir)
        .withColumn("t", aug)
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(email), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("t"), lit(phone), lit(0)))
            .cast("long").as("n_phones"),
          regexp_replace(regexp_replace(col("t"), email, "<EMAIL>"),
            phone, "<PHONE>").as("redacted"))
        .orderBy("doc_id")
    },

    // ---- q69: temperature-scaled mixture sampling -----------------------
    // The multilingual-mix rule real pretraining corpora use: sampling
    // weight per language ∝ count^α (α < 1 upsamples the tail relative
    // to its natural share), normalized to a target corpus size, capped
    // at keeping everything. Same md5 draw as q60 ⇒ reproducible; the
    // per-language rates derive from corpus statistics, so the whole
    // operator is two tiny aggregates broadcast over a per-row filter.
    Q("q69_temperature_sample", {
      val alpha = 0.5
      val targetFrac = 0.6 // target corpus size = 60% of the original
      s"""WITH stats AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_l FROM documents GROUP BY lang),
        |tot AS (
        |  SELECT CAST(sum(n_l) AS BIGINT) AS n, sum(pow(n_l, $alpha)) AS z FROM stats),
        |rates AS (
        |  SELECT lang,
        |    least(1.0, (pow(n_l, $alpha) / z) * ($targetFrac * n) / n_l) AS rate
        |  FROM stats CROSS JOIN tot)
        |SELECT d.doc_id, d.lang, round(r.rate, 6) AS rate FROM documents d
        |JOIN rates r USING (lang)
        |WHERE ('0x'||substr(md5('s69:'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT
        |      / 4294967296.0 < r.rate
        |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val alpha = 0.5
      val targetFrac = 0.6
      val stats = docs(s, dir).groupBy("lang").agg(count(lit(1)).as("n_l"))
      val tot = stats.agg(sum("n_l").as("n"), sum(pow(col("n_l"), alpha)).as("z"))
      val rates = stats.crossJoin(broadcast(tot))
        .select(col("lang"),
          least(lit(1.0),
            (pow(col("n_l"), alpha) / col("z")) * (lit(targetFrac) * col("n")) / col("n_l"))
            .as("rate"))
      val draw = conv(substring(md5(concat(lit("s69:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") / lit(4294967296.0)
      docs(s, dir)
        .join(broadcast(rates), "lang")
        .filter(draw < col("rate"))
        .select(col("doc_id"), col("lang"), round(col("rate"), 6).as("rate"))
        .orderBy("doc_id")
    },

    // ---- q63: token-budget context packing ------------------------------
    // Concat-and-chunk packing (the GPT-style pretraining layout): docs in
    // id order are laid head-to-tail per shard and cut into fixed
    // token-budget windows; a doc's window is floor(tokens-before /
    // budget), its offset the remainder. One cumulative-sum window per
    // shard — shards are independent, so at 100 TB this is
    // embarrassingly parallel across shards and the per-shard window is
    // a single sort+scan (no iterative bin-packing, which would be
    // sequential by construction). Integer arithmetic end-to-end =
    // exact oracle parity; DuckDB's HUGEINT window sum is cast back.
    Q("q63_token_packing",
      s"""WITH t AS (
        |  SELECT doc_id, doc_id % $PackShards AS shard,
        |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (
        |      PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before
        |  FROM t)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(floor(cum_before / $PackBudget.0) AS BIGINT) AS window_id,
        |  cum_before % $PackBudget AS offset_in_window
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      docs(s, dir)
        .select(col("doc_id"), (col("doc_id") % PackShards).as("shard"),
          size(split(norm(col("text")), " ")).cast("long").as("n_tokens"))
        .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          floor(col("cum_before") / PackBudget).as("window_id"),
          (col("cum_before") % PackBudget).as("offset_in_window"))
        .orderBy("doc_id")
    },

    // ---- q82: the composed corpus gate (quality × dedup × decontam) -----
    // The capstone a real training pipeline runs nightly: every document
    // passes through three independent gates — the q80 quality rules
    // (per-row HOF expressions, no shuffle), exact dedup (keep the
    // lowest doc_id per md5 fingerprint — one window shuffle), and the
    // q81 contamination check (shared Text.contaminationStats; the
    // flagged set joins back UNHINTED on the 8-byte doc_id — its size
    // scales with the contamination rate, so AQE decides broadcast vs
    // shuffle rather than a forced hint) — and the per-source
    // yield report attributes each rejection to its FIRST failing gate
    // (quality → dup → contamination), plus the surviving token budget.
    // Composition is the point: three operators, one pass over the
    // corpus, no driver-side state, every count reproducible by the
    // oracle.
    Q("q82_corpus_gate",
      """WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |tfc AS (SELECT doc_id, w, count(*) AS c FROM tf GROUP BY 1, 2),
        |qm AS (SELECT doc_id, sum(c) AS nw, count(*) AS dw, max(c) AS tc FROM tfc GROUP BY 1),
        |q AS (SELECT doc_id, nw,
        |        (nw >= 20 AND tc / CAST(nw AS DOUBLE) < 0.12
        |         AND dw / CAST(nw AS DOUBLE) > 0.35) AS quality_ok FROM qm),
        |d AS (SELECT doc_id, doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS dup_ok
        |      FROM documents),
        |t5 AS (SELECT doc_id, string_split(text, ' ') AS ws
        |       FROM documents WHERE len(string_split(text, ' ')) >= 5),
        |ix AS (SELECT doc_id, ws, unnest(range(1, len(ws) - 3)) AS i FROM t5),
        |sh AS (SELECT DISTINCT doc_id,
        |         (('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 15))::BIGINT) AS k
        |       FROM ix),
        |bench AS (SELECT DISTINCT k, doc_id FROM sh WHERE doc_id % 10 = 0),
        |hits AS (SELECT a.doc_id, count(DISTINCT a.k) AS n_hit
        |         FROM sh a JOIN bench b ON a.k = b.k AND b.doc_id <> a.doc_id GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1),
        |cont AS (SELECT t.doc_id,
        |           round(coalesce(n_hit, 0) / CAST(n_shingles AS DOUBLE), 6) >= 0.2 AS contaminated
        |         FROM tot t LEFT JOIN hits h USING (doc_id)),
        |g AS (SELECT doc.doc_id, doc.source, q.nw, q.quality_ok, d.dup_ok,
        |        coalesce(cont.contaminated, FALSE) AS contaminated
        |      FROM documents doc
        |      JOIN q USING (doc_id) JOIN d USING (doc_id)
        |      LEFT JOIN cont USING (doc_id))
        |SELECT source,
        |  count(*) AS n_docs,
        |  count(*) FILTER (NOT quality_ok) AS n_quality_fail,
        |  count(*) FILTER (quality_ok AND NOT dup_ok) AS n_dup_drop,
        |  count(*) FILTER (quality_ok AND dup_ok AND contaminated) AS n_contaminated,
        |  count(*) FILTER (quality_ok AND dup_ok AND NOT contaminated) AS n_kept,
        |  CAST(coalesce(sum(nw) FILTER (quality_ok AND dup_ok AND NOT contaminated), 0) AS BIGINT)
        |    AS kept_tokens
        |FROM g GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val keepQ = col("quality_ok")
      val keepD = col("dup_ok")
      val cont = col("contaminated")
      val base = docs(s, dir)
        .withColumn("ws", split(col("text"), " "))
        .withColumn("nw", size(col("ws")).cast("long"))
        .withColumn("quality_ok",
          col("nw") >= 20 &&
            Text.topWordCount(col("ws")) / col("nw").cast("double") < 0.12 &&
            size(array_distinct(col("ws"))) / col("nw").cast("double") > 0.35)
        .withColumn("dup_ok",
          col("doc_id") === min("doc_id").over(Window.partitionBy(md5(col("text")))))
      val flagged = Text.contaminationStats(docs(s, dir))
        .filter(col("contaminated_frac") >= 0.2)
        .select(col("doc_id"), lit(true).as("contaminated"))
      base.join(flagged, Seq("doc_id"), "left")
        .withColumn("contaminated", coalesce(cont, lit(false)))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(!keepQ, 1)).as("n_quality_fail"),
          count(when(keepQ && !keepD, 1)).as("n_dup_drop"),
          count(when(keepQ && keepD && cont, 1)).as("n_contaminated"),
          count(when(keepQ && keepD && !cont, 1)).as("n_kept"),
          coalesce(sum(when(keepQ && keepD && !cont, col("nw"))), lit(0L))
            .cast("long").as("kept_tokens"))
        .orderBy("source")
    },

    // ---- q90: per-domain quota cap --------------------------------------
    // The other half of data mixing (q60 thins by RATE; this caps by
    // COUNT): no source may contribute more than `DomainQuota` docs,
    // and under the cap we keep the LONGEST ones (n_words desc, doc_id
    // desc tiebreak) — the standard web-corpus defense against a
    // handful of giant domains dominating the mix. Planned through the
    // custom TopKPerKey operator, not a window: per-partition bounded
    // heaps mean the exchange carries at most quota·sources·partitions
    // rows instead of the whole corpus, and a mega-domain costs O(quota)
    // memory per task instead of a full per-domain sort — the window
    // row_number formulation shuffles and sorts EVERYTHING, and one hot
    // domain makes one straggler task. Oracle states the declarative
    // row_number semantics over the same (n_words, doc_id) priority.
    Q("q90_domain_quota",
      """WITH d AS (SELECT doc_id, source,
        |    len(string_split(text, ' ')) AS n_words FROM documents),
        |r AS (SELECT doc_id, source, n_words,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_words DESC, doc_id DESC) AS rn
        |  FROM d)
        |SELECT doc_id, source, CAST(n_words AS BIGINT) AS n_words
        |FROM r WHERE rn <= 15 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).as("n_words"))
      graft.plans.TopK.perKey(d, Seq("source"),
        struct(col("n_words"), col("doc_id")), k = 15)
        .select(col("doc_id"), col("source"), col("n_words").cast("long").as("n_words"))
        .orderBy("doc_id")
    },

    // ---- q92: the full training-mix materialization ----------------------
    // Everything a pre-training data pipeline runs, composed as ONE
    // query — the pipeline a user of this engine would actually ship:
    //   1. q80 quality gate           (per-row HOF, no shuffle)
    //   2. q86 repetition gate        (per-row HOF, no shuffle)
    //   3. q28 exact dedup            (one window shuffle on md5(text))
    //   4. q91 passage dedup          (8-byte-key count + unhinted anti-join)
    //   5. q90 per-domain quota       (TopKPerKey winner-only exchange)
    // and a per-source mix report: candidates surviving the four gates,
    // the post-quota final count, and the final token budget. Gate
    // attribution stays with q82; this is the MATERIALIZATION step —
    // what the final mix looks like. Every stage is the already-proven
    // operator's exact expression, so the composition is the only new
    // surface under test.
    Q("q92_training_mix", {
      val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
      s"""WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |tfc AS (SELECT doc_id, w, count(*) AS c FROM tf GROUP BY 1, 2),
        |qm AS (SELECT doc_id, sum(c) AS nw, count(*) AS dw, max(c) AS tc FROM tfc GROUP BY 1),
        |q AS (SELECT doc_id, nw,
        |        (nw >= 20 AND tc / CAST(nw AS DOUBLE) < 0.12
        |         AND dw / CAST(nw AS DOUBLE) > 0.35) AS quality_ok FROM qm),
        |t3 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |       WHERE len(string_split(text, ' ')) >= 3),
        |g2 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
        |       FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM t3)),
        |top2 AS (SELECT doc_id, max(c) AS top2_c, sum(c) AS n2 FROM
        |         (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1),
        |g3 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        |       FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i FROM t3)),
        |d3 AS (SELECT doc_id, count(*) - count(DISTINCT g) AS dup3_c, count(*) AS n3
        |       FROM g3 GROUP BY 1),
        |wpos AS (SELECT doc_id, i, ws[i] AS w
        |         FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM t3)),
        |runs AS (SELECT doc_id, max(cnt) AS max_run FROM
        |         (SELECT doc_id, count(*) AS cnt FROM
        |          (SELECT doc_id, i, w,
        |             i - row_number() OVER (PARTITION BY doc_id, w ORDER BY i) AS grp
        |           FROM wpos) GROUP BY doc_id, w, grp) GROUP BY 1),
        |rep AS (SELECT t3.doc_id,
        |          (top2_c / CAST(n2 AS DOUBLE) < 0.045
        |           AND dup3_c / CAST(n3 AS DOUBLE) < 0.02 AND max_run <= 2) AS rep_ok
        |        FROM t3 JOIN top2 USING (doc_id) JOIN d3 USING (doc_id)
        |        JOIN runs USING (doc_id)),
        |d AS (SELECT doc_id, doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS dup_ok
        |      FROM documents),
        |t10 AS (SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents
        |        WHERE len(string_split($normSql, ' ')) >= 10),
        |ch AS (SELECT doc_id,
        |         ('0x' || substr(md5(array_to_string(ws[b*10+1:b*10+10], ' ')), 1, 15))::BIGINT AS k
        |       FROM (SELECT doc_id, ws, unnest(range(0, len(ws) // 10)) AS b FROM t10)),
        |gc AS (SELECT k, count(*) AS cnt FROM ch GROUP BY 1),
        |pd AS (SELECT DISTINCT ch.doc_id FROM ch JOIN gc USING (k) WHERE gc.cnt >= 3),
        |surv AS (SELECT doc.doc_id, doc.source, q.nw
        |         FROM documents doc
        |         JOIN q USING (doc_id) JOIN rep USING (doc_id) JOIN d USING (doc_id)
        |         WHERE q.quality_ok AND rep.rep_ok AND d.dup_ok
        |           AND doc.doc_id NOT IN (SELECT doc_id FROM pd)),
        |quota AS (SELECT doc_id, source, nw FROM (
        |  SELECT doc_id, source, nw,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY nw DESC, doc_id DESC) AS rn
        |  FROM surv) WHERE rn <= 15)
        |SELECT s.source,
        |  CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(count(q.doc_id) AS BIGINT) AS n_final,
        |  CAST(coalesce(sum(q.nw), 0) AS BIGINT) AS final_tokens
        |FROM surv s LEFT JOIN quota q USING (doc_id)
        |GROUP BY s.source ORDER BY s.source""".stripMargin
    }) { (s, dir) =>
      val surv = trainingMixSurv(s, dir)
        .localCheckpoint(true) // read by the quota and the candidate count
      val quota = graft.plans.TopK.perKey(surv, Seq("source"),
        struct(col("nw"), col("doc_id")), k = 15)
      val cand = surv.groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_candidates"))
      val fin = quota.groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_final"),
          sum(col("nw")).cast("long").as("final_tokens"))
      cand.join(fin, Seq("source"), "left")
        .select(col("source"), col("n_candidates"),
          coalesce(col("n_final"), lit(0L)).as("n_final"),
          coalesce(col("final_tokens"), lit(0L)).as("final_tokens"))
        .orderBy("source")
    },

    // ---- q102: DSIR importance selection --------------------------------
    // Data Selection via Importance Resampling (Xie et al. 2023): pick
    // raw-corpus documents that LOOK LIKE a target domain by importance
    // weight under hashed-n-gram bag-of-words models of target vs raw.
    // Features are md5-hashed unigram buckets (B=256 — the same
    // md5-prefix integer the contamination/passage ops use, identical
    // arithmetic in the oracle); target here is the English slice.
    // w(k) = ln((ct(k)+1)/(Nt+B)) − ln((cr(k)+1)/(Nr+B)); a document's
    // importance is the mean w over its token instances, and the top
    // 100 by weight are selected. Plan shape at 100 TB: the ONLY
    // corpus-sized shuffle is the 256-key bucket-count partial agg
    // (map-side combine collapses it to ≤256 rows per task); the dense
    // 256-double weight table is built from a seeded `spark.range`
    // domain (absent buckets included) and rides to the scorer as a
    // one-row broadcast, so per-document scoring is a MAP-ONLY array
    // fold — no explode, no join on the corpus; selection is
    // orderBy+limit = TakeOrderedAndProject, never a global window.
    Q("q102_dsir_selection", {
      val kSql = "(('0x' || substr(md5(w), 1, 15))::BIGINT) % 256"
      s"""WITH tok AS (SELECT doc_id, lang, $kSql AS k
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |        FROM documents)),
        |ct AS (SELECT k, count(*) AS ct FROM tok WHERE lang = 'en' GROUP BY 1),
        |cr AS (SELECT k, count(*) AS cr FROM tok GROUP BY 1),
        |tot AS (SELECT (SELECT count(*) FROM tok WHERE lang = 'en') AS nt,
        |               (SELECT count(*) FROM tok) AS nr),
        |wt AS (SELECT d.k,
        |    ln((coalesce(ct, 0) + 1) / (nt + 256.0))
        |      - ln((coalesce(cr, 0) + 1) / (nr + 256.0)) AS w
        |  FROM (SELECT unnest(range(0, 256)) AS k) d
        |  LEFT JOIN ct USING (k) LEFT JOIN cr USING (k) CROSS JOIN tot),
        |sc AS (SELECT tok.doc_id, count(*) AS n_tokens, sum(wt.w) AS sw
        |       FROM tok JOIN wt USING (k) GROUP BY 1)
        |SELECT * FROM (
        |  SELECT d.doc_id, d.lang, CAST(sc.n_tokens AS BIGINT) AS n_tokens,
        |    round(sc.sw / sc.n_tokens, 4) + 0.0 AS dsir_weight
        |  FROM sc JOIN documents d USING (doc_id)
        |  ORDER BY round(sc.sw / sc.n_tokens, 4) + 0.0 DESC, d.doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val B = 256
      val t = docs(s, dir)
        .withColumn("ws", split(col("text"), " "))
        .localCheckpoint(true) // read by the count legs and the scorer
      val tok = t.select(col("doc_id"), col("lang"), explode(col("ws")).as("w"))
        .withColumn("k",
          expr(s"cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint) % $B"))
      val ct = tok.filter(col("lang") === "en")
        .groupBy("k").agg(count(lit(1)).as("ct"))
      val cr = tok.groupBy("k").agg(count(lit(1)).as("cr"))
      val tot = tok.agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt"),
        count(lit(1)).as("nr"))
      // dense 0..255 weight table — absent buckets carry the +1 smoothing
      val wt = s.range(B).select(col("id").as("k"))
        .join(ct, Seq("k"), "left").join(cr, Seq("k"), "left")
        .crossJoin(broadcast(tot))
        .select(col("k"),
          (log((coalesce(col("ct"), lit(0L)) + 1) / (col("nt") + lit(B.toDouble)))
            - log((coalesce(col("cr"), lit(0L)) + 1) / (col("nr") + lit(B.toDouble))))
            .as("w"))
      val warr = wt.agg(
        transform(array_sort(collect_list(struct(col("k"), col("w")))),
          p => p.getField("w")).as("warr"))
      // map-only scorer: per-row HOF fold over ws, indexing the broadcast
      // weight array by each token's bucket — the corpus never explodes
      t.crossJoin(broadcast(warr))
        .withColumn("sw", expr(
          s"""aggregate(ws, cast(0.0 as double), (acc, w) ->
             |  acc + element_at(warr,
             |    cast(cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint) % $B
             |      as int) + 1))""".stripMargin))
        .select(col("doc_id"), col("lang"),
          size(col("ws")).cast("long").as("n_tokens"),
          // + 0.0 folds IEEE −0.0 to +0.0 (sum-order drift around zero
          // could otherwise flip the sign of a rounded zero per engine)
          (round(col("sw") / size(col("ws")), 4) + 0.0).as("dsir_weight"))
        .orderBy(col("dsir_weight").desc, col("doc_id"))
        .limit(100)
        .orderBy("doc_id")
    },

    // ---- q124: sliding-window document chunking --------------------------
    // The RAG / context-window prep step: each document splits into
    // overlapping W=50-token chunks at stride S=40 (10-token overlap so
    // no boundary sentence is lost), emitted with an md5 fingerprint so
    // the chunks feed straight into the q28 exact-dedup path. Map-only:
    // the chunk starts are a per-row `sequence` and the slices are HOF
    // `transform`+`slice` — one posexplode, zero exchanges, zero joins;
    // per-row output is ceil(n/S) rows regardless of corpus size.
    Q("q124_doc_chunking",
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |d AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
        |c AS (SELECT doc_id, n, CAST(st // 40 AS INT) AS chunk_idx,
        |    CAST(least(st + 50, n) - st AS INT) AS n_tok,
        |    array_to_string(toks[st + 1 : st + 50], ' ') AS chunk_text
        |  FROM d, unnest(range(0, n, 40)) u(st))
        |SELECT doc_id, chunk_idx, n_tok, md5(chunk_text) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      val W = 50
      val S = 40
      docs(s, dir)
        .select(col("doc_id"),
          filter(split(col("text"), " "), t => t =!= "").as("toks"))
        .withColumn("n", size(col("toks")))
        .filter(col("n") > 0)
        .select(col("doc_id"), col("n"),
          posexplode(transform(
            sequence(lit(0), col("n") - 1, lit(S)),
            st => struct(
              least(st + W, col("n")) - st cast "int" as "n_tok",
              array_join(slice(col("toks"), st + 1, lit(W)), " ") as "chunk"))))
        .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
          col("col.n_tok").as("n_tok"), md5(col("col.chunk")).as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ---- q126: weighted sampling WITHOUT replacement (E-S priorities) ---
    // Efraimidis-Spirakis: give row i priority u_i^(1/w_i) and keep the
    // k largest — exactly a weighted sample without replacement, as one
    // TakeOrderedAndProject (per-partition heaps, winners-only to the
    // driver — no sort, no shuffle of the corpus). The uniform is
    // md5-derived (48-bit grid, +1 so u ∈ (0,1]) so the draw is
    // reproducible lineage, and both engines rank by the monotonic
    // ln(u)/w instead of the overflow-prone root. Weight = n_chars:
    // longer docs proportionally likelier — the data-mixing primitive
    // between q60's rate sampling and q69's temperature sampling.
    Q("q126_weighted_sample",
      """WITH k AS (SELECT doc_id, n_chars,
        |    ln((('0x'||substr(md5('w126:'||CAST(doc_id AS VARCHAR)),1,12))::BIGINT + 1)
        |       / CAST(281474976710656 AS DOUBLE)) / n_chars AS es_key
        |  FROM documents),
        |top AS (SELECT * FROM k ORDER BY es_key DESC, doc_id LIMIT 100)
        |SELECT doc_id, n_chars, round(es_key, 6) AS es_key
        |FROM top ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val h = conv(substring(
        md5(concat(lit("w126:"), col("doc_id").cast("string"))), 1, 12),
        16, 10).cast("long")
      val u = (h + 1).cast("double") / lit(281474976710656.0d)
      docs(s, dir)
        .select(col("doc_id"), col("n_chars"),
          (log(u) / col("n_chars")).as("es_key"))
        .orderBy(desc("es_key"), asc("doc_id")).limit(100)
        .select(col("doc_id"), col("n_chars"),
          round(col("es_key"), 6).as("es_key"))
        .orderBy("doc_id")
    },

    // ---- q136: stratified EXACT-k sampling (k per stratum) ---------------
    // q60 samples at a RATE per stratum (the count is binomial); this
    // draws exactly k=10 docs per source — the eval-set construction
    // primitive where the budget is per-stratum exact. Priority is an
    // md5 (reproducible lineage, no RNG, unique per doc so no ties),
    // and the per-stratum smallest-k runs through TopKPerKey: partial
    // per-partition heaps, winners-only exchange — the window-sort
    // formulation would shuffle + sort every stratum's full population.
    Q("q136_stratified_exact_k",
      """WITH k AS (SELECT source, doc_id,
        |    md5('s136:' || CAST(doc_id AS VARCHAR)) AS pri FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY pri) AS rn FROM k)
        |SELECT source, doc_id, pri FROM r WHERE rn <= 10
        |ORDER BY source, pri""".stripMargin) { (s, dir) =>
      val k = docs(s, dir).select(col("source"), col("doc_id"),
        md5(concat(lit("s136:"), col("doc_id").cast("string"))).as("pri"))
      graft.plans.TopK.perKey(k, Seq("source"), col("pri"), 10, ascending = true)
        .orderBy("source", "pri")
    },

    // ---- q140: WEIGHTED exact-k per stratum (q126 ⊕ q136) ---------------
    // The full sampling matrix closes: q60 rate/stratum, q126 weighted
    // global, q136 uniform exact-k/stratum — this is weighted exact-k
    // per stratum, the budgeted data-mixing draw (k docs per source,
    // probability ∝ n_chars, no replacement). Same E-S priority
    // ln(u)/w, same TopKPerKey winners-only execution, keyed by source.
    Q("q140_weighted_stratified_k",
      """WITH k AS (SELECT source, doc_id, n_chars,
        |    ln((('0x'||substr(md5('w140:'||CAST(doc_id AS VARCHAR)),1,12))::BIGINT + 1)
        |       / CAST(281474976710656 AS DOUBLE)) / n_chars AS es_key
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY es_key DESC, doc_id) AS rn FROM k)
        |SELECT source, doc_id, n_chars, round(es_key, 6) AS es_key
        |FROM r WHERE rn <= 10
        |ORDER BY source, doc_id""".stripMargin) { (s, dir) =>
      val h = conv(substring(
        md5(concat(lit("w140:"), col("doc_id").cast("string"))), 1, 12),
        16, 10).cast("long")
      val u = (h + 1).cast("double") / lit(281474976710656.0d)
      val k = docs(s, dir).select(col("source"), col("doc_id"), col("n_chars"),
        (log(u) / col("n_chars")).as("es_key"))
      graft.plans.TopK.perKey(k, Seq("source"),
          struct(col("es_key"), -col("doc_id")), 10)
        .select(col("source"), col("doc_id"), col("n_chars"),
          round(col("es_key"), 6).as("es_key"))
        .orderBy("source", "doc_id")
    }
  )
}
