package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Text-analysis operators over the `documents` table (driver mandate,
  * SURVEY.md §2.6): token counting, quality scoring, language ID,
  * document fingerprinting, full-text search (the Q5 capability of the
  * reference's reporting DB, `diesel_full_text_search` dep).
  *
  * All expressions are built-in / higher-order functions — no UDFs — so
  * the whole module stays inside whole-stage codegen and scales as a
  * single scan + project over a 100 TB corpus. Hashes are md5 (identical
  * across engines) to keep every query DuckDB-oracle-checkable.
  */
object Text {

  /** Longest run of consecutive EQUAL elements in a string array, folded
    * by one `aggregate` with a (prev, run, best) struct state — a pure
    * per-row expression (q86's stuck-key repetition signal, and the
    * kernel under [[topWordCount]]). */
  def maxRunLength(ws: Column): Column =
    aggregate(ws,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, w) => {
        val run = when(w === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(w.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))

  /** Count of the most frequent element of a string array = the max run
    * length over the SORTED array — a pure per-row expression, so the
    * repetition metric costs no shuffle (q80, q82). */
  def topWordCount(ws: Column): Column = maxRunLength(array_sort(ws))

  /** The doc's n-gram strings as a per-row array expression: n-1 …
    * size(ws) joined windows, no explode anywhere (q86, q92). Total for
    * every input length: below n words the result is the empty array —
    * `sequence(1, size-(n-1))` would otherwise count DOWN for short docs
    * and make `slice` throw, so callers may not rely on an upstream
    * size filter surviving optimizer conjunct reordering. */
  private[operators] def ngrams(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Per-document contamination stats against the `doc_id % benchMod = 0`
    * benchmark stand-in (q81, q82): (doc_id, n_shingles, n_hit,
    * contaminated_frac). Shingle hashing and per-doc dedup are per-row
    * array expressions; the only corpus-scale shuffle is the overlap
    * equi-join on 8-byte keys. Docs with fewer than 5 words have no
    * shingles and are absent from the output. */
  def contaminationStats(d: DataFrame, benchMod: Int = 10): DataFrame = {
    val karr = d
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"), expr(
        """array_distinct(transform(
          |  transform(sequence(1, size(ws) - 4), i -> array_join(slice(ws, i, 5), ' ')),
          |  s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)))"""
          .stripMargin).as("karr"))
      .localCheckpoint(true) // read by both join sides and the totals
    val sh = karr.select(col("doc_id"), explode(col("karr")).as("k"))
    // renamed columns, not sh("k")/bench("k"): bench derives from sh,
    // so attribute-based references would be an ambiguous self-join
    val bench = sh.filter(col("doc_id") % benchMod === 0)
      .select(col("k").as("bk"), col("doc_id").as("b_doc"))
    val hits = sh.join(bench, col("k") === col("bk") && col("b_doc") =!= col("doc_id"))
      .groupBy("doc_id")
      .agg(countDistinct(col("k")).as("n_hit"))
    karr.select(col("doc_id"), size(col("karr")).cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).cast("long").as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) / col("n_shingles").cast("double"), 6)
          .as("contaminated_frac"))
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadSpread(s, dir, "documents")

  /** lower + collapse whitespace + trim: the normalization every
    * text op shares. */
  private def norm(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Portable occurrence count of a literal substring (replace trick —
    * identical semantics in Spark and DuckDB). Literal `replace`, not a
    * regex: ~10× cheaper per row and codegen-friendly. */
  private def occurrences(c: Column, kw: String): Column =
    ((length(c) - length(call_function("replace", c, lit(kw), lit("")))) / kw.length)
      .cast("long")
  private def occurrencesSql(expr: String, kw: String): String =
    s"CAST((length($expr)-length(replace($expr,'$kw','')))/${kw.length} AS BIGINT)"

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private val stopwordsSqlList = stopwords.map(w => s"'$w'").mkString("[", ",", "]")

  /** q132's blocklist. Production pipelines load the real
    * list-of-dirty-words file (C4 dropped any page with one hit); these
    * are benign STAND-INS chosen from the fixture vocabulary so the gate
    * actually fires in tests — the operator is list-driven either way. */
  private val blocklist = Seq("slow", "dup", "scan", "noise", "spam")
  private val blocklistSqlList = blocklist.map(w => s"'$w'").mkString("[", ",", "]")

  val defs: Seq[Q] = Seq(
    // ---- q23: token counting (whitespace + BPE-ish regex) --------------
    Q("q23_token_count",
      """SELECT doc_id,
        |  CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
        |  CAST(length(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    },

    // ---- q24: quality scoring (length/punct/stopword ratios) -----------
    Q("q24_quality_score",
      s"""SELECT doc_id,
        |  round(CAST(len(list_filter(string_split($normSql, ' '),
        |      x -> list_contains($stopwordsSqlList, x))) AS DOUBLE)
        |    / len(string_split($normSql, ' ')), 4) AS stopword_ratio,
        |  round(CAST(length(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS DOUBLE)
        |    / length(text), 4) AS punct_ratio,
        |  round(CAST(length($normSql) AS DOUBLE)
        |    / len(string_split($normSql, ' ')), 4) AS avg_token_len,
        |  CAST(length(text) BETWEEN 100 AND 5000 AS BIGINT) AS length_ok
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // _n/_w staged so the normalize/split chains evaluate once per row
      // instead of once per use site (see q25 note).
      docs(s, dir)
        .withColumn("_n", norm(col("text")))
        .withColumn("_w", split(col("_n"), " "))
        .select(
          col("doc_id"),
          round(size(filter(col("_w"), w => w.isin(stopwords: _*))).cast("double") /
            size(col("_w")), 4).as("stopword_ratio"),
          round(size(regexp_extract_all(lower(col("text")),
            lit("[^a-z0-9\\s]"), lit(0))).cast("double") / length(col("text")), 4)
            .as("punct_ratio"),
          round(length(col("_n")).cast("double") / size(col("_w")), 4)
            .as("avg_token_len"),
          length(col("text")).between(100, 5000).cast("long").as("length_ok"))
        .orderBy("doc_id")
    },

    // ---- q25: language ID (keyword-profile heuristic) ------------------
    // Argmax over per-language marker-word occurrence counts; the
    // padded-text trick counts word-boundary matches. Ties resolve by
    // the fixed en > es > de chain — deterministic on both engines.
    // Runs over the LOCALIZED corpus (graft.core.Localize: the label-
    // driven transliteration that gives each language a genuinely
    // different token distribution) so the detector actually
    // discriminates: es/de localize to their marker words, fr localizes
    // to real words the detector has NO profile for, zh reverses every
    // token — both of the latter fall through to the 'en' tie default,
    // which is exactly the failure mode q175's confusion matrix reports.
    Q("q25_lang_id", {
      val padded = s"(' ' || ${graft.core.Localize.textSql(normSql)} || ' ')"
      val en = Seq(" the ", " a ", " of ").map(k => occurrencesSql(padded, k)).mkString("(", "+", ")")
      val es = Seq(" el ", " la ", " los ").map(k => occurrencesSql(padded, k)).mkString("(", "+", ")")
      val de = Seq(" der ", " und ", " das ").map(k => occurrencesSql(padded, k)).mkString("(", "+", ")")
      s"""SELECT doc_id, lang AS labeled_lang,
        |  CASE WHEN $en >= $es AND $en >= $de THEN 'en'
        |       WHEN $es >= $de THEN 'es' ELSE 'de' END AS detected_lang,
        |  $en AS score_en, $es AS score_es, $de AS score_de
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      // Staged projections: _p (the normalized text) is referenced nine
      // times and each score three times — materializing them as columns
      // keeps CollapseProject from inlining the expensive subtrees into
      // every use site (conditional branches defeat subexpression
      // elimination).
      def score(kws: Seq[String]): Column =
        kws.map(k => occurrences(col("_p"), k)).reduce(_ + _)
      docs(s, dir)
        .withColumn("_p", concat(lit(" "),
          graft.core.Localize.text(col("lang"), norm(col("text"))), lit(" ")))
        .withColumn("_en", score(Seq(" the ", " a ", " of ")))
        .withColumn("_es", score(Seq(" el ", " la ", " los ")))
        .withColumn("_de", score(Seq(" der ", " und ", " das ")))
        .select(
          col("doc_id"), col("lang").as("labeled_lang"),
          when(col("_en") >= col("_es") && col("_en") >= col("_de"), "en")
            .when(col("_es") >= col("_de"), "es").otherwise("de")
            .as("detected_lang"),
          col("_en").as("score_en"), col("_es").as("score_es"),
          col("_de").as("score_de"))
        .orderBy("doc_id")
    },

    // ---- q26: document fingerprinting ----------------------------------
    // Whole-document fingerprint (md5 of normalized text), winnowing-
    // style extrema of word-3-gram shingle hashes, and a Rabin-Karp
    // polynomial rolling hash over the character stream
    // (h ← (h·131 + code) mod (2³¹−1); same integer fold on both engines).
    Q("q26_fingerprint",
      s"""SELECT doc_id,
        |  md5($normSql) AS fp_doc,
        |  CASE WHEN len(string_split($normSql, ' ')) >= 3 THEN
        |    list_min(list_transform(range(1, len(string_split($normSql, ' ')) - 1),
        |      i -> md5(array_to_string(list_slice(string_split($normSql, ' '), i, i+2), ' '))))
        |  END AS fp_shingle_min,
        |  CASE WHEN len(string_split($normSql, ' ')) >= 3 THEN
        |    list_max(list_transform(range(1, len(string_split($normSql, ' ')) - 1),
        |      i -> md5(array_to_string(list_slice(string_split($normSql, ' '), i, i+2), ' '))))
        |  END AS fp_shingle_max,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, length($normSql) + 1),
        |      i -> ascii(substr($normSql, i, 1)))),
        |    (h, c) -> (h * 131 + c) % 2147483647) AS BIGINT) AS fp_rolling
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // _n/_w/_h are materialized columns: referencing the normalize/split
      // chains inside the HOF lambdas would re-evaluate them per element.
      val w = col("_w")
      docs(s, dir)
        .withColumn("_n", norm(col("text")))
        .withColumn("_w", split(col("_n"), " "))
        // the when-guard must wrap the transform itself: for <3 words
        // sequence(1, size-2) counts DOWN through 0 and slice throws
        .withColumn("_h", when(size(w) >= 3, transform(
          sequence(lit(1), size(w) - 2),
          i => md5(array_join(slice(w, i, lit(3)), " ")))))
        .select(
          col("doc_id"),
          md5(col("_n")).as("fp_doc"),
          when(size(w) >= 3, array_min(col("_h"))).as("fp_shingle_min"),
          when(size(w) >= 3, array_max(col("_h"))).as("fp_shingle_max"),
          aggregate(
            transform(split(col("_n"), ""), c => ascii(c).cast("long")),
            lit(0L), (h, c) => (h * 131 + c) % 2147483647L)
            .as("fp_rolling"))
        .orderBy("doc_id")
    },

    // ---- q27: full-text search (Q5) -------------------------------------
    Q("q27_fulltext_search", {
      val rel = occurrencesSql(s"(' ' || $normSql || ' ')", " join ")
      s"""SELECT doc_id, source, $rel AS relevance
        |FROM documents
        |WHERE $rel > 0 AND lower(text) LIKE '%merge%'
        |ORDER BY relevance DESC, doc_id""".stripMargin
    }) { (s, dir) =>
      val padded = concat(lit(" "), norm(col("text")), lit(" "))
      docs(s, dir)
        .select(col("doc_id"), col("source"),
          occurrences(padded, " join ").as("relevance"),
          lower(col("text")).as("_lower"))
        .filter(col("relevance") > 0 && col("_lower").like("%merge%"))
        .drop("_lower")
        .orderBy(col("relevance").desc, col("doc_id"))
    },

    // ---- q55: inverted-index search with tf-idf rank --------------------
    // The real analog of the reporting DB's tsvector/tsquery capability
    // (reference dep `diesel_full_text_search`, Cargo.lock): tokenize →
    // postings (doc_id, term, tf) → term-AND search ranked by tf-idf.
    // Unlike q27's substring LIKE, matching is exact-token and the search
    // itself never rescans text: postings for the query terms are
    // selected by an `IN` filter that rides the tokenize scan, then one
    // groupBy(doc_id) — the only wide exchange — ANDs the terms. df and
    // n_docs are tiny aggregates joined by broadcast. At 100 TB the
    // postings build is the standard one-shuffle index job and the
    // per-query cost is proportional to the matched postings, not the
    // corpus.
    Q("q55_inverted_index",
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS term
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks WHERE term IN ('merge', 'join') GROUP BY doc_id, term),
        |d AS (SELECT term, count(*) AS df FROM p GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT p.doc_id,
        |       CAST(sum(p.tf) AS BIGINT) AS tf_total,
        |       round(sum(p.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df)), 4) AS relevance
        |FROM p JOIN d USING (term) CROSS JOIN n
        |GROUP BY p.doc_id
        |HAVING count(*) = 2
        |ORDER BY relevance DESC, doc_id""".stripMargin) { (s, dir) =>
      val queryTerms = Seq("merge", "join")
      // postings restricted to the query terms before the shuffle: the
      // IN-filter runs inside the tokenize projection, so only matching
      // postings reach the exchange
      val postings = docs(s, dir)
        .select(col("doc_id"), explode(split(norm(col("text")), " ")).as("term"))
        .filter(col("term").isin(queryTerms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      // df per query term (postings are unique by (doc_id, term)) and the
      // corpus size — both tiny, both broadcast
      val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      postings
        .join(broadcast(dfs), "term")
        .crossJoin(broadcast(nDocs))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("_matched"),
          sum("tf").cast("long").as("tf_total"),
          round(sum(col("tf") * log(col("n_docs").cast("double") / col("df"))), 4)
            .as("relevance"))
        .filter(col("_matched") === queryTerms.length) // AND semantics
        .select("doc_id", "tf_total", "relevance")
        .orderBy(col("relevance").desc, col("doc_id"))
    },

    // ---- q62: BM25 ranking (OR semantics, length-normalized) ------------
    // Okapi BM25 over the q55 postings shape: idf(t)·tf·(k1+1) /
    // (tf + k1·(1−b+b·dl/avgdl)) summed over matched query terms — the
    // ranking function real retrieval/dataset-curation stacks use where
    // q55's tf-idf is the teaching form. OR semantics (any term matches)
    // vs q55's AND. Same scale shape as q55: postings filtered to query
    // terms before the one exchange; df/N/avgdl are tiny broadcast
    // aggregates. avgdl is derived as exact-long sum ÷ exact-long count
    // (not avg()) so Spark and DuckDB hit identical IEEE operations.
    Q("q62_bm25_rank", {
      val (k1, b) = (1.2, 0.75)
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS term
        |  FROM documents),
        |dl AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
        |stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(dl) AS BIGINT) AS tot FROM dl),
        |p AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks WHERE term IN ('sort', 'hash', 'scan') GROUP BY doc_id, term),
        |d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY term)
        |SELECT p.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_terms,
        |  round(sum(
        |    ln(1 + (n_docs - df + 0.5) / (df + 0.5)) *
        |    (tf * ${k1 + 1}) /
        |    (tf + $k1 * (1 - $b + $b * dl.dl /
        |      (CAST(tot AS DOUBLE) / n_docs)))), 4) AS bm25
        |FROM p JOIN d USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |GROUP BY p.doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 100""".stripMargin
    }) { (s, dir) =>
      val (k1, b) = (1.2, 0.75)
      val queryTerms = Seq("sort", "hash", "scan")
      // per-doc length = token-array size: a per-row projection, not an
      // explode + groupBy shuffle of every token. Null texts are
      // filtered so dl/n_docs match the explode+groupBy shape (which
      // dropped them) for any corpus, not just null-free fixtures.
      val dl = docs(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(split(norm(col("text")), " ")).cast("long").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot"))
      val postings = docs(s, dir)
        .select(col("doc_id"), explode(split(norm(col("text")), " ")).as("term"))
        .filter(col("term").isin(queryTerms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))
      val avgdl = col("tot").cast("double") / col("n_docs")
      val idf = log(lit(1) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
      val score = idf * (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1) - lit(b) + lit(b) * col("dl") / avgdl))
      postings
        .join(broadcast(dfs), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_terms"),
          round(sum(score), 4).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(100)
    },

    // ---- q80: corpus quality filters (Gopher/C4-style gate) -------------
    // The pre-training quality gate: per-document lexical statistics —
    // word count, mean word length, most-frequent-word fraction
    // (repetition) and distinct-word ratio (diversity) — and a boolean
    // keep verdict from fixed thresholds (tuned to pass ~57% of this
    // corpus, so both branches are exercised). ZERO data shuffles: every
    // metric is a per-row HOF expression (the top-word count is the max
    // run length over the SORTED word array, folded by a single
    // `aggregate` with a (prev, run, best) struct state) — the naive
    // explode→groupBy(doc_id, word) formulation would exchange every
    // word in the corpus, which at 100 TB is the difference between a
    // map-only scan and the largest shuffle in the pipeline. The only
    // exchange left is the presentation sort's range partitioning
    // (PlanSpec-guarded). Every metric derives from exact integer sums,
    // so the cross-engine doubles divide identically.
    Q("q80_quality_filters",
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
        |m AS (SELECT doc_id, sum(c) AS n_words, count(*) AS distinct_words,
        |             max(c) AS top_c,
        |             sum(c * length(w)) / CAST(sum(c) AS DOUBLE) AS mwl
        |      FROM tf GROUP BY 1)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  CAST(distinct_words AS BIGINT) AS distinct_words,
        |  round(mwl, 6) AS mean_word_len,
        |  round(top_c / CAST(n_words AS DOUBLE), 6) AS top_word_frac,
        |  round(distinct_words / CAST(n_words AS DOUBLE), 6) AS distinct_ratio,
        |  CAST(CASE WHEN n_words >= 20
        |        AND top_c / CAST(n_words AS DOUBLE) < 0.12
        |        AND distinct_words / CAST(n_words AS DOUBLE) > 0.35
        |       THEN 1 ELSE 0 END AS INT) AS keep_flag
        |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .withColumn("ws", split(col("text"), " "))
        .withColumn("n_words", size(col("ws")).cast("long"))
        .withColumn("distinct_words", size(array_distinct(col("ws"))).cast("long"))
        // max run length over the sorted array == the top word's count
        .withColumn("top_c", topWordCount(col("ws")))
        .withColumn("mwl", expr(
          "aggregate(ws, 0L, (acc, w) -> acc + length(w))").cast("double")
          / col("n_words"))
        .select(col("doc_id"),
          col("n_words").cast("long").as("n_words"),
          col("distinct_words").cast("long").as("distinct_words"),
          round(col("mwl"), 6).as("mean_word_len"),
          round(col("top_c") / col("n_words").cast("double"), 6).as("top_word_frac"),
          round(col("distinct_words") / col("n_words").cast("double"), 6)
            .as("distinct_ratio"),
          when(col("n_words") >= 20 &&
              col("top_c") / col("n_words").cast("double") < 0.12 &&
              col("distinct_words") / col("n_words").cast("double") > 0.35,
            1).otherwise(0).cast("int").as("keep_flag"))
        .orderBy("doc_id")
    },

    // ---- q81: benchmark contamination check -----------------------------
    // The eval-set hygiene pass every training pipeline needs: which
    // corpus documents share 5-gram shingles with a held-out benchmark
    // set (stand-in: doc_id % 10 = 0)? Shingles are hashed to 60-bit
    // md5 keys (identical arithmetic in the oracle) so the overlap join
    // shuffles 8-byte keys, never shingle strings; the benchmark side
    // is a plain equi-join input — at real scale it is far too big to
    // broadcast, and nothing here needs it to be. Reported: per-doc
    // distinct-shingle count, benchmark hits (shingles from OTHER
    // docs), and the contamination fraction, thresholded at 0.2 — the
    // six flagged docs at sf0.01 are exactly the cross-boundary
    // near-dup pairs. Plan shape: shingle hashing and per-doc
    // DEDUPLICATION are per-row array expressions (array_distinct on
    // the hashed shingle array — no corpus-wide distinct exchange), and
    // the per-doc shingle total comes free as the array size; the only
    // corpus-scale shuffle is the unavoidable overlap equi-join on the
    // 8-byte keys, plus a per-doc count over the (small) hit set.
    Q("q81_contamination",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents WHERE len(string_split(text, ' ')) >= 5),
        |ix AS (SELECT doc_id, ws, unnest(range(1, len(ws) - 3)) AS i FROM t),
        |sh AS (SELECT DISTINCT doc_id,
        |         (('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 15))::BIGINT) AS k
        |       FROM ix),
        |bench AS (SELECT DISTINCT k, doc_id FROM sh WHERE doc_id % 10 = 0),
        |hits AS (SELECT a.doc_id, count(DISTINCT a.k) AS n_hit
        |         FROM sh a JOIN bench b ON a.k = b.k AND b.doc_id <> a.doc_id
        |         GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1)
        |SELECT t.doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
        |  CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
        |  round(coalesce(n_hit, 0) / CAST(n_shingles AS DOUBLE), 6) AS contaminated_frac
        |FROM tot t LEFT JOIN hits h USING (doc_id)
        |WHERE round(coalesce(n_hit, 0) / CAST(n_shingles AS DOUBLE), 6) >= 0.2
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      contaminationStats(docs(s, dir))
        .filter(col("contaminated_frac") >= 0.2)
        .orderBy("doc_id")
    },

    // ---- q86: within-document repetition filter (Gopher §A.1.1) ---------
    // The repetition signals q80's word-level stats can't see: documents
    // that loop — boilerplate, template spam, stuck generation — repeat
    // PHRASES, not just words. Per doc: the most-frequent-2-gram
    // fraction (top 2-gram count / total 2-grams), the duplicate-3-gram
    // fraction (1 − distinct/total), and the longest run of consecutive
    // IDENTICAL words (a stuck-key/stutter signal no bag-of-ngrams
    // metric catches — order matters, so it needs the UNSORTED fold).
    // Like q80, everything is a per-row HOF expression: n-gram arrays
    // come from a windowed `transform`+`slice` (no explode), frequency
    // counts from the sorted-run-length fold, so the gate is MAP-ONLY —
    // the naive explode→groupBy(doc, gram) would shuffle every n-gram
    // in the corpus, ~2× the corpus bytes at 100 TB (PlanSpec pins zero
    // hash exchanges). Thresholds split this corpus ~65/35 so both
    // branches are exercised; all fractions derive from exact integer
    // counts, so Spark and DuckDB divide identically.
    Q("q86_repetition_filter",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |           WHERE len(string_split(text, ' ')) >= 3),
        |g2 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
        |       FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM t)),
        |top2 AS (SELECT doc_id, max(c) AS top2_c, sum(c) AS n2 FROM
        |         (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1),
        |g3 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        |       FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i FROM t)),
        |d3 AS (SELECT doc_id, count(*) - count(DISTINCT g) AS dup3_c,
        |              count(*) AS n3 FROM g3 GROUP BY 1),
        |wpos AS (SELECT doc_id, i, ws[i] AS w
        |         FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM t)),
        |runs AS (SELECT doc_id, max(cnt) AS max_run FROM
        |         (SELECT doc_id, count(*) AS cnt FROM
        |          (SELECT doc_id, i, w,
        |             i - row_number() OVER (PARTITION BY doc_id, w ORDER BY i) AS grp
        |           FROM wpos)
        |          GROUP BY doc_id, w, grp) GROUP BY 1)
        |SELECT doc_id,
        |  round(top2_c / CAST(n2 AS DOUBLE), 6) AS top2_frac,
        |  round(dup3_c / CAST(n3 AS DOUBLE), 6) AS dup3_frac,
        |  CAST(max_run AS BIGINT) AS max_word_run,
        |  CAST(CASE WHEN top2_c / CAST(n2 AS DOUBLE) < 0.045
        |        AND dup3_c / CAST(n3 AS DOUBLE) < 0.02
        |        AND max_run <= 2
        |       THEN 1 ELSE 0 END AS INT) AS keep_flag
        |FROM top2 JOIN d3 USING (doc_id) JOIN runs USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .withColumn("ws", split(col("text"), " "))
        .filter(size(col("ws")) >= 3)
        .withColumn("g2", ngrams(col("ws"), 2))
        .withColumn("g3", ngrams(col("ws"), 3))
        .withColumn("top2_frac",
          topWordCount(col("g2")) / size(col("g2")).cast("double"))
        .withColumn("dup3_frac",
          (size(col("g3")) - size(array_distinct(col("g3"))))
            / size(col("g3")).cast("double"))
        .withColumn("max_word_run", maxRunLength(col("ws")))
        .select(col("doc_id"),
          round(col("top2_frac"), 6).as("top2_frac"),
          round(col("dup3_frac"), 6).as("dup3_frac"),
          col("max_word_run").cast("long").as("max_word_run"),
          when(col("top2_frac") < 0.045 && col("dup3_frac") < 0.02 &&
              col("max_word_run") <= 2, 1).otherwise(0)
            .cast("int").as("keep_flag"))
        .orderBy("doc_id")
    },

    // ---- q101: n-gram LM perplexity (CCNet-style quality filter) --------
    // The quality signal q24/q80/q86 can't see: FLUENCY. Train an
    // add-k-smoothed word-bigram language model on the corpus itself,
    // then score every document by its perplexity under that model —
    // documents whose word transitions are improbable relative to the
    // corpus (spam, shredded text, wrong-domain) surface with high ppl.
    // This is the CCNet/KenLM filtering recipe with the LM expressed as
    // TWO map-side-combinable aggregations instead of an external
    // toolkit. P(w2|w1) = (c(w1 w2) + a) / (c(w1·) + a·V), a = 0.5.
    // Plan shape at 100 TB: bigram/unigram counts are groupBy partial
    // aggs (the vocab table is ≪ corpus — Zipf — and broadcasts here);
    // scoring re-joins bigram INSTANCES to the two count tables on
    // their own grouping keys, so Catalyst reuses the agg partitioning;
    // V rides along as a broadcast one-row cross join. No window, no
    // driver state. Double-sum order differs between engines; round(,4)
    // absorbs the ~1e-13 drift (q55/q62 precedent).
    Q("q101_lm_perplexity",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS g
        |       FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM t)),
        |c2 AS (SELECT g, count(*) AS c2 FROM bi GROUP BY 1),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
        |v AS (SELECT count(DISTINCT ws[i]) AS v
        |      FROM (SELECT ws, unnest(range(1, len(ws) + 1)) AS i FROM t)),
        |nll AS (SELECT bi.doc_id, count(*) AS n_bigrams,
        |    sum(ln((c2.c2 + 0.5) / (c1.c1 + 0.5 * v.v))) AS ll
        |  FROM bi JOIN c2 USING (g) JOIN c1 USING (w1) CROSS JOIN v
        |  GROUP BY 1)
        |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
        |  round(exp(-ll / n_bigrams), 4) AS ppl
        |FROM nll ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val t = docs(s, dir)
        .withColumn("ws", split(col("text"), " "))
        .filter(size(col("ws")) >= 2)
        .localCheckpoint(true) // read by bigrams AND the vocab count
      val bi = t.select(col("doc_id"), explode(ngrams(col("ws"), 2)).as("g"))
        .withColumn("w1", substring_index(col("g"), " ", 1))
      val c2 = bi.groupBy("g").agg(count(lit(1)).as("c2"))
      val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
      val v = t.select(explode(col("ws")).as("w"))
        .agg(countDistinct(col("w")).as("v"))
      bi.join(c2, Seq("g")).join(c1, Seq("w1"))
        .crossJoin(broadcast(v))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(log((col("c2") + 0.5) / (col("c1") + col("v") * 0.5))).as("ll"))
        .select(col("doc_id"), col("n_bigrams").cast("long").as("n_bigrams"),
          round(exp(-col("ll") / col("n_bigrams")), 4).as("ppl"))
        .orderBy("doc_id")
    },

    // ---- q121: heavy hitters via a Misra-Gries sketch + exact recount --
    // Two-pass ε-heavy-hitter plan (functions/MisraGries.scala): pass 1
    // streams every token through a cap=64-counter mergeable sketch
    // (bounded memory, ≤cap counters cross the exchange per partition);
    // pass 2 recounts ONLY the ≤cap surviving candidates exactly and
    // keeps count > N/(cap+1). The MG guarantee makes the composition
    // EXACT — the oracle is the full-shuffle groupBy it avoids. At
    // corpus scale pass 2's filter pushes ≤cap literals into the scan,
    // so the token-frequency domain never crosses a shuffle. The
    // sketch-pass collect is ONE row (≤cap strings + a long) — bounded
    // by construction. Integer cross-multiply keeps the threshold exact.
    Q("q121_heavy_hitters",
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
        |           FROM documents),
        |tt AS (SELECT token FROM t WHERE token <> ''),
        |c AS (SELECT token, count(*) AS cnt FROM tt GROUP BY 1)
        |SELECT token, cnt FROM c
        |WHERE cnt * 65 > (SELECT count(*) FROM tt)
        |ORDER BY cnt DESC, token""".stripMargin) { (s, dir) =>
      val cap = 64
      val toks = docs(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
      val mg = udaf(new graft.functions.MisraGriesAgg(cap))
      val sk = toks.agg(mg(col("token")).as("s"))
        .select(col("s.candidates").as("candidates"), col("s.n").as("n"))
        .head() // bounded: one row, ≤cap strings
      val cands = sk.getSeq[String](0)
      val n = sk.getLong(1)
      toks.filter(col("token").isin(cands: _*))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * (cap + 1) > n)
        .orderBy(desc("cnt"), asc("token"))
    },

    // ---- q128: PER-GROUP heavy hitters — the sketch as grouped agg -----
    // q121's Misra-Gries Aggregator dropped into an ordinary groupBy:
    // one sketch buffer PER SOURCE, partial-reduced map-side and merged
    // per key like any aggregate — the mergeable-summary property is
    // what makes the sketch a first-class grouped aggregation. The
    // recount pass joins the ≤groups·cap candidate list back (broadcast
    // — it is bounded by construction, NOT corpus-sized) and keeps
    // count > n_g/(cap+1) per group's own n. Exact per the same
    // superset guarantee, per group independently.
    Q("q128_heavy_hitters_by_source",
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS token
        |           FROM documents),
        |tt AS (SELECT source, token FROM t WHERE token <> ''),
        |n AS (SELECT source, count(*) AS n FROM tt GROUP BY 1),
        |c AS (SELECT source, token, count(*) AS cnt FROM tt GROUP BY 1, 2)
        |SELECT c.source, c.token, c.cnt FROM c JOIN n USING (source)
        |WHERE c.cnt * 33 > n.n
        |ORDER BY source, cnt DESC, token""".stripMargin) { (s, dir) =>
      import s.implicits._
      val cap = 32
      val toks = docs(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
      val mg = udaf(new graft.functions.MisraGriesAgg(cap))
      val sketches = toks.groupBy("source").agg(mg(col("token")).as("s"))
        .select(col("source"), col("s.candidates"), col("s.n"))
        .collect() // bounded: one row per source, ≤cap strings each
      require(sketches.length <= 1000,
        s"per-group sketch collect is bounded at 1000 groups; " +
          s"got ${sketches.length}")
      val candDf = sketches.toSeq.flatMap { r =>
        r.getSeq[String](1).map(tok => (r.getString(0), tok, r.getLong(2)))
      }.toDF("source", "token", "n_g")
      toks.join(broadcast(candDf), Seq("source", "token"))
        .groupBy("source", "token")
        .agg(count(lit(1)).as("cnt"), first(col("n_g")).as("n_g"))
        .filter(col("cnt") * (cap + 1) > col("n_g"))
        .select(col("source"), col("token"), col("cnt"))
        .orderBy(asc("source"), desc("cnt"), asc("token"))
    },

    // ---- q131: Unicode NFC normalization (native codegen expression) ---
    // The FIRST step of web-text cleaning: the same visible string
    // arrives composed (U+00E9) and decomposed (e+U+0301), and every
    // downstream exact-dedup hash / shingle / blocklist match sees them
    // as different documents unless normalized. Spark has no builtin —
    // `functions/NfcNormalize.scala` is a custom Catalyst expression
    // (one static Normalizer call inside whole-stage codegen, no UDF
    // boundary); DuckDB's nfc_normalize is the oracle counterpart. The
    // fixture plants deterministic composed/decomposed suffixes by
    // doc_id parity so both branches carry traffic: len_raw > len_nfc
    // and changed=1 exactly on the decomposed rows, and md5(norm) hash-
    // pins the normalized BYTES, not just the lengths. Map-only.
    Q("q131_nfc_normalize",
      s"""WITH t AS (SELECT doc_id,
        |    substr(text, 1, 40) || ' ' ||
        |    CASE WHEN doc_id % 2 = 0 THEN 'cafe\u0301' ELSE 'caf\u00e9' END ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' u\u0308ber' ELSE ' \u00fcber' END AS raw
        |  FROM documents),
        |n AS (SELECT doc_id, raw, nfc_normalize(raw) AS norm FROM t)
        |SELECT doc_id, CAST(length(raw) AS INT) AS len_raw,
        |  CAST(length(norm) AS INT) AS len_nfc,
        |  CAST(raw <> norm AS INT) AS changed, md5(norm) AS norm_md5
        |FROM n ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // decomposed (e+U+0301, u+U+0308) on the %2/%3 branches, composed
      // (U+00E9, U+00FC) otherwise; source-level unicode escapes keep
      // the file ASCII-only and the two forms visibly distinct — scalac
      // substitutes them into BOTH the SQL text and the lits, so the
      // engines receive identical code points
      val raw = concat(
        substring(col("text"), 1, 40), lit(" "),
        when(col("doc_id") % 2 === 0, lit("cafe\u0301"))
          .otherwise(lit("caf\u00e9")),
        when(col("doc_id") % 3 === 0, lit(" u\u0308ber"))
          .otherwise(lit(" \u00fcber")))
      docs(s, dir)
        .select(col("doc_id"), raw.as("raw"))
        .withColumn("norm", expr("nfc_normalize(raw)"))
        .select(col("doc_id"),
          length(col("raw")).as("len_raw"),
          length(col("norm")).as("len_nfc"),
          (col("raw") =!= col("norm")).cast("int").as("changed"),
          md5(col("norm")).as("norm_md5"))
        .orderBy("doc_id")
    },

    // ---- q132: blocklist content gate (C4-style) ------------------------
    // C4 dropped any page containing one word from a blocklist; modern
    // gates also use the hit fraction. Both signals per doc, map-only:
    // distinct list words present (array_intersect against the literal
    // list), total hit count, and the drop flag — the list is a plan
    // literal, so at 100 TB this is a pure scan+project with no join,
    // no broadcast, nothing corpus-sized beyond the scan itself.
    Q("q132_blocklist_gate",
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS ws
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_intersect(ws, $blocklistSqlList)) AS INT) AS n_bad_distinct,
        |  CAST(len(list_filter(ws, x -> list_contains($blocklistSqlList, x))) AS BIGINT) AS bad_hits,
        |  CAST(len(list_filter(ws, x -> list_contains($blocklistSqlList, x))) > 0 AS INT) AS dropped
        |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .withColumn("_w", split(norm(col("text")), " "))
        .withColumn("_hits", size(filter(col("_w"), w => w.isin(blocklist: _*))))
        .select(col("doc_id"),
          size(array_intersect(col("_w"), typedLit(blocklist))).as("n_bad_distinct"),
          col("_hits").cast("long").as("bad_hits"),
          (col("_hits") > 0).cast("int").as("dropped"))
        .orderBy("doc_id")
    },

    // ---- q134: sparse TF-IDF cosine similarity (inverted postings) ------
    // Document-to-document similarity WITHOUT embeddings: tf-idf sparse
    // vectors (BIGRAM terms — the fixture vocabulary is ~30 words, so
    // unigram df saturates; real corpora would use unigrams+bigrams)
    // scored term-at-a-time through an inverted-postings
    // equi-join — the classic sparse-MIPS layout that stays linear in
    // postings. Terms with df > 100 are dropped on BOTH sides (impact
    // pruning: stopword-grade terms carry no signal but cost df^2 pair
    // fanout — the same cap discipline as the LSH hot-shingle cap).
    // Cosines are rounded to 6 dp BEFORE ranking so the top-3 cutoff is
    // cross-engine stable, and the per-query top-3 runs through the
    // custom TopKPerKey operator (partial per-partition heaps,
    // winners-only exchange — never a corpus-wide window sort).
    Q("q134_sparse_cosine_topk",
      s"""WITH ws0 AS (SELECT doc_id, string_split($normSql, ' ') AS ws
        |            FROM documents),
        |t AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |        i -> ws[i] || ' ' || ws[i + 1])) AS term FROM ws0),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1
        |       HAVING count(*) <= 100),
        |nd AS (SELECT count(*) AS n FROM documents),
        |w AS (SELECT tf.doc_id, tf.term,
        |    tf.tf * ln(CAST((SELECT n FROM nd) AS DOUBLE) / df.df) AS w
        |  FROM tf JOIN df USING (term)),
        |nm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
        |p AS (SELECT q.doc_id AS query_id, d.doc_id AS neighbor_id,
        |    sum(q.w * d.w) AS dot
        |  FROM w q JOIN w d ON d.term = q.term AND d.doc_id <> q.doc_id
        |  WHERE q.doc_id % 50 = 0 GROUP BY 1, 2),
        |c AS (SELECT p.query_id, p.neighbor_id,
        |    round(p.dot / (nq.nrm * nd2.nrm), 6) AS cos_sim
        |  FROM p JOIN nm nq ON nq.doc_id = p.query_id
        |         JOIN nm nd2 ON nd2.doc_id = p.neighbor_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cos_sim DESC, neighbor_id) AS rn FROM c)
        |SELECT query_id, neighbor_id, cos_sim FROM r WHERE rn <= 3
        |ORDER BY query_id, cos_sim DESC, neighbor_id""".stripMargin) { (s, dir) =>
      val nDocs = docs(s, dir).count().toDouble // one bounded scalar
      val tf = docs(s, dir)
        .withColumn("_ws", split(norm(col("text")), " "))
        .select(col("doc_id"), explode(ngrams(col("_ws"), 2)).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 100)
      val w = tf.join(dft, "term")
        .select(col("doc_id"), col("term"),
          (col("tf") * log(lit(nDocs) / col("df"))).as("w"))
        .localCheckpoint(true) // postings read by both join sides + norms
      val nm = w.groupBy("doc_id").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      val q = w.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"), col("term"), col("w").as("wq"))
      val d = w.select(col("doc_id").as("neighbor_id"), col("term"),
        col("w").as("wd"))
      val pairs = q.join(d, Seq("term"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(sum(col("wq") * col("wd")).as("dot"))
      val cos = pairs
        .join(nm.select(col("doc_id").as("query_id"), col("nrm").as("nq")),
          "query_id")
        .join(nm.select(col("doc_id").as("neighbor_id"), col("nrm").as("nn")),
          "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          round(col("dot") / (col("nq") * col("nn")), 6).as("cos_sim"))
      graft.plans.TopK.perKey(cos, Seq("query_id"),
          struct(col("cos_sim"), -col("neighbor_id")), 3)
        .orderBy(asc("query_id"), desc("cos_sim"), asc("neighbor_id"))
    },

    // ---- q137: character-entropy quality signal -------------------------
    // Low character entropy = repetitive/degenerate text (keyboard mash,
    // repeated fills) — a Gopher-family gate orthogonal to the word
    // ratios (q24) and phrase repetition (q86). Per-row only: WORD
    // unigram entropy H = -sum p ln p over the doc's own word
    // distribution, computed as one sorted-array run-length fold (the
    // maxRunLength trick generalized: counts of equal neighbors in the
    // sorted token array), so the metric costs zero shuffles at any
    // corpus size. Flag = below-threshold entropy on a token floor.
    Q("q137_entropy_gate",
      s"""WITH w AS (SELECT doc_id,
        |    list_sort(string_split($normSql, ' ')) AS ws FROM documents),
        |c AS (SELECT doc_id, len(ws) AS n,
        |    list_transform(range(1, len(ws) + 1),
        |      i -> CASE WHEN i = len(ws) OR ws[i] <> ws[i + 1]
        |           THEN i ELSE NULL END) AS ends
        |  FROM w),
        |e AS (SELECT doc_id, n,
        |    list_filter(ends, x -> x IS NOT NULL) AS bounds FROM c),
        |h AS (SELECT doc_id, n,
        |    len(bounds) AS n_distinct,
        |    -list_sum(list_transform(range(1, len(bounds) + 1),
        |      j -> (CAST((bounds[j] - coalesce(bounds[j - 1], 0)) AS DOUBLE) / n)
        |           * ln(CAST((bounds[j] - coalesce(bounds[j - 1], 0)) AS DOUBLE) / n)))
        |      AS ent
        |  FROM e WHERE n > 0)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST(n_distinct AS BIGINT) AS n_distinct,
        |  round(ent, 4) AS entropy,
        |  CAST(n >= 20 AND ent < 2.0 AS INT) AS low_entropy
        |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // run boundaries in the SORTED token array: position i is a run
      // end iff it is the last element or differs from its successor;
      // run length = bound[j] - bound[j-1] gives each distinct token's
      // count without any explode/groupBy
      val ws = array_sort(split(norm(col("text")), " "))
      val ends = transform(sequence(lit(1), size(col("_ws"))),
        i => when(i === size(col("_ws")) ||
          element_at(col("_ws"), i) =!= element_at(col("_ws"), i + 1), i))
      docs(s, dir)
        .withColumn("_ws", ws)
        .filter(size(col("_ws")) > 0)
        .withColumn("_b", filter(ends, x => x.isNotNull))
        .select(col("doc_id"),
          size(col("_ws")).cast("long").as("n_tokens"),
          size(col("_b")).cast("long").as("n_distinct"),
          col("_ws"), col("_b"))
        .withColumn("ent", -aggregate(
          sequence(lit(1), size(col("_b"))),
          lit(0.0d),
          (acc, j) => {
            // element_at rejects index 0 — the j=1 run starts at 0
            val prev = when(j === 1, lit(0))
              .otherwise(element_at(col("_b"), j - 1))
            val run = (element_at(col("_b"), j) - prev).cast("double") /
              size(col("_ws"))
            acc + run * log(run)
          }))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          round(col("ent"), 4).as("entropy"),
          (col("n_tokens") >= 20 && col("ent") < 2.0).cast("int")
            .as("low_entropy"))
        .orderBy("doc_id")
    },

    // ---- q175: language-ID confusion matrix ------------------------------
    // The model-eval report shape for the q25 classifier: labeled (gold)
    // language × detected language with within-label rates, over the
    // SAME localized corpus as q25 (the two must agree — the shared
    // Localize expression pins that). es/de detect correctly except for
    // the few docs that carry no marker word (an honest miss-rate on
    // the diagonal); fr/zh have no detector profile, so their rows show
    // exactly WHERE the heuristic dumps out-of-vocabulary languages —
    // the off-diagonal mass that tells you the detector needs a new
    // profile before the corpus mix shifts. Two tiny aggregates + one
    // broadcast join on the label; the detection chain is per-row map
    // work, identical to q25's.
    Q("q175_langid_confusion", {
      val padded = s"(' ' || ${graft.core.Localize.textSql(normSql)} || ' ')"
      val en = Seq(" the ", " a ", " of ").map(k => occurrencesSql(padded, k)).mkString("(", "+", ")")
      val es = Seq(" el ", " la ", " los ").map(k => occurrencesSql(padded, k)).mkString("(", "+", ")")
      val de = Seq(" der ", " und ", " das ").map(k => occurrencesSql(padded, k)).mkString("(", "+", ")")
      s"""WITH d AS (SELECT lang AS labeled_lang,
        |    CASE WHEN $en >= $es AND $en >= $de THEN 'en'
        |         WHEN $es >= $de THEN 'es' ELSE 'de' END AS detected_lang
        |  FROM documents),
        |m AS (SELECT labeled_lang, detected_lang, count(*) AS n_docs
        |      FROM d GROUP BY 1, 2),
        |t AS (SELECT labeled_lang, count(*) AS n_label FROM d GROUP BY 1)
        |SELECT m.labeled_lang, m.detected_lang,
        |  CAST(m.n_docs AS BIGINT) AS n_docs,
        |  round(CAST(m.n_docs AS DOUBLE) / t.n_label, 6) AS label_share
        |FROM m JOIN t USING (labeled_lang)
        |ORDER BY labeled_lang, detected_lang""".stripMargin
    }) { (s, dir) =>
      def score(kws: Seq[String]): Column =
        kws.map(k => occurrences(col("_p"), k)).reduce(_ + _)
      val d = docs(s, dir)
        .withColumn("_p", concat(lit(" "),
          graft.core.Localize.text(col("lang"), norm(col("text"))), lit(" ")))
        .withColumn("_en", score(Seq(" the ", " a ", " of ")))
        .withColumn("_es", score(Seq(" el ", " la ", " los ")))
        .withColumn("_de", score(Seq(" der ", " und ", " das ")))
        .select(col("lang").as("labeled_lang"),
          when(col("_en") >= col("_es") && col("_en") >= col("_de"), "en")
            .when(col("_es") >= col("_de"), "es").otherwise("de")
            .as("detected_lang"))
      val m = d.groupBy("labeled_lang", "detected_lang")
        .agg(count(lit(1)).as("n_docs"))
      val t = d.groupBy("labeled_lang").agg(count(lit(1)).as("n_label"))
      m.join(broadcast(t), "labeled_lang")
        .select(col("labeled_lang"), col("detected_lang"), col("n_docs"),
          round(col("n_docs").cast("double") / col("n_label"), 6)
            .as("label_share"))
        .orderBy("labeled_lang", "detected_lang")
    },

    // ---- q176: HTML text extraction -------------------------------------
    // The step every web-crawl pipeline runs FIRST (trafilatura/
    // jusText's regex tier): drop script blocks, strip tags, unescape
    // entities, normalize whitespace — map-only per row, so a 100 TB
    // crawl is scan-bound. The corpus has no HTML, so each doc is
    // deterministically wrapped in-query (tag soup with a script block
    // whose body contains a DECOY entity, and entity-bearing footer
    // text); the roundtrip check compares the regex-extracted text to
    // the expected string built by PLAIN CONCATENATION — the regex
    // pipeline must recover it exactly, including removing the script
    // before unescaping (the decoy &lt; would corrupt the text if the
    // order were wrong). Patterns are in the RE2 ∩ Java subset.
    Q("q176_html_strip",
      """WITH h AS (SELECT doc_id, source,
        |    '<html><head><title>T' || doc_id
        |      || '</title><script type="text/javascript">if (x &lt; 1) { x = 2; }</script></head><body><p>'
        |      || text || '</p><div class="ft">Tom &amp; Jerry &gt; all</div></body></html>'
        |      AS html,
        |    'T' || doc_id || ' ' || text || ' Tom & Jerry > all' AS expected
        |  FROM documents),
        |e AS (SELECT doc_id, source, html, expected,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(html, '<script[^>]*>.*?</script>', ' ', 'g'),
        |          '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS extracted
        |  FROM h)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(html)) AS BIGINT) AS html_chars,
        |  CAST(sum(length(extracted)) AS BIGINT) AS text_chars,
        |  CAST(sum(CASE WHEN extracted = expected THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_roundtrip,
        |  round(CAST(sum(length(extracted)) AS DOUBLE)
        |    / sum(length(html)), 6) AS text_ratio
        |FROM e GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val html = concat(lit("<html><head><title>T"), col("doc_id"),
        lit("</title><script type=\"text/javascript\">if (x &lt; 1) { x = 2; }</script></head><body><p>"),
        col("text"),
        lit("</p><div class=\"ft\">Tom &amp; Jerry &gt; all</div></body></html>"))
      val expected = concat(lit("T"), col("doc_id"), lit(" "), col("text"),
        lit(" Tom & Jerry > all"))
      val noScript = regexp_replace(col("html"), "<script[^>]*>.*?</script>", " ")
      val noTags = regexp_replace(noScript, "<[^>]*>", " ")
      val unescaped = regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(noTags, "&lt;", "<"), "&gt;", ">"),
        "&quot;", "\""), "&amp;", "&")
      docs(s, dir)
        .select(col("doc_id"), col("source"), html.as("html"),
          expected.as("expected"))
        .withColumn("extracted",
          trim(regexp_replace(unescaped, "\\s+", " ")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("html"))).as("html_chars"),
          sum(length(col("extracted"))).as("text_chars"),
          sum(when(col("extracted") === col("expected"), 1L).otherwise(0L))
            .as("n_roundtrip"),
          round(sum(length(col("extracted"))).cast("double") /
            sum(length(col("html"))), 6).as("text_ratio"))
        .orderBy("source")
    },

    // ---- q218: reciprocal-rank fusion (hybrid retrieval) -----------------
    // The list-fusion step every hybrid retrieval stack runs after its
    // rankers: BM25 (q62's exact formula) and TF-IDF (q55's) each rank
    // the same 3-term query over the same postings; their top-100
    // lists fuse by RRF score Σ 1/(60 + rank) in exact integer
    // micro-units (1,000,000 div (60+r) per list, floor — so the fused
    // order is integer-deterministic, no float sum ordering). Scale
    // shape: each ranker is a global top-k (TakeOrderedAndProject —
    // never a full sort), positions are assigned to the BOUNDED
    // 100-row winners on the driver, and the fuse is a 100×100-row
    // full outer join — corpus size only touches the two scoring
    // aggregates, which are the q55/q62 plans already proven flat.
    Q("q218_rrf_fusion", {
      val (k1, b) = (1.2, 0.75)
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS term
        |  FROM documents),
        |dl AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
        |stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(dl) AS BIGINT) AS tot FROM dl),
        |p AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks WHERE term IN ('sort', 'hash', 'scan') GROUP BY doc_id, term),
        |d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY term),
        |bm AS (SELECT p.doc_id, round(sum(
        |    ln(1 + (n_docs - df + 0.5) / (df + 0.5)) *
        |    (tf * ${k1 + 1}) /
        |    (tf + $k1 * (1 - $b + $b * dl.dl /
        |      (CAST(tot AS DOUBLE) / n_docs)))), 4) AS s
        |  FROM p JOIN d USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |  GROUP BY p.doc_id),
        |tfidf AS (SELECT p.doc_id,
        |    round(sum(p.tf * ln(CAST(n_docs AS DOUBLE) / d.df)), 4) AS s
        |  FROM p JOIN d USING (term) CROSS JOIN stats GROUP BY p.doc_id),
        |ra AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id)
        |    AS r FROM bm QUALIFY r <= 100),
        |rb AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id)
        |    AS r FROM tfidf QUALIFY r <= 100),
        |f AS (SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
        |    coalesce(ra.r, 0) AS rank_bm25, coalesce(rb.r, 0) AS rank_tfidf,
        |    coalesce(1000000 // (60 + ra.r), 0)
        |      + coalesce(1000000 // (60 + rb.r), 0) AS rrf_micro
        |  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id)
        |SELECT doc_id, CAST(rank_bm25 AS BIGINT) AS rank_bm25,
        |  CAST(rank_tfidf AS BIGINT) AS rank_tfidf,
        |  CAST(rrf_micro AS BIGINT) AS rrf_micro
        |FROM f ORDER BY rrf_micro DESC, doc_id LIMIT 50""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val (k1, b) = (1.2, 0.75)
      val queryTerms = Seq("sort", "hash", "scan")
      // per-doc length = token-array size: a per-row projection, not an
      // explode + groupBy shuffle of every token. Null texts are
      // filtered so dl/n_docs match the explode+groupBy shape (which
      // dropped them) for any corpus, not just null-free fixtures.
      val dl = docs(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(split(norm(col("text")), " ")).cast("long").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot"))
      val postings = docs(s, dir)
        .select(col("doc_id"), explode(split(norm(col("text")), " ")).as("term"))
        .filter(col("term").isin(queryTerms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true) // scored twice: BM25 + TF-IDF
      val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))
      val avgdl = col("tot").cast("double") / col("n_docs")
      val idf = log(lit(1) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
      val bmScore = idf * (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1) - lit(b) + lit(b) * col("dl") / avgdl))
      val bm = postings
        .join(broadcast(dfs), "term").join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .groupBy("doc_id").agg(round(sum(bmScore), 4).as("s"))
      val tfidf = postings
        .join(broadcast(dfs), "term").crossJoin(broadcast(stats))
        .groupBy("doc_id")
        .agg(round(sum(col("tf") * log(col("n_docs").cast("double") / col("df"))), 4)
          .as("s"))
      // global top-k (TakeOrderedAndProject), then positions assigned to
      // the BOUNDED winner list on the driver — no partition-less window
      def ranks(scored: org.apache.spark.sql.DataFrame) =
        scored.orderBy(col("s").desc, col("doc_id")).limit(100)
          .select("doc_id").as[Long].collect()
          .zipWithIndex.map { case (d, i) => (d, i + 1L) }.toSeq
      val ra = ranks(bm).toDF("doc_id", "ra")
      val rb = ranks(tfidf).toDF("doc_id", "rb")
      ra.join(rb, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("ra"), lit(0L)).as("rank_bm25"),
          coalesce(col("rb"), lit(0L)).as("rank_tfidf"),
          (coalesce(expr("1000000 div (60 + ra)"), lit(0L)) +
            coalesce(expr("1000000 div (60 + rb)"), lit(0L))).as("rrf_micro"))
        .orderBy(col("rrf_micro").desc, col("doc_id"))
        .limit(50)
    },

    // ---- q220: distinctive terms per source (corpus-comparative) --------
    // The keyness diagnostic a mixture/curation run reads per source:
    // which terms are OVER-REPRESENTED in this source relative to the
    // rest of the corpus. Rate ratio in exact integer micro-units —
    // ratio = (a/(a+b)) / (c/(c+d)) computed as one integer floor
    // division a·(c+d)·1e6 div ((a+b)·c) with a +1 smoothing on the
    // rest-count (so a term absent elsewhere is finite and maximal,
    // deterministically) — no float until nothing is left to compute.
    // Dataflow: one token count per (source, term) (map-side
    // combinable), the per-term corpus total joined back broadcast,
    // top-5 per source via a PARTITIONED window over the bounded
    // (source × distinct-term) frame — the fact table never sorts.
    Q("q220_distinctive_terms", {
      s"""WITH toks AS (
        |  SELECT d.source, unnest(string_split($normSql, ' ')) AS term
        |  FROM documents d),
        |st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS a
        |       FROM toks GROUP BY 1, 2),
        |tot AS (SELECT term, CAST(sum(a) AS BIGINT) AS t FROM st GROUP BY 1),
        |src AS (SELECT source, CAST(sum(a) AS BIGINT) AS n FROM st GROUP BY 1),
        |all_n AS (SELECT CAST(sum(a) AS BIGINT) AS g FROM st),
        |r AS (SELECT st.source, st.term, st.a,
        |    (st.a * ((all_n.g - src.n) + 1) * 1000000)
        |      // (src.n * ((tot.t - st.a) + 1)) AS ratio_micro
        |  FROM st JOIN tot USING (term) JOIN src USING (source)
        |  CROSS JOIN all_n),
        |k AS (SELECT source, term, a, ratio_micro,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY ratio_micro DESC, term) AS rk FROM r)
        |SELECT source, CAST(rk AS INT) AS rk, term, a,
        |  CAST(ratio_micro AS BIGINT) AS ratio_micro
        |FROM k WHERE rk <= 5
        |ORDER BY source, rk""".stripMargin
    }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val st = docs(s, dir)
        .select(col("source"), explode(split(norm(col("text")), " ")).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("a"))
        .localCheckpoint(true) // read by tot/src/all_n and the ratio join
      val tot = st.groupBy("term").agg(sum("a").as("t"))
      val srcN = st.groupBy("source").agg(sum("a").as("n"))
      val g = st.agg(sum("a").as("g"))
      val r = st
        .join(tot, "term")
        .join(broadcast(srcN), "source")
        .crossJoin(broadcast(g))
        .select(col("source"), col("term"), col("a"),
          expr("(a * ((g - n) + 1) * 1000000) div (n * ((t - a) + 1))")
            .as("ratio_micro"))
      r.withColumn("rk", row_number().over(
          Window.partitionBy("source")
            .orderBy(col("ratio_micro").desc, col("term"))))
        .filter(col("rk") <= 5)
        .select(col("source"), col("rk").cast("int").as("rk"), col("term"),
          col("a"), col("ratio_micro"))
        .orderBy("source", "rk")
    }
  )
}
