package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Probabilistic-sketch completion of the engine's summary family
  * (Misra-Gries heavy hitters and exact-quantile narrowing already
  * live in functions/MisraGries.scala and operators/ExactQuantile
  * .scala): HyperLogLog cardinality, Count-Min frequency, and a Bloom
  * pre-filter — the three sketches a 100 TB pipeline leans on when the
  * exact answer would cost a corpus-wide shuffle of the full key
  * domain.
  *
  * All three are built DECLARATIVELY (hash → groupBy on a fixed-size
  * register/cell/bit domain), so Spark's partial aggregation IS the
  * sketch merge: every partition reduces its slice to ≤m summary rows
  * map-side and only that bounded summary crosses the exchange — the
  * mergeability that makes these sketches work on a 1000-executor
  * cluster is exactly what Catalyst's two-phase hash aggregate
  * provides for free. No driver-side state, no UDAF buffers, no
  * collect beyond the bounded report.
  *
  * ORACLE DESIGN: the estimators are pinned end-to-end in integers —
  * md5-derived 60-bit hashes (bit-identical in DuckDB and Spark),
  * register arithmetic as exact BIGINT sums of powers of two — with
  * ONE final float expression written token-identically on both
  * sides, so the DuckDB oracle replays the exact estimate, not a
  * tolerance band. Each query carries the exact answer beside the
  * estimate: the report a deployment reads before trusting the sketch
  * at the scale where exact is unaffordable.
  */
object Sketches {
  // loadSpread, not load: every sketch leg's first operator is a
  // per-row md5 coordinate/register map over the fact table — attached
  // to a one-row-group scan it runs on a single task (the register
  // groupBy only parallelizes AFTER the hashing)
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.loadSpread(s, dir, n)

  /** 60-bit hash of a string SQL expression: first 15 hex chars of
    * md5, parsed base-16 — the construction both engines evaluate
    * bit-identically (DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT). */
  private[graft] def h60(e: String): String =
    s"CAST(conv(substring(md5($e), 1, 15), 16, 10) AS BIGINT)"

  /** d salted (row, cell) coordinates of a string column — the
    * Count-Min / Bloom coordinate explode, one md5 per salt. */
  private def coords(colName: String, d: Int, w: Int): Column =
    explode(array((0 until d).map { i =>
      struct(lit(i.toLong).as("i"),
        expr(s"${h60(s"concat('$i', ':', $colName)")} % $w").as("cell"))
    }: _*))

  // ---- shared HLL machinery (q196 grouped build, q202 register merge) --

  /** (gs..., h) → per-group HLL registers (gs..., bucket, m_rho):
    * register = top 12 of 60 hash bits, rho = leading-zero rank of the
    * low 48 (49 - bit-length via bin()/length — no float log). The
    * groupBy max IS the sketch: partial_max reduces every partition to
    * ≤4096 register rows before the exchange. */
  private[graft] def hllRegisters(hashed: DataFrame, gs: Seq[String]): DataFrame =
    hashed
      .withColumn("bucket", expr("h DIV 281474976710656"))
      .withColumn("rem", expr("h % 281474976710656"))
      .withColumn("rho", when(col("rem") === 0, lit(49))
        .otherwise(lit(49) - length(bin(col("rem")))))
      .groupBy((gs :+ "bucket").map(col): _*).agg(max("rho").as("m_rho"))

  /** registers + exact-reference frame (gs..., exact_distinct) → the
    * report: exact, zeros, est (UNROUNDED — callers round). The
    * harmonic sum stays exact BIGINT (2^-rho scaled to 2^(49-rho),
    * absent registers 2^49 each); one float division plus the standard
    * linear-counting branch finish, token-identical to [[hllTailSql]]. */
  private def hllEstimate(regs: DataFrame, gs: Seq[String],
      ex: DataFrame): DataFrame =
    regs.groupBy(gs.map(col): _*).agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - m_rho AS INT))"))
          .as("sum_present"),
        count(lit(1)).as("n_present"))
      .join(ex, gs)
      .withColumn("zeros", lit(4096L) - col("n_present"))
      .withColumn("sum_scaled",
        col("sum_present") + col("zeros") * lit(562949953421312L))
      .withColumn("raw",
        expr("(0.7213 / (1.0 + 1.079 / 4096.0)) * 16777216.0" +
          " * 562949953421312.0 / sum_scaled"))
      .withColumn("est",
        when(col("raw") <= 10240.0 && col("zeros") > 0,
          lit(4096.0) * log(lit(4096.0) / col("zeros")))
          .otherwise(col("raw")))

  /** Oracle counterpart of [[hllRegisters]]: CTE chain from a CTE named
    * `h0` with columns ($g, h) to `regs` ($g, bucket, m_rho). */
  private def hllRegistersSql(g: String): String =
    s"""r0 AS (SELECT $g, h // 281474976710656 AS bucket,
      |        h % 281474976710656 AS rem FROM h0),
      |rr0 AS (SELECT $g, bucket,
      |        CASE WHEN rem = 0 THEN 49
      |             ELSE 49 - length(bin(rem)) END AS rho FROM r0),
      |regs AS (SELECT $g, bucket, max(rho) AS m_rho
      |         FROM rr0 GROUP BY 1, 2)""".stripMargin

  /** Oracle counterpart of [[hllEstimate]]: CTE chain from `regs`
    * ($g, bucket, m_rho) + `ex` ($g, exact_distinct) to `f`
    * ($g, exact_distinct, zeros, est). */
  private def hllTailSql(g: String): String =
    s"""sk AS (SELECT $g,
      |        sum((CAST(1 AS BIGINT) << CAST(49 - m_rho AS INT)))
      |          AS sum_present,
      |        count(*) AS n_present FROM regs GROUP BY 1),
      |j AS (SELECT sk.$g, ex.exact_distinct,
      |        4096 - sk.n_present AS zeros,
      |        sk.sum_present
      |          + (4096 - sk.n_present) * 562949953421312 AS sum_scaled
      |      FROM sk JOIN ex ON sk.$g = ex.$g),
      |e AS (SELECT $g, exact_distinct, zeros,
      |        (0.7213 / (1.0 + 1.079 / 4096.0)) * 16777216.0
      |          * 562949953421312.0 / sum_scaled AS raw FROM j),
      |f AS (SELECT $g, exact_distinct, zeros,
      |        CASE WHEN raw <= 10240.0 AND zeros > 0
      |             THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END AS est
      |      FROM e)""".stripMargin

  /** Final projection shared by the HLL reports (rounding pinned). */
  private def hllSelect(df: DataFrame, g: String): DataFrame =
    df.select(col(g),
      col("exact_distinct").cast("long").as("exact_distinct"),
      col("zeros").cast("long").as("zeros"),
      round(col("est"), 4).as("est_hll"),
      round((col("est") - col("exact_distinct"))
        / col("exact_distinct") * 100.0, 4).as("err_pct"))
      .orderBy(g)

  private def hllSelectSql(g: String): String =
    s"""SELECT $g, CAST(exact_distinct AS BIGINT) AS exact_distinct,
      |  CAST(zeros AS BIGINT) AS zeros, round(est, 4) AS est_hll,
      |  round((est - exact_distinct) / exact_distinct * 100.0, 4)
      |    AS err_pct
      |FROM f ORDER BY $g""".stripMargin

  val defs: Seq[Q] = Seq(
    // ---- q196: HyperLogLog distinct-count vs exact ---------------------
    // Flajolet et al. 2007 with the standard small-range linear-
    // counting correction, p=12 (4096 registers, ~1.6% expected
    // error), over the distinct (part, supplier) trade pairs per
    // return flag — ~19k distinct keys per group at sf0.01, so the raw
    // harmonic estimator carries the answer (the linear-counting
    // branch takes over at smaller scale factors; both branches are
    // oracle-replayed). Engine path: 60-bit md5 hash → top 12 bits
    // pick the register, rho = leading-zero rank of the low 48 bits
    // (49 - bit-length via bin()/length — no float log), groupBy(flag,
    // register) max(rho) — the ENTIRE fact table reduces map-side to
    // ≤4096 rows per group per partition before the only exchange.
    // The harmonic sum stays exact: 2^-rho is scaled to the integer
    // 2^(49-rho) (sum ≤ 4096·2^49 < 2^62), absent registers contribute
    // 2^49 each; ONE float division finishes, written token-
    // identically in the oracle. count(DISTINCT) sits beside it as
    // the reference.
    Q("q196_hll_cardinality",
      s"""WITH k AS (SELECT l_returnflag AS grp,
        |        CAST(l_partkey AS VARCHAR) || '-'
        |          || CAST(l_suppkey AS VARCHAR) AS key FROM lineitem),
        |h0 AS (SELECT grp,
        |        ('0x' || substr(md5(key), 1, 15))::BIGINT AS h FROM k),
        |${hllRegistersSql("grp")},
        |ex AS (SELECT grp, count(DISTINCT key) AS exact_distinct
        |       FROM k GROUP BY 1),
        |${hllTailSql("grp")}
        |${hllSelectSql("grp")}""".stripMargin) { (s, dir) =>
      val k = t(s, dir, "lineitem").select(
        col("l_returnflag").as("grp"),
        concat(col("l_partkey").cast("string"), lit("-"),
          col("l_suppkey").cast("string")).as("key"))
      val regs = hllRegisters(
        k.select(col("grp"), expr(h60("key")).as("h")), Seq("grp"))
      val ex = k.groupBy("grp")
        .agg(countDistinct("key").as("exact_distinct"))
      hllSelect(hllEstimate(regs, Seq("grp"), ex), "grp")
    },

    // ---- q202: sliding-window cardinality by HLL register merge --------
    // THE property that makes HLL the 100 TB distinct-counter: sketches
    // union by register-wise max, so a trailing 3-month distinct-parts
    // series costs ONE scan — per-month registers are built once, then
    // each register row fans out to the ≤3 windows it serves (explode ×3,
    // ≤12288 rows per month) and re-maxes per target month. No re-scan
    // of the fact table per window, no distinct-over-window blowup; the
    // exact reference beside it pays the full 3× explode + distinct.
    // Register merge and estimator replay token-identically in DuckDB
    // (the linear-counting branch carries sf0.001; raw at bigger SFs).
    Q("q202_hll_sliding_window",
      s"""WITH mrows AS (SELECT
        |        CAST(date_trunc('month', l_shipdate) AS DATE) AS mon,
        |        CAST(l_partkey AS VARCHAR) AS key FROM lineitem),
        |months AS (SELECT DISTINCT mon FROM mrows),
        |h0 AS (SELECT mon,
        |        ('0x' || substr(md5(key), 1, 15))::BIGINT AS h FROM mrows),
        |${hllRegistersSql("mon").replace("regs AS", "regs0 AS")},
        |sp AS (SELECT CAST(regs0.mon + to_months(CAST(r.i AS INT)) AS DATE)
        |          AS mon, bucket, m_rho
        |       FROM regs0 CROSS JOIN range(3) r(i)),
        |regs AS (SELECT sp.mon, bucket, max(m_rho) AS m_rho
        |         FROM sp JOIN months mm ON mm.mon = sp.mon
        |         GROUP BY 1, 2),
        |e0 AS (SELECT CAST(mrows.mon + to_months(CAST(r.i AS INT)) AS DATE)
        |          AS mon, key
        |       FROM mrows CROSS JOIN range(3) r(i)),
        |ex AS (SELECT e0.mon, count(DISTINCT key) AS exact_distinct
        |       FROM e0 JOIN months mm ON mm.mon = e0.mon GROUP BY 1),
        |${hllTailSql("mon")}
        |${hllSelectSql("mon")}""".stripMargin) { (s, dir) =>
      val mrows = t(s, dir, "lineitem").select(
        to_date(date_trunc("month", col("l_shipdate"))).as("mon"),
        col("l_partkey").cast("string").as("key"))
      val months = mrows.select("mon").distinct()
      val regs0 = hllRegisters(
        mrows.select(col("mon"), expr(h60("key")).as("h")), Seq("mon"))
      val offs = explode(array(lit(0), lit(1), lit(2))).as("i")
      val regs = regs0.select(col("mon"), col("bucket"), col("m_rho"), offs)
        .select(add_months(col("mon"), col("i")).as("mon"),
          col("bucket"), col("m_rho"))
        .join(broadcast(months), "mon")
        .groupBy("mon", "bucket").agg(max("m_rho").as("m_rho"))
      val ex = mrows.select(col("mon"), col("key"), offs)
        .select(add_months(col("mon"), col("i")).as("mon"), col("key"))
        .join(broadcast(months), "mon")
        .groupBy("mon").agg(countDistinct("key").as("exact_distinct"))
      hllSelect(hllEstimate(regs, Seq("mon"), ex), "mon")
    },

    // ---- q197: Count-Min frequency estimates vs exact ------------------
    // Cormode & Muthukrishnan 2005: d=4 salted hash rows × w=512
    // cells over the 2000-part demand stream (~30 hits/part, so ~4
    // parts share every cell and the collision overcount is REAL and
    // exactly reproducible). Build is ONE pass — each fact row
    // explodes into its 4 (row, cell) coordinates and hash-aggregates;
    // the ≤2048-cell table IS the sketch, reduced map-side exactly
    // like q196's registers. Probes are a fixed deterministic panel
    // (every 100th part); the bounded sketch is BROADCAST to the probe
    // side and the point estimate is min over the 4 cells — always ≥
    // the true count (CMS never undercounts; `overcount` shows exactly
    // what the collisions cost). All-integer end to end: the oracle
    // replays it verbatim.
    Q("q197_cms_frequency",
      """WITH k AS (SELECT CAST(l_partkey AS VARCHAR) AS key FROM lineitem),
        |c AS (SELECT key, count(*) AS cnt FROM k GROUP BY 1),
        |cells AS (SELECT r.i,
        |        ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || k.key),
        |          1, 15))::BIGINT % 512 AS cell,
        |        count(*) AS c
        |      FROM k CROSS JOIN range(4) r(i) GROUP BY 1, 2),
        |probes AS (SELECT p_partkey,
        |        CAST(p_partkey AS VARCHAR) AS key FROM part
        |      WHERE p_partkey % 100 = 0),
        |pe AS (SELECT p.p_partkey, min(cl.c) AS cms_est
        |       FROM probes p CROSS JOIN range(4) r(i)
        |       JOIN cells cl ON cl.i = r.i AND cl.cell =
        |         ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || p.key),
        |           1, 15))::BIGINT % 512
        |       GROUP BY 1)
        |SELECT pe.p_partkey, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt,
        |  CAST(pe.cms_est AS BIGINT) AS cms_est,
        |  CAST(pe.cms_est - coalesce(c.cnt, 0) AS BIGINT) AS overcount
        |FROM pe LEFT JOIN c ON c.key = CAST(pe.p_partkey AS VARCHAR)
        |ORDER BY pe.p_partkey""".stripMargin) { (s, dir) =>
      val k = t(s, dir, "lineitem")
        .select(col("l_partkey").cast("string").as("key"))
      // ONE lineitem scan: the per-key counts (needed by the exact leg
      // anyway) are bounded by the part domain — checkpoint them and
      // derive the CMS cells as sum(cnt) per coordinate, which is the
      // same cell table as count(*) over the exploded fact rows but
      // hashes each DISTINCT key once instead of every row
      val cnts = k.groupBy("key").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val cells = cnts
        .select(coords("key", 4, 512).as("rc"), col("cnt"))
        .select(col("rc.i").as("i"), col("rc.cell").as("cell"), col("cnt"))
        .groupBy("i", "cell").agg(sum("cnt").as("c"))
      val probes = t(s, dir, "part")
        .filter(col("p_partkey") % 100 === 0)
        .select(col("p_partkey"), col("p_partkey").cast("string").as("key"))
      probes
        .select(col("p_partkey"), col("key"), coords("key", 4, 512).as("rc"))
        .select(col("p_partkey"), col("key"),
          col("rc.i").as("i"), col("rc.cell").as("cell"))
        .join(broadcast(cells), Seq("i", "cell"))
        .groupBy("p_partkey", "key").agg(min("c").as("cms_est"))
        .join(cnts, Seq("key"), "left")
        .select(col("p_partkey"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          col("cms_est"),
          (col("cms_est") - coalesce(col("cnt"), lit(0L))).as("overcount"))
        .orderBy("p_partkey")
    },

    // ---- q198: Bloom-filter membership pre-filter vs exact -------------
    // The join-pruning gate: before a probe side pays the exact
    // semi-join against a huge build side, a 2048-bit / k=3 Bloom
    // filter of the build keys rejects the certainly-absent rows for
    // the cost of a broadcast bitset — the hand-rolled, oracle-exact
    // version of what AQE's runtime bloom pushdown does inside joins.
    // Build side: the customers active in 1995-Q1 (~31% of the
    // probe domain, sized so the filter runs ~49% full and the
    // false-positive rate is measurably nonzero). Engine path: build
    // keys → DISTINCT occupied bit positions (≤2048 rows — the filter
    // itself); every customer probes its 3 positions (de-duped — two
    // salts may share a bit), left-joins the broadcast bitset, passes
    // only when ALL are occupied. No false negatives by construction —
    // the report pins n_exact_missed = 0 — and n_false_pos per market
    // segment shows what m and k buy. Integer-exact end to end.
    Q("q198_bloom_prefilter",
      """WITH act AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS key
        |  FROM orders
        |  WHERE o_orderdate >= DATE '1995-01-01'
        |    AND o_orderdate < DATE '1995-04-01'),
        |occ AS (SELECT DISTINCT
        |    ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || act.key),
        |      1, 15))::BIGINT % 2048 AS pos
        |  FROM act CROSS JOIN range(3) r(i)),
        |cust AS (SELECT c_custkey, c_mktsegment,
        |    CAST(c_custkey AS VARCHAR) AS key FROM customer),
        |bp AS (SELECT DISTINCT cust.c_custkey, cust.c_mktsegment, cust.key,
        |    ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || cust.key),
        |      1, 15))::BIGINT % 2048 AS pos
        |  FROM cust CROSS JOIN range(3) r(i)),
        |pd AS (SELECT bp.c_custkey, bp.c_mktsegment, bp.key,
        |    count(*) AS npos, count(occ.pos) AS nhit
        |  FROM bp LEFT JOIN occ ON occ.pos = bp.pos
        |  GROUP BY 1, 2, 3),
        |pe AS (SELECT pd.c_custkey, pd.c_mktsegment,
        |    CASE WHEN pd.npos = pd.nhit THEN 1 ELSE 0 END AS pass,
        |    CASE WHEN act.key IS NOT NULL THEN 1 ELSE 0 END AS member
        |  FROM pd LEFT JOIN act ON act.key = pd.key)
        |SELECT c_mktsegment, count(*) AS n_probe,
        |  CAST(sum(member) AS BIGINT) AS n_member,
        |  CAST(sum(pass) AS BIGINT) AS n_bloom_pass,
        |  CAST(sum(CASE WHEN pass = 1 AND member = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_false_pos,
        |  CAST(sum(CASE WHEN member = 1 AND pass = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_exact_missed,
        |  round(CAST(sum(CASE WHEN pass = 1 AND member = 0 THEN 1 ELSE 0
        |    END) AS DOUBLE)
        |    / nullif(count(*) - sum(member), 0), 4) AS fp_rate
        |FROM pe GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) {
      (s, dir) =>
      // bounded (distinct active custkeys) and read TWICE (bit build +
      // membership flag) — checkpoint so the orders scan runs once
      val act = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("date") &&
          col("o_orderdate") < lit("1995-04-01").cast("date"))
        .select(col("o_custkey").cast("string").as("key")).distinct()
        .localCheckpoint(true)
      val occ = act.select(coords("key", 3, 2048).as("rc"))
        .select(col("rc.cell").as("pos")).distinct()
        .withColumn("hit", lit(1L))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_custkey").cast("string").as("key"))
      val pd = cust
        .select(col("c_custkey"), col("c_mktsegment"), col("key"),
          coords("key", 3, 2048).as("rc"))
        .select(col("c_custkey"), col("c_mktsegment"), col("key"),
          col("rc.cell").as("pos"))
        .dropDuplicates("c_custkey", "pos")
        .join(broadcast(occ), Seq("pos"), "left")
        .groupBy("c_custkey", "c_mktsegment", "key")
        .agg(count(lit(1)).as("npos"),
          sum(coalesce(col("hit"), lit(0L))).as("nhit"))
      pd.join(broadcast(act.withColumn("member0", lit(1))), Seq("key"), "left")
        .select(col("c_custkey"), col("c_mktsegment"),
          (col("npos") === col("nhit")).cast("int").as("pass"),
          when(col("member0").isNotNull, 1).otherwise(0).as("member"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_probe"),
          sum("member").cast("long").as("n_member"),
          sum("pass").cast("long").as("n_bloom_pass"),
          sum(when(col("pass") === 1 && col("member") === 0, 1)
            .otherwise(0)).cast("long").as("n_false_pos"),
          sum(when(col("member") === 1 && col("pass") === 0, 1)
            .otherwise(0)).cast("long").as("n_exact_missed"),
          round(sum(when(col("pass") === 1 && col("member") === 0, 1)
            .otherwise(0)).cast("double")
            / nullif_(count(lit(1)) - sum("member")), 4).as("fp_rate"))
        .orderBy("c_mktsegment")
    },

    // ---- q203: KMV (theta) sketch set-overlap estimates -----------------
    // The sketch HLL cannot provide: SET-INTERSECTION estimates. KMV
    // (k minimum hash values, Bar-Yossef et al. 2002 / the theta-sketch
    // construction) keeps the k=256 smallest 60-bit hashes per set —
    // here the distinct part baskets of each market segment — built
    // with this engine's own TopKPerKey operator (partial per-partition
    // bounded heaps → exchange carries only partial winners → final
    // merge: the sketch build IS the custom physical operator's
    // partial/final shape). Pairwise: the union sketch is the k
    // smallest of the two sketches' union; tau = its k-th value gives
    // |union| ~= (k-1)·2^60/tau, and the fraction of union-sketch
    // members present in BOTH sets estimates Jaccard — intersection =
    // the product. Sub-k sets degrade to EXACT (the sketch is the
    // set). Exact counts sit beside the estimates; everything to the
    // final divisions is integer, replayed verbatim by the oracle's
    // row_number form.
    Q("q203_kmv_overlap",
      """WITH base AS (SELECT DISTINCT c.c_mktsegment AS seg,
        |        l.l_partkey AS pk
        |      FROM customer c
        |      JOIN orders o ON o.o_custkey = c.c_custkey
        |      JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |h AS (SELECT DISTINCT seg,
        |        ('0x' || substr(md5(CAST(pk AS VARCHAR)), 1, 15))::BIGINT
        |          AS h FROM base),
        |sk AS (SELECT seg, h FROM (
        |        SELECT seg, h,
        |          row_number() OVER (PARTITION BY seg ORDER BY h) AS rn
        |        FROM h) WHERE rn <= 256),
        |segs AS (SELECT DISTINCT seg FROM base),
        |pairs AS (SELECT a.seg AS seg_a, b.seg AS seg_b
        |          FROM segs a JOIN segs b ON a.seg < b.seg),
        |pr AS (SELECT p.seg_a, p.seg_b, s.h, s.seg
        |       FROM pairs p JOIN sk s
        |         ON s.seg = p.seg_a OR s.seg = p.seg_b),
        |uh AS (SELECT seg_a, seg_b, h, count(DISTINCT seg) AS nseg
        |       FROM pr GROUP BY 1, 2, 3),
        |ur AS (SELECT seg_a, seg_b, h, nseg,
        |        row_number() OVER (PARTITION BY seg_a, seg_b
        |          ORDER BY h) AS rn FROM uh),
        |topu AS (SELECT seg_a, seg_b, max(h) AS tau,
        |        sum(CASE WHEN nseg = 2 THEN 1 ELSE 0 END) AS x,
        |        count(*) AS ku
        |      FROM ur WHERE rn <= 256 GROUP BY 1, 2),
        |eb AS (SELECT p.seg_a, p.seg_b, b.pk,
        |        count(DISTINCT b.seg) AS nseg
        |      FROM pairs p JOIN base b
        |        ON b.seg = p.seg_a OR b.seg = p.seg_b
        |      GROUP BY 1, 2, 3),
        |ex AS (SELECT seg_a, seg_b, count(*) AS n_union,
        |        sum(CASE WHEN nseg = 2 THEN 1 ELSE 0 END) AS n_inter
        |      FROM eb GROUP BY 1, 2),
        |est AS (SELECT t.seg_a, t.seg_b,
        |        CASE WHEN t.ku < 256 THEN CAST(t.ku AS DOUBLE)
        |             ELSE 255.0 * 1152921504606846976.0 / t.tau
        |        END AS union_est,
        |        CAST(t.x AS DOUBLE) / t.ku AS jacc_est
        |      FROM topu t)
        |SELECT e.seg_a, e.seg_b, CAST(x.n_union AS BIGINT) AS n_union,
        |  CAST(x.n_inter AS BIGINT) AS n_inter,
        |  round(CAST(x.n_inter AS DOUBLE) / x.n_union, 4) AS jacc_exact,
        |  round(e.union_est, 4) AS union_est,
        |  round(e.jacc_est * e.union_est, 4) AS inter_est,
        |  round(e.jacc_est, 4) AS jacc_est
        |FROM est e JOIN ex x
        |  ON x.seg_a = e.seg_a AND x.seg_b = e.seg_b
        |ORDER BY e.seg_a, e.seg_b""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
        .join(t(s, dir, "orders").select("o_custkey", "o_orderkey"),
          col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("seg"), col("l_partkey").as("pk"))
        .distinct()
        // bounded (≤ segments × distinct parts) and read by THREE
        // consumers (sketch build, segment list, exact reference) —
        // checkpoint so the customer⋈orders⋈lineitem chain runs once
        .localCheckpoint(true)
      val hashed = base
        .select(col("seg"), expr(h60("CAST(pk AS STRING)")).as("h"))
        .distinct()
      val sk = graft.plans.TopK.perKey(
        hashed, Seq("seg"), col("h"), 256, ascending = true)
      val pairs = base.select("seg").distinct().as("a")
        .join(base.select("seg").distinct().as("b"),
          col("a.seg") < col("b.seg"))
        .select(col("a.seg").as("seg_a"), col("b.seg").as("seg_b"))
      val member = pairs.select(col("seg_a"), col("seg_b"),
        explode(array(col("seg_a"), col("seg_b"))).as("seg"))
      val uh = member.join(sk, "seg")
        .groupBy("seg_a", "seg_b", "h")
        .agg(countDistinct("seg").as("nseg"))
      val topu = graft.plans.TopK.perKey(
          uh, Seq("seg_a", "seg_b"), col("h"), 256, ascending = true)
        .groupBy("seg_a", "seg_b")
        .agg(max("h").as("tau"),
          sum(when(col("nseg") === 2, 1L).otherwise(0L)).as("x"),
          count(lit(1)).as("ku"))
      // exact leg by inclusion-exclusion: |A∪B| = |A| + |B| − |A∩B|,
      // with the intersection from ONE pk equi-self-join (≤ segments
      // rows per pk) — replaces the member-explode + two countDistinct
      // aggregations over a pair-multiplied copy of base. Same values:
      // the old n_union counted distinct pk in either segment, the old
      // n_inter counted pk present in both.
      val sizes = base.groupBy("seg").agg(count(lit(1)).as("sz"))
      val inter = base.as("x")
        .join(base.as("y"),
          col("x.pk") === col("y.pk") && col("x.seg") < col("y.seg"))
        .groupBy(col("x.seg").as("seg_a"), col("y.seg").as("seg_b"))
        .agg(count(lit(1)).as("n_inter"))
      val ex = pairs
        .join(inter, Seq("seg_a", "seg_b"), "left")
        .join(broadcast(sizes.select(col("seg").as("seg_a"), col("sz").as("sa"))),
          "seg_a")
        .join(broadcast(sizes.select(col("seg").as("seg_b"), col("sz").as("sb"))),
          "seg_b")
        .select(col("seg_a"), col("seg_b"),
          (col("sa") + col("sb") - coalesce(col("n_inter"), lit(0L)))
            .as("n_union"),
          coalesce(col("n_inter"), lit(0L)).as("n_inter"))
      topu
        .withColumn("union_est",
          when(col("ku") < 256, col("ku").cast("double"))
            .otherwise(lit(255.0) * lit(1152921504606846976.0) / col("tau")))
        .withColumn("jacc_est", col("x").cast("double") / col("ku"))
        .join(ex, Seq("seg_a", "seg_b"))
        .select(col("seg_a"), col("seg_b"), col("n_union"), col("n_inter"),
          round(col("n_inter").cast("double") / col("n_union"), 4)
            .as("jacc_exact"),
          round(col("union_est"), 4).as("union_est"),
          round(col("jacc_est") * col("union_est"), 4).as("inter_est"),
          round(col("jacc_est"), 4).as("jacc_est"))
        .orderBy("seg_a", "seg_b")
    },

    // ---- q217: HDR-histogram quantile sketch ----------------------------
    // The MERGEABLE quantile estimator next to the exact machinery
    // (q123/q129 narrowing): HdrHistogram-style buckets — values below
    // 2^8 exact, above that truncated to 8 significand bits (bucket =
    // value with everything under the top 8 bits zeroed), giving a
    // guaranteed <1/128 relative error. The sketch is COUNTS PER
    // BUCKET, so Spark's partial aggregation IS the merge and only
    // ~2.4k (flag, bucket) rows ever cross the exchange — at 100 TB
    // the estimate costs ONE map-side-combined pass, vs the exact
    // narrowing's log_B(domain) passes; this query reports est vs
    // exact per (flag, quantile) so the error budget is measured, not
    // assumed. Integer-exact everywhere: the bucket transform is
    // bit-shift arithmetic, the rank is a decimal-exact ceil, and the
    // estimator returns the bucket LOWER BOUND (always ≤ exact).
    Q("q217_hdr_quantile_sketch",
      """WITH v AS (SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem),
        |bk AS (SELECT g, c,
        |    (c >> greatest(length(bin(c)) - 8, 0))
        |      << greatest(length(bin(c)) - 8, 0) AS bucket FROM v),
        |sk AS (SELECT g, bucket, CAST(count(*) AS BIGINT) AS cnt
        |       FROM bk GROUP BY 1, 2),
        |nb AS (SELECT g, CAST(count(*) AS BIGINT) AS n_buckets,
        |    CAST(sum(cnt) AS BIGINT) AS n FROM sk GROUP BY g),
        |cum AS (SELECT g, bucket,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY bucket) AS cum FROM sk),
        |p AS (SELECT CAST(p AS DECIMAL(4, 2)) AS p
        |      FROM (VALUES (0.50), (0.90), (0.99)) t(p)),
        |k AS (SELECT nb.g, nb.n_buckets, p.p,
        |    CAST(ceil(p.p * nb.n) AS BIGINT) AS k FROM nb, p),
        |est AS (SELECT k.g, k.p, k.k, k.n_buckets,
        |    min(cum.bucket) AS est_c
        |  FROM k JOIN cum ON cum.g = k.g AND cum.cum >= k.k
        |  GROUP BY 1, 2, 3, 4),
        |r AS (SELECT g, c, row_number() OVER (PARTITION BY g ORDER BY c)
        |    AS rn FROM v)
        |SELECT est.g AS l_returnflag, CAST(est.p AS DOUBLE) AS p,
        |  est.k AS k, est.n_buckets, est.est_c, r.c AS exact_c,
        |  round((r.c - est.est_c) / CAST(r.c AS DOUBLE), 6) AS rel_err
        |FROM est JOIN r ON r.g = est.g AND r.rn = est.k
        |ORDER BY l_returnflag, p""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // ONE pinned (g, c) projection feeds both legs — the sketch build
      // and the exact narrowing's stats + histogram passes — instead of
      // each leg re-scanning (and re-spreading) the source
      val li = ExactQuantile.pin(
        Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag").as("g"),
            round(col("l_extendedprice") * 100, 0).cast("long").as("c")),
        Seq("g", "c"))
      // the sketch: one map-side-combinable aggregate; the shift keeps
      // the top 8 significand bits (values < 256 are exact)
      val sk = li
        .withColumn("bucket", expr(
          "shiftleft(shiftright(c, greatest(length(bin(c)) - 8, 0)), " +
            "greatest(length(bin(c)) - 8, 0))"))
        .groupBy("g", "bucket").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true) // bounded sketch frame, reread 3×
      val nb = sk.groupBy("g").agg(count(lit(1)).as("n_buckets"),
        sum("cnt").as("n"))
      val ns = nb.collect() // bounded: one row per return flag
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val ps = Seq("0.50", "0.90", "0.99").map(BigDecimal(_))
      val ks = for ((g, (_, n)) <- ns; p <- ps) yield
        (g, p.toString) ->
          (p * n).setScale(0, BigDecimal.RoundingMode.CEILING).toLong
      val kdf = broadcast(ks.toSeq.map { case ((g, p), k) =>
        (g, p.toDouble, k, ns(g)._1)
      }.toDF("g", "p", "k", "n_buckets"))
      val cum = sk.withColumn("cum", sum("cnt").over(
        Window.partitionBy("g").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val est = kdf.join(cum, Seq("g"))
        .filter(col("cum") >= col("k"))
        .groupBy("g", "p", "k", "n_buckets")
        .agg(min("bucket").as("est_c"))
      val exact = ExactQuantile.kthSmallestByGroup(li, "g", "c", ks)
      val xdf = broadcast(exact.toSeq.map { case ((g, p), v) =>
        (g, p.toDouble, v)
      }.toDF("g", "p", "exact_c"))
      est.join(xdf, Seq("g", "p"))
        .select(col("g").as("l_returnflag"), col("p"), col("k"),
          col("n_buckets"), col("est_c"), col("exact_c"),
          round((col("exact_c") - col("est_c")).cast("double") /
            col("exact_c"), 6).as("rel_err"))
        .orderBy("l_returnflag", "p")
    },

    // ---- q221: join-size estimation by Count-Min dot product ------------
    // The cardinality estimate a 100 TB planner wants BEFORE paying a
    // shuffle join: |A ⋈_k B| = Σ_k c_A(k)·c_B(k) (the equi-join row
    // count), estimated as min over the d salted rows of the dot
    // product of the two sides' CMS cell vectors — an overestimate-only
    // bound (AMS/CM sketch inner product), computed from two ≤2048-cell
    // summaries instead of either fact table. Each side's sketch is the
    // q197 build (coordinate explode + one map-side-combinable hash
    // aggregate); the dot product joins two bounded cell frames. The
    // report: per event type, the EXACT join size next to the sketch
    // estimate and the overestimate ratio — integer arithmetic
    // throughout, one rounded ratio at the end.
    Q("q221_join_size_sketch",
      """WITH ek AS (SELECT event_type, CAST(user_id AS VARCHAR) AS key
        |           FROM events),
        |ok AS (SELECT CAST(o_custkey AS VARCHAR) AS key FROM orders),
        |ec AS (SELECT event_type, r.i,
        |        ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || key),
        |          1, 15))::BIGINT % 4096 AS cell,
        |        CAST(count(*) AS BIGINT) AS c
        |      FROM ek CROSS JOIN range(4) r(i) GROUP BY 1, 2, 3),
        |oc AS (SELECT r.i,
        |        ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || key),
        |          1, 15))::BIGINT % 4096 AS cell,
        |        CAST(count(*) AS BIGINT) AS c
        |      FROM ok CROSS JOIN range(4) r(i) GROUP BY 1, 2),
        |dot AS (SELECT ec.event_type, ec.i,
        |        CAST(sum(ec.c * oc.c) AS BIGINT) AS dp
        |      FROM ec JOIN oc ON oc.i = ec.i AND oc.cell = ec.cell
        |      GROUP BY 1, 2),
        |est AS (SELECT event_type, min(dp) AS est_rows FROM dot GROUP BY 1),
        |en AS (SELECT event_type, key, CAST(count(*) AS BIGINT) AS c
        |       FROM ek GROUP BY 1, 2),
        |onn AS (SELECT key, CAST(count(*) AS BIGINT) AS c FROM ok GROUP BY 1),
        |ex AS (SELECT en.event_type,
        |        CAST(sum(en.c * onn.c) AS BIGINT) AS exact_rows
        |      FROM en JOIN onn USING (key) GROUP BY 1)
        |SELECT ex.event_type, ex.exact_rows,
        |  CAST(est.est_rows AS BIGINT) AS est_rows,
        |  round(est.est_rows / CAST(ex.exact_rows AS DOUBLE), 4) AS ratio
        |FROM ex JOIN est USING (event_type)
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ek = t(s, dir, "events")
        .select(col("event_type"), col("user_id").cast("string").as("key"))
      val ok = t(s, dir, "orders")
        .select(col("o_custkey").cast("string").as("key"))
      // ONE scan per side: the per-key counts (needed by the exact leg
      // anyway, bounded by the key domain) are checkpointed and the CMS
      // cell vectors derive from them as sum(cnt) per coordinate — the
      // same cells as count(*) over exploded fact rows, but each
      // DISTINCT key hashes once instead of every row
      val en = ek.groupBy("event_type", "key").agg(count(lit(1)).as("cn"))
        .localCheckpoint(true)
      val onn = ok.groupBy("key").agg(count(lit(1)).as("cn2"))
        .localCheckpoint(true)
      val ec = en.select(col("event_type"), coords("key", 4, 4096).as("rc"),
          col("cn"))
        .select(col("event_type"), col("rc.i").as("i"),
          col("rc.cell").as("cell"), col("cn"))
        .groupBy("event_type", "i", "cell").agg(sum("cn").as("ce"))
      val oc = onn.select(coords("key", 4, 4096).as("rc"), col("cn2"))
        .select(col("rc.i").as("i"), col("rc.cell").as("cell"), col("cn2"))
        .groupBy("i", "cell").agg(sum("cn2").as("co"))
      val est = ec.join(broadcast(oc), Seq("i", "cell"))
        .groupBy("event_type", "i")
        .agg(sum(col("ce") * col("co")).as("dp"))
        .groupBy("event_type").agg(min("dp").as("est_rows"))
      val ex = en.join(onn, "key")
        .groupBy("event_type").agg(sum(col("cn") * col("cn2")).as("exact_rows"))
      ex.join(est, "event_type")
        .select(col("event_type"), col("exact_rows"), col("est_rows"),
          round(col("est_rows").cast("double") / col("exact_rows"), 4)
            .as("ratio"))
        .orderBy("event_type")
    },

    // ---- q224: sliding-window quantiles by HDR bucket merge -------------
    // The q202 pattern for QUANTILES: per-month HDR bucket counts are
    // built once, exploded to the ≤3 trailing windows they serve, and
    // merged by plain count ADDITION (the sketch's merge operator) —
    // trailing-90-day p50/p90 price percentiles with NO re-scan of the
    // fact table per window and no per-window sort. Rank targets are
    // pure integer ceilings (ceil(n/2) = (n+1) div 2, ceil(9n/10) =
    // (9n+9) div 10), the estimate is the bucket lower bound — this
    // query is integer end-to-end, not even a final rounding. The
    // monthly sketch frame is ~2.6k rows; windows only ever touch it.
    Q("q224_hdr_sliding_quantiles",
      """WITH mrows AS (SELECT
        |        CAST(date_trunc('month', l_shipdate) AS DATE) AS mon,
        |        CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |      FROM lineitem),
        |months AS (SELECT DISTINCT mon FROM mrows),
        |mk AS (SELECT mon,
        |        (c >> greatest(length(bin(c)) - 8, 0))
        |          << greatest(length(bin(c)) - 8, 0) AS bucket,
        |        CAST(count(*) AS BIGINT) AS cnt
        |      FROM mrows GROUP BY 1, 2),
        |sp AS (SELECT CAST(mk.mon + to_months(CAST(r.i AS INT)) AS DATE)
        |          AS mon, bucket, cnt
        |       FROM mk CROSS JOIN range(3) r(i)),
        |wk AS (SELECT sp.mon, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
        |       FROM sp JOIN months mm ON mm.mon = sp.mon GROUP BY 1, 2),
        |nw AS (SELECT mon, CAST(sum(cnt) AS BIGINT) AS n,
        |        CAST(count(*) AS BIGINT) AS n_buckets FROM wk GROUP BY 1),
        |cum AS (SELECT mon, bucket,
        |        sum(cnt) OVER (PARTITION BY mon ORDER BY bucket) AS cum
        |      FROM wk),
        |k AS (SELECT mon, n, n_buckets,
        |        (n + 1) // 2 AS k50, (9 * n + 9) // 10 AS k90 FROM nw),
        |est AS (SELECT k.mon, k.n, k.n_buckets,
        |        min(CASE WHEN cum.cum >= k.k50 THEN cum.bucket END) AS p50_c,
        |        min(CASE WHEN cum.cum >= k.k90 THEN cum.bucket END) AS p90_c
        |      FROM k JOIN cum ON cum.mon = k.mon
        |      GROUP BY 1, 2, 3)
        |SELECT mon, n, n_buckets, CAST(p50_c AS BIGINT) AS p50_c,
        |  CAST(p90_c AS BIGINT) AS p90_c
        |FROM est ORDER BY mon""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val mrows = t(s, dir, "lineitem").select(
        to_date(date_trunc("month", col("l_shipdate"))).as("mon"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("c"))
      // bounded (months × buckets); checkpointed because the month list
      // derives from it — every month with rows owns ≥1 bucket, so
      // DISTINCT mon over the sketch frame equals DISTINCT mon over the
      // fact table and the lineitem scan runs ONCE for this query
      val mk = mrows
        .withColumn("bucket", expr(
          "shiftleft(shiftright(c, greatest(length(bin(c)) - 8, 0)), " +
            "greatest(length(bin(c)) - 8, 0))"))
        .groupBy("mon", "bucket").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val months = mk.select("mon").distinct()
      val wk = mk
        .select(col("mon"), col("bucket"), col("cnt"),
          explode(array(lit(0), lit(1), lit(2))).as("i"))
        .select(add_months(col("mon"), col("i")).as("mon"),
          col("bucket"), col("cnt"))
        .join(broadcast(months), "mon")
        .groupBy("mon", "bucket").agg(sum("cnt").as("cnt"))
        .localCheckpoint(true) // bounded sketch frame, read 2×
      val nw = wk.groupBy("mon").agg(sum("cnt").as("n"),
        count(lit(1)).as("n_buckets"))
      val cum = wk.withColumn("cum", sum("cnt").over(
        Window.partitionBy("mon").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val k = nw.select(col("mon"), col("n"), col("n_buckets"),
        expr("(n + 1) div 2").as("k50"), expr("(9 * n + 9) div 10").as("k90"))
      broadcast(k).join(cum, "mon")
        .groupBy("mon", "n", "n_buckets")
        .agg(min(when(col("cum") >= col("k50"), col("bucket"))).as("p50_c"),
          min(when(col("cum") >= col("k90"), col("bucket"))).as("p90_c"))
        .orderBy("mon")
    }
  )

  /** nullif(x, 0) — guards the rate division when every probe is a
    * member. */
  private def nullif_(c: Column): Column =
    when(c === 0, lit(null)).otherwise(c)
}
