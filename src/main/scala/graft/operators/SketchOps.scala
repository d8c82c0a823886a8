package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Mergeable-sketch operators (SURVEY.md §9): Spark's Datasketches HLL
  * builtins. The point at 100 TB: per-day sketches are small, stored,
  * and UNIONED — "distinct users this quarter" reads 90 sketch rows
  * instead of rescanning a quarter of raw events. Spark-first: all
  * builtins, no custom code needed.
  */
object SketchOps {

  /** Per-day HLL sketches of the user population. */
  def dailyUserSketches(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("user_sketch"),
           count(lit(1)).as("n_events"))

  /** The Datasketches estimate path (daily sketches → union → overall
    * estimate, next to the exact answer): spec-pinned in
    * ChunkSketchSpec — the binary sketch image and its estimate are
    * engine-specific, so they stay OUT of the oracle gate. */
  def hllUsersEstimate(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val merged = dailyUserSketches(ev)
      .agg(hll_sketch_estimate(hll_union_agg(col("user_sketch"))).as("approx_users"),
           count(lit(1)).as("n_days"))
    val exact = ev.agg(countDistinct(col("user_id")).as("exact_users"))
    merged.crossJoin(exact)
  }

  /** §2.11 registered query — ORACLE-BACKED since round 15 (round-14
    * verdict item 1): the same per-day-sketch → merge architecture,
    * but surfaced through the deterministic register aggregate
    * ([[graft.plans.HllRegistersAgg]]) whose (reg_sum, n_filled)
    * integer image a SQL replay reproduces bit-for-bit — per day plus
    * the merged 'ALL' row (register max-merge, the stored-delta-state
    * posture), each next to the exact distinct count. The Datasketches
    * estimate stays on [[hllUsersEstimate]]/ChunkSketchSpec. */
  def hllUsersQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType}
    import graft.plans.HllRegistersAgg
    val ev = Tables.events(s, d).select(
      date_format(col("ts"), "yyyy-MM-dd").as("day"),
      col("user_id").cast(StringType).as("item"))
    val daily = ev.groupBy(col("day"))
      .agg(HllRegistersAgg.hll_registers(col("item"), HllP).as("regs"),
           countDistinct(col("item")).as("exact_users"))
    val exploded = daily
      .select(col("day"), posexplode(col("regs")).as(Seq("bucket", "reg")))
      .select(col("day"), col("bucket").cast(LongType).as("bucket"),
        col("reg").cast(LongType).as("reg"))
    def summarize(df: DataFrame) = df.groupBy(col("day"))
      .agg(sum(col("reg")).as("reg_sum"),
           sum(when(col("reg") > 0, 1L).otherwise(0L)).as("n_filled"))
    val dailyRows = summarize(exploded)
      .join(daily.select(col("day"), col("exact_users")), Seq("day"))
    val mergedRows = summarize(
        exploded.groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
          .withColumn("day", lit("ALL")))
      .crossJoin(ev.agg(countDistinct(col("item")).as("exact_users")))
    dailyRows.unionByName(mergedRows)
      .select(col("day"), col("reg_sum"), col("n_filled"), col("exact_users"))
      .orderBy(col("day"))
  }

  /** §2.11 — count-min estimates vs exact counts for the top-20 tokens.
    * Width 16 over a larger vocabulary FORCES collisions: the estimates
    * genuinely overcount, and the oracle replays the overcounts exactly
    * (the sketch is deterministic, collisions included). */
  def cmsTokensQ(s: SparkSession, d: String): DataFrame = {
    import graft.plans.CountMinAgg
    val toks = Tables.documents(s, d)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
    val sketch = toks.agg(CountMinAgg.count_min(col("t"), CmsD, CmsW).as("sk"))
    toks.groupBy(col("t")).agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .withColumn("est", CountMinAgg.estimate(col("sk"), col("t"), CmsD, CmsW))
      .select(col("t").as("token"), col("est"), col("exact"))
      .orderBy(col("exact").desc, col("token"))
      .limit(20)
  }

  private val CmsD = 4
  private val CmsW = 16

  /** §2.12 — deterministic HLL registers (SURVEY.md §2 row 140): per-day
    * user-population sketches whose REGISTER STATE is the oracle
    * contract, plus the 'ALL' row produced by merging the daily rows
    * with a plain relational max — the stored-sketch-state posture
    * (a quarter of distinct-user questions reads 90 register rows, not
    * a quarter of raw events). The estimate stays spec-only (HllSpec);
    * the registers are exact. */
  def hllRegistersQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType}
    import graft.plans.HllRegistersAgg
    val ev = Tables.events(s, d).select(
      date_format(col("ts"), "yyyy-MM-dd").as("day"),
      col("user_id").cast(StringType).as("item"))
    val daily = ev.groupBy(col("day"))
      .agg(HllRegistersAgg.hll_registers(col("item"), HllP).as("regs"))
    val exploded = daily
      .select(col("day"), posexplode(col("regs")).as(Seq("bucket", "reg")))
      .select(col("day"), col("bucket").cast(LongType).as("bucket"),
        col("reg").cast(LongType).as("reg"))
    val merged = exploded.groupBy(col("bucket"))
      .agg(max(col("reg")).as("reg"))
      .select(lit("ALL").as("day"), col("bucket"), col("reg"))
    exploded.unionByName(merged).orderBy(col("day"), col("bucket"))
  }

  private val HllP = 6 // m = 64 registers

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hll_users"     -> (hllUsersQ _),
    "q_cms_tokens"    -> (cmsTokensQ _),
    "q_hll_registers" -> (hllRegistersQ _),
  )

  /** HUGEINT replay of the whole sketch: per-row domain-prefixed
    * poly-hash buckets over the distinct vocabulary, bucket sums, min
    * over rows — insert and probe share the hash stream by
    * construction. */
  val oracles: Map[String, String] = Map(
    "q_cms_tokens" -> {
      // the id column must not be named `t` — polyHashSql aliases its
      // prefixed string internally as t and the names would collide
      val hashRows = (0 until CmsD).map { r =>
        s"SELECT $r AS r, tok, h FROM (${TrainingOps.polyHashSql(s"cms$r|", "(SELECT DISTINCT tok FROM toks)", "tok")}) _h$r"
      }.mkString("\n  UNION ALL ")
      s"""WITH toks AS (
         |  SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS tok FROM documents),
         |tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact FROM toks GROUP BY tok),
         |hs AS (
         |  $hashRows),
         |bk AS (SELECT r, tok, ((h % $CmsW) + $CmsW) % $CmsW AS b FROM hs),
         |cell AS (SELECT bk.r, bk.b, sum(tc.exact) AS s
         |         FROM bk JOIN tc USING (tok) GROUP BY bk.r, bk.b),
         |est AS (SELECT bk.tok, CAST(min(cell.s) AS BIGINT) AS est
         |        FROM bk JOIN cell ON bk.r = cell.r AND bk.b = cell.b GROUP BY bk.tok)
         |SELECT tc.tok AS token, est.est AS est, tc.exact AS exact
         |FROM tc JOIN est ON tc.tok = est.tok
         |ORDER BY exact DESC, token LIMIT 20""".stripMargin
    },

    // Register-level HLL replay: splitmix-finished poly-hash per
    // DISTINCT item (registers depend only on the distinct set — the
    // dedup bounds the HUGEINT hash work), bucket = floor-mod low
    // bits, rho = trailing-zero rank via the lowest-set-bit identity
    // bit_count((w & -w) - 1) + 1, then GROUP BY bucket MAX(rho).
    // The 'ALL' row replays the merge as max over the daily rows —
    // the same relational form the Spark side uses.
    // the register-image summary gate (round 15): the q_hll_registers
    // bucket/rho fragment collapsed to per-day (reg_sum, n_filled)
    // plus the max-merged 'ALL' row, each with the exact count
    "q_hll_users" -> {
      val m = 1 << HllP
      val rhoCap = 64 - HllP + 1
      s"""WITH items AS (
         |  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day,
         |    CAST(user_id AS VARCHAR) AS item FROM events),
         |iv AS (SELECT DISTINCT item FROM items),
         |hs AS (${TrainingOps.polyHashSql("hll|", "iv", "item")}),
         |hr AS (
         |  SELECT item, CAST(((h % $m) + $m) % $m AS BIGINT) AS bucket,
         |    CAST(CASE WHEN w = 0 THEN $rhoCap
         |         ELSE bit_count((w & (-w)) - 1) + 1 END AS BIGINT) AS rho
         |  FROM (
         |    SELECT item, h, CAST(
         |      (CASE WHEN h < 0 THEN CAST(h AS HUGEINT) + 18446744073709551616
         |            ELSE CAST(h AS HUGEINT) END) // $m AS BIGINT) AS w
         |    FROM hs) _w),
         |dreg AS (
         |  SELECT i.day, r.bucket, MAX(r.rho) AS reg
         |  FROM items i JOIN hr r USING (item) GROUP BY 1, 2),
         |dsum AS (
         |  SELECT day, CAST(SUM(reg) AS BIGINT) AS reg_sum,
         |    CAST(COUNT(*) AS BIGINT) AS n_filled
         |  FROM dreg GROUP BY day),
         |dx AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS exact_users
         |       FROM items GROUP BY day),
         |areg AS (SELECT bucket, MAX(reg) AS reg FROM dreg GROUP BY bucket),
         |arow AS (
         |  SELECT 'ALL' AS day, CAST(SUM(reg) AS BIGINT) AS reg_sum,
         |    CAST(COUNT(*) AS BIGINT) AS n_filled,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM iv) AS exact_users
         |  FROM areg)
         |SELECT day, reg_sum, n_filled, exact_users FROM (
         |  SELECT d.day, d.reg_sum, d.n_filled, x.exact_users
         |  FROM dsum d JOIN dx x USING (day)
         |  UNION ALL SELECT * FROM arow) u
         |ORDER BY day""".stripMargin
    },

    "q_hll_registers" -> {
      // derived from HllP, not re-typed: engine and oracle must move
      // together if the register count ever changes
      val m = 1 << HllP
      val rhoCap = 64 - HllP + 1
      s"""WITH items AS (
         |  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day,
         |    CAST(user_id AS VARCHAR) AS item FROM events),
         |iv AS (SELECT DISTINCT item FROM items),
         |hs AS (${TrainingOps.polyHashSql("hll|", "iv", "item")}),
         |hr AS (
         |  SELECT item, CAST(((h % $m) + $m) % $m AS BIGINT) AS bucket,
         |    CAST(CASE WHEN w = 0 THEN $rhoCap
         |         ELSE bit_count((w & (-w)) - 1) + 1 END AS BIGINT) AS rho
         |  FROM (
         |    SELECT item, h, CAST(
         |      (CASE WHEN h < 0 THEN CAST(h AS HUGEINT) + 18446744073709551616
         |            ELSE CAST(h AS HUGEINT) END) // $m AS BIGINT) AS w
         |    FROM hs) _w),
         |dreg AS (
         |  SELECT i.day, r.bucket, MAX(r.rho) AS reg
         |  FROM items i JOIN hr r USING (item) GROUP BY 1, 2),
         |days AS (SELECT DISTINCT day FROM items),
         |grid AS (SELECT d.day, CAST(b.b AS BIGINT) AS bucket
         |         FROM days d CROSS JOIN (SELECT unnest(range(0, $m)) AS b) b),
         |daily AS (
         |  SELECT g.day, g.bucket, COALESCE(dr.reg, 0) AS reg
         |  FROM grid g LEFT JOIN dreg dr ON g.day = dr.day AND g.bucket = dr.bucket),
         |allr AS (SELECT 'ALL' AS day, bucket, MAX(reg) AS reg FROM daily GROUP BY 2)
         |SELECT day, bucket, CAST(reg AS BIGINT) AS reg
         |FROM (SELECT * FROM daily UNION ALL SELECT * FROM allr) u
         |ORDER BY day, bucket""".stripMargin
    },
  )
}
