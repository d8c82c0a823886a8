package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Data-profiling and time-series statistics: the validation/QA stages
  * of an ETL pipeline (the reference hard-errors on schema drift and
  * duplicate days — these operators quantify a dataset before load).
  *
  * Scale posture: q_profile is ONE aggregation pass over the table
  * (all per-column stats as parallel agg expressions + an unpivot of
  * the single result row); histogram/time-weighted/forward-fill are
  * single-shuffle grouped or windowed shapes on their natural keys.
  */
object Profiling {

  /** q_profile — long-format per-column profile of `events`: row/null/
    * distinct counts, numeric min/max for numeric columns, lexicographic
    * min/max for strings. One scan, exact distincts. */
  def profileQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val agged = ev.agg(
      count(lit(1)).as("n"),
      count(col("event_id")).as("nn1"), countDistinct(col("event_id")).as("nd1"),
      min(col("event_id")).cast(DoubleType).as("mn1"), max(col("event_id")).cast(DoubleType).as("mx1"),
      count(col("user_id")).as("nn2"), countDistinct(col("user_id")).as("nd2"),
      min(col("user_id")).cast(DoubleType).as("mn2"), max(col("user_id")).cast(DoubleType).as("mx2"),
      count(col("value")).as("nn3"), countDistinct(col("value")).as("nd3"),
      min(col("value")).as("mn3"), max(col("value")).as("mx3"),
      count(col("event_type")).as("nn4"), countDistinct(col("event_type")).as("nd4"),
      min(col("event_type")).as("mns4"), max(col("event_type")).as("mxs4"))
    agged.selectExpr(
      """stack(4,
        |  'event_id',  n, n - nn1, nd1, mn1, mx1, CAST(NULL AS STRING), CAST(NULL AS STRING),
        |  'user_id',   n, n - nn2, nd2, mn2, mx2, CAST(NULL AS STRING), CAST(NULL AS STRING),
        |  'value',     n, n - nn3, nd3, mn3, mx3, CAST(NULL AS STRING), CAST(NULL AS STRING),
        |  'event_type', n, n - nn4, nd4, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mns4, mxs4
        |) AS (column_name, n_rows, n_null, n_distinct, min_num, max_num, min_str, max_str)""".stripMargin)
      .orderBy(col("column_name"))
  }

  /** Class-balance / diversity audit (SURVEY.md §2 row 198) — the
    * dataset-card composition table: per categorical dimension the
    * class count, majority and minority classes, and the exact Gini
    * impurity as the integer fraction (n² − Σnᵢ²)/n² — whose
    * complement's inverse n²/Σnᵢ² is the inverse-Simpson "effective
    * number of classes", the standard diversity index (a corpus that
    * is 95% one language has ~1.1 effective languages no matter how
    * many it nominally contains; mixture weights and sampling
    * temperatures are chosen off exactly this table). Entropy is
    * deliberately NOT emitted — ln is not cross-engine-replayable
    * (the row-91 trade); Gini/Simpson carry the same ordering for
    * balance decisions and stay integer-exact. NULL is a CLASS (the
    * kanon posture — "field missing" is itself observable to a
    * sampler), folded to the '__null__' sentinel in both engines.
    * Majority ties break to the LARGEST value, minority ties to the
    * SMALLEST (max/min struct order, total-order deterministic).
    *
    * Scale shape (100 TB): ONE explode melts the fixed dimension
    * list, one map-side-combined (dim, value) count (value-domain-
    * bounded), one |dims|-row final aggregate with struct argmax/
    * argmin — no windows, no joins. OVERFLOW: Σnᵢ² needs n < ~3e9
    * per class; beyond that, pre-bucket the dimension. */
  def classBalance(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension")
    val melted = df.select(explode(array(dims.map(d =>
        struct(lit(d).as("dim"),
          coalesce(col(d).cast(StringType), lit("__null__")).as("value"))): _*)).as("dv"))
      .select(col("dv.dim").as("dim"), col("dv.value").as("value"))
    melted.groupBy(col("dim"), col("value")).agg(count(lit(1)).as("c"))
      .groupBy(col("dim"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("k"),
        max(struct(col("c"), col("value"))).as("maj"),
        min(struct(col("c"), col("value"))).as("mnr"),
        sum(col("c") * col("c")).as("sq"))
      .select(col("dim"), col("n"), col("k"),
        col("maj.value").as("majority_value"), col("maj.c").as("majority_n"),
        col("mnr.value").as("minority_value"), col("mnr.c").as("minority_n"),
        (col("n") * col("n") - col("sq")).as("gini_num"),
        (col("n") * col("n")).as("gini_den"))
  }

  /** §2 row 198 — composition of documents over lang and source. */
  def balanceQ(s: SparkSession, d: String): DataFrame =
    classBalance(Tables.documents(s, d), Seq("lang", "source"))
      .orderBy(col("dim"))

  /** Join fan-out pre-flight (SURVEY.md §2 row 200) — the EXACT output
    * size of an equi-join computed WITHOUT executing it: |A ⋈ B| =
    * Σ_k cnt_A(k)·cnt_B(k), the companion to row 185's partition-skew
    * audit (that one asks "do rows balance over buckets?", this one
    * "does the join EXPLODE, and on which keys?"). At 100 TB the
    * difference between a 1e9-row and a 1e13-row join output is
    * discovered here in one aggregation pass per side, not three
    * hours into the shuffle it stalls — and the per-key products name
    * the celebrity keys that need salting, pre-aggregation, or a
    * different join key altogether. Both count frames are key-domain-
    * bounded; ONLY THEY are joined (inner — a key absent from either
    * side contributes zero rows; NULL keys never match in an equi-join
    * and are excluded by contract). Output: the top-k exploding keys
    * plus a '__total__' row (Σ matched counts and the exact output
    * size). The top-k rank window rides the matched-key-bounded
    * frame, never the data. OVERFLOW: Σ products < 2^63 — an audit
    * reporting its own overflow would be useless; products are per-key
    * long multiplications (document cnt_A·cnt_B < 2^63 per key). */
  def joinFanout(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
                 topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val ca = a.filter(aKey.isNotNull)
      .groupBy(aKey.cast(StringType).as("key")).agg(count(lit(1)).as("n_left"))
    val cb = b.filter(bKey.isNotNull)
      .groupBy(bKey.cast(StringType).as("key")).agg(count(lit(1)).as("n_right"))
    val j = ca.join(cb, Seq("key"))
      .withColumn("n_out", col("n_left") * col("n_right"))
    // top-k via orderBy+limit — Spark plans TakeOrderedAndProject
    // (per-partition heaps + a k-row driver merge), never a global
    // sort or a single-task rank window over the matched-key frame
    val top = j.orderBy(col("n_out").desc, col("key")).limit(topK)
      .select(col("key"), col("n_left"), col("n_right"), col("n_out"))
    val total = j.agg(coalesce(sum(col("n_left")), lit(0L)).as("n_left"),
        coalesce(sum(col("n_right")), lit(0L)).as("n_right"),
        coalesce(sum(col("n_out")), lit(0L)).as("n_out"))
      .select(lit("__total__").as("key"), col("n_left"), col("n_right"),
        col("n_out"))
    top.unionByName(total)
  }

  /** §2 row 200 — fan-out of the events-to-events self-join on
    * user_id (the sessionization pair blow-up pre-flight). */
  def joinFanoutQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    joinFanout(ev, col("user_id"), ev, col("user_id"), topK = 10)
      .orderBy(col("n_out").desc, col("key"))
  }

  /** Exact equi-depth histogram (SURVEY.md §2 row 201) — the
    * database-statistics companion to q_histogram's equi-WIDTH bins:
    * equal-ROW-COUNT buckets are what optimizers and range-partition
    * planners actually need (equi-width tells you nothing useful on a
    * skewed column — one bin holds 90% of rows). NOT a quantile
    * sketch: boundaries are exact, by the lower-quantile rule the
    * weighted-median row established. Each distinct value v is
    * assigned wholly to bucket floor((cum(v)−1)·B / n) where cum(v)
    * is the inclusive cumulative row count at v in value order — a
    * heavy value can inflate its bucket beyond n/B; equi-depth
    * CANNOT split a value across buckets, and the per-bucket counts
    * REPORT that distortion rather than hiding it (the classic
    * heavy-hitter caveat of equi-depth stats). NULLs hold no rank
    * and are excluded by contract.
    *
    * Scale shape (100 TB): the corpus collapses to ONE map-side-
    * combined distinct-value count frame; the cumulative window and
    * the total both ride that value-bounded frame (never the rows);
    * one bucket groupBy ends it. */
  def equiDepthHistogram(df: DataFrame, valCol: Column, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(valCol.isNotNull)
      .groupBy(valCol.as("v")).agg(count(lit(1)).as("c"))
    val cum = counts.withColumn("cum", sum(col("c")).over(
      Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
    val total = counts.agg(coalesce(sum(col("c")), lit(0L)).as("n"))
    cum.crossJoin(broadcast(total))
      .withColumn("bucket",
        GraphOps.fdiv((col("cum") - 1L) * buckets, col("n")))
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        sum(col("c")).as("n_rows"), count(lit(1)).as("n_distinct"))
  }

  /** §2 row 201 — 10 equal-depth buckets over document lengths. */
  def equiDepthQ(s: SparkSession, d: String): DataFrame =
    equiDepthHistogram(Tables.documents(s, d), col("n_chars"), buckets = 10)
      .orderBy(col("bucket"))

  /** Exact per-group quantile bands (SURVEY.md §2 row 223) — p25/p50/
    * p75 (any cut list) per group by the LOWER-QUANTILE rule (row
    * 146's): value = min v with cum(v)·100 ≥ q·n, cross-multiplied so
    * no division exists on either wire. The per-group spread summary
    * q_profile's min/max can't give (max is one outlier; the IQR is
    * the distribution) — and exact, unlike the approx-sketch row 33k
    * deliberately is not: percentile_approx's error bound is a
    * parameter, this is the statistic itself. Empty groups cannot
    * occur (groups are defined by their rows); NULL values hold no
    * rank.
    *
    * Scale shape: the corpus collapses to the (group, value) count
    * frame; the cumulative window partitions per group over that
    * value-bounded frame; the cut list is a literal broadcast; the
    * min-qualifying pick is a groupBy-min over a frame bounded by
    * \|groups\|·\|values\|·\|cuts\| — never the rows. */
  def quantileBands(df: DataFrame, grpCol: Column, valCol: Column,
                    cuts: Seq[Int]): DataFrame = {
    require(cuts.nonEmpty && cuts.forall(c => c >= 1 && c <= 100),
      s"cuts must be percentages in [1,100], got $cuts")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.filter(valCol.isNotNull)
      .groupBy(grpCol.as("g"), valCol.as("v")).agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("g")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("g"))))
    val qs = cuts.map(_.toLong).toDF("q")
    cum.crossJoin(broadcast(qs))
      .filter(col("cum") * 100L >= col("q") * col("n"))
      .groupBy(col("g"), col("q"), col("n"))
      .agg(min(col("v")).as("value"))
      .select(col("g"), col("q"), col("value"), col("n"))
  }

  /** §2 row 223 — per-language length quartiles over documents. */
  def quantileBandsQ(s: SparkSession, d: String): DataFrame =
    quantileBands(Tables.documents(s, d), col("lang"), col("n_chars"),
        Seq(25, 50, 75))
      .orderBy(col("g"), col("q"))

  /** q_histogram — fixed-width value histogram (width 25). */
  def histogramQ(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(floor(col("value") / 25).cast(LongType).as("bin"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("bin_sum"))
      .withColumn("bin_lo", (col("bin") * 25).cast(DoubleType))
      .select(col("bin"), col("bin_lo"), col("n"), col("bin_sum"))
      .orderBy(col("bin"))

  /** q_time_weighted — per-user time-weighted mean value over an
    * irregular event series: each value holds until the next event
    * (right-open step function; the last event carries no weight).
    * Weights are integer MILLISECONDS: with ms weights the per-user
    * decimal sums stay under 2^53, so the decimal→double conversion is
    * exact in both engines (µs weights pushed sums past 2^53, where the
    * two engines' decimal→double roundings disagree in the last ulp). */
  def timeWeightedQ(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("t_us", unix_micros(col("ts")))
      .withColumn("dt_ms", expr("(lead(t_us, 1) over (partition by user_id order by ts, event_id) - t_us) div 1000"))
      .filter(col("dt_ms").isNotNull && col("dt_ms") > 0)
      .groupBy(col("user_id"))
      .agg(
        (sum(col("value").cast(DecimalType(12, 2)) * col("dt_ms")).cast(DoubleType) /
          sum(col("dt_ms")).cast(DoubleType)).as("tw_avg"),
        count(lit(1)).as("n_intervals"))
      .orderBy(col("user_id"))
  }

  /** q_forward_fill — daily per-user series on the full day grid with
    * gaps carried forward from the last observed day (null before the
    * first observation). The reference's combined_daily leaves gaps as
    * NULL; this is the imputation stage on top. */
  def forwardFillQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value"))
    val daily = ev.groupBy(col("user_id"), col("day"))
      .agg(sum(col("value").cast(DecimalType(12, 2))).as("dsum"))
    val days = ev.select(col("day")).distinct()
    val users = ev.select(col("user_id")).distinct()
    val grid = users.crossJoin(broadcast(days))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled_value", last(col("dsum"), ignoreNulls = true).over(w).cast(DoubleType))
      .withColumn("observed", col("dsum").isNotNull)
      .select(col("user_id"), col("day"), col("filled_value"), col("observed"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Robust (median/MAD) outlier flagging per group: a point is an
    * outlier when |x - median| > k * MAD (k = 4.4478 ≈ 3σ for normal
    * data via the 1.4826 consistency constant). Median/MAD, not
    * mean/stddev, so the flags don't move when the outliers themselves
    * get more extreme — the property that matters for data QA.
    *
    * Shape: two grouped exact percentiles + two broadcast joins of the
    * tiny per-group stats. Exact `percentile` holds one group's values
    * in its buffer (the q_median trade, accepted for oracle parity);
    * swap in `percentile_approx` at 100 TB where groups are huge. */
  def madOutliers(df: DataFrame, grpCol: String, valCol: String,
                  k: Double = 4.4478): DataFrame = {
    val med = df.groupBy(col(grpCol))
      .agg(expr(s"percentile($valCol, 0.5)").as("__med"))
    val dev = df.join(broadcast(med), Seq(grpCol))
      .withColumn("__dev", abs(col(valCol) - col("__med")))
    val mad = dev.groupBy(col(grpCol))
      .agg(expr("percentile(__dev, 0.5)").as("__mad"))
    dev.join(broadcast(mad), Seq(grpCol))
      .filter(col("__dev") > lit(k) * col("__mad"))
      .drop("__med", "__dev", "__mad")
  }

  /** §2.4+ — per-event-type robust outliers over the events values. */
  def outliersMadQ(s: SparkSession, d: String): DataFrame =
    madOutliers(
      Tables.events(s, d).select(col("event_id"), col("event_type"), col("value")),
      "event_type", "value")
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** Pairwise Pearson correlation of `cols` in ONE scan: every
    * Σx, Σx², Σxy accumulates as an exact DECIMAL (the inputs carry 2
    * decimal places, so sums are integers under the hood — map-side
    * partials, order-independent), and only the final closed-form
    * formula runs in double — so the result is bit-identical across
    * partitionings and runs, which a streaming `corr` aggregate can
    * never be. Cross-ENGINE portability has one genuine limit: once an
    * exact sum exceeds 2^53, decimal→double conversion itself is
    * engine-specific (Java rounds the exact decimal once; DuckDB's
    * int128→double then scale division rounds twice), so the last
    * couple of ulps differ — the emitted corr is therefore rounded to
    * 12 decimal places, which both engines agree on and which is far
    * below any statistical meaning. O(k²) accumulators; one aggregate
    * row total. */
  def corrPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got $cols")
    def d(c: String) = col(c).cast(DecimalType(12, 2))
    val sums =
      Seq(count(lit(1)).as("n")) ++
      cols.map(c => sum(d(c)).cast(DecimalType(38, 4)).as(s"s_$c")) ++
      (for (i <- cols.indices; j <- i until cols.size) yield {
        val (a, b) = (cols(i), cols(j))
        sum((d(a) * d(b)).cast(DecimalType(38, 4))).as(s"p_${a}__$b")
      })
    val agg = df.agg(sums.head, sums.tail: _*)
    val pairRows = for (i <- cols.indices; j <- (i + 1) until cols.size) yield {
      val (a, b) = (cols(i), cols(j))
      // identical formula text on the oracle side — same op order,
      // IEEE-rounded ops => bit-identical doubles
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        expr(s"""round((cast(n as double) * cast(p_${a}__$b as double)
                 | - cast(s_$a as double) * cast(s_$b as double))
                 | / sqrt((cast(n as double) * cast(p_${a}__$a as double)
                 |          - cast(s_$a as double) * cast(s_$a as double))
                 |        * (cast(n as double) * cast(p_${b}__$b as double)
                 |           - cast(s_$b as double) * cast(s_$b as double))), 12)""".stripMargin)
          .as("corr"))
    }
    agg.select(explode(array(pairRows: _*)).as("r"))
      .select(col("r.col_x"), col("r.col_y"), col("r.corr"))
  }

  /** §2.4+ — lineitem numeric correlation matrix. */
  def corrMatrixQ(s: SparkSession, d: String): DataFrame =
    corrPairs(Tables.lineitem(s, d),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy(col("col_x"), col("col_y"))

  /** Exact weighted median (SURVEY.md §2 row 146) — the lower weighted
    * median: smallest v with cumulative weight ≥ half the total
    * (2·cumw ≥ W in integers — no halves, no doubles). The summary
    * corpus reports need when documents should count by SIZE, not per
    * head: an unweighted median token count over many tiny docs hides
    * where the bytes actually live.
    *
    * Scale shape: ONE map-side-combined aggregation to the (group,
    * value) frame — the tie-order hazard of a row-level cumsum is
    * gone because equal values collapse before the window — then
    * windows over the value-DISTINCT series per group (bounded by the
    * value domain, not the corpus), then a grouped min. All integer,
    * replayed verbatim. */
  def weightedMedian(df: DataFrame, grpCol: Column, valCol: Column,
                     wCol: Column): DataFrame = {
    val d = df.groupBy(grpCol.as("__g"), valCol.cast(LongType).as("__v"))
      .agg(sum(wCol.cast(LongType)).as("__w"))
    val cum = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = Window.partitionBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    d.withColumn("__cw", sum(col("__w")).over(cum))
      .withColumn("__tw", sum(col("__w")).over(full))
      .filter(col("__cw") * 2 >= col("__tw"))
      .groupBy(col("__g"), col("__tw"))
      .agg(min(col("__v")).as("w_median"))
      .select(col("__g"), col("w_median"), col("__tw").as("total_w"))
  }

  /** Exact per-group winsorization report (SURVEY.md §2 row 153) —
    * the robust-scaling companion to the MAD outlier flag: clamp a
    * value distribution at its exact lower/upper percentiles and
    * report, per group, the bounds, how much mass was clamped on each
    * side, and the clamped sum — the numbers a feature-normalization
    * or payout-capping stage needs, all integers so parity is
    * hash-exact. Quantile rule is the weightedMedian lower-quantile
    * generalization: q_p = smallest v with cum_count·100 ≥ p·n.
    *
    * Scale shape: raw rows are touched ONCE — the (group, value)
    * aggregation with map-side combine; every later step (cumsum,
    * bounds, clamp, collapse) rides the value-DISTINCT frame, bounded
    * by the value domain, not the corpus. Bounds are chained
    * conditional MINs over the same whole-partition window — no
    * self-join, no broadcast, zero exchanges after the first; the
    * final groupBy groups on the window's partition key and reuses it.
    */
  def winsorize(df: DataFrame, grpCol: Column, valCol: Column,
                pLo: Int, pHi: Int): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 100,
      s"need 0 <= pLo < pHi <= 100, got ($pLo, $pHi)")
    val d = df.groupBy(grpCol.as("__g"), valCol.cast(LongType).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cum = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = Window.partitionBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    d.withColumn("__cw", sum(col("__c")).over(cum))
      .withColumn("__n", sum(col("__c")).over(full))
      .withColumn("lo",
        min(when(col("__cw") * 100 >= col("__n") * pLo, col("__v"))).over(full))
      .withColumn("hi",
        min(when(col("__cw") * 100 >= col("__n") * pHi, col("__v"))).over(full))
      .groupBy(col("__g"), col("__n").as("n"), col("lo"), col("hi"))
      .agg(
        sum(when(col("__v") < col("lo"), col("__c")).otherwise(0L)).as("n_lo"),
        sum(when(col("__v") > col("hi"), col("__c")).otherwise(0L)).as("n_hi"),
        sum(col("__c") *
          greatest(col("lo"), least(col("hi"), col("__v")))).as("sum_wins"))
  }

  /** §2.12 — per-event-type 5/95% winsorization of `value` in exact
    * cents (value is 2-decimal by construction; DECIMAL(12,2)·100 is
    * the lossless integer image). */
  def winsorizeQ(s: SparkSession, d: String): DataFrame =
    winsorize(Tables.events(s, d), col("event_type"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast(LongType), 5, 95)
      .withColumnRenamed("__g", "event_type")
      .orderBy(col("event_type"))

  /** Approximate functional-dependency audit (SURVEY.md §2 row 157) —
    * the DISCOVERED-rule complement to the declarative DQ gate (row
    * 150): for a candidate dependency X→Y, report per determinant
    * value the majority dependent, its support, and the exact integer
    * confidence — "source determines language at 93%; these rows are
    * the exceptions" is how real-world rules live (exact FDs are rare
    * in dirty data; the audit quantifies HOW approximate). The
    * violating rows (off-majority) are the repair/quarantine work
    * list, obtainable by an equi-join of the data against this frame
    * on (det, majority).
    *
    * Scale shape: one map-side-combined aggregation of rows to the
    * (det, dep) frame; majority pick and per-det totals are windows
    * over that value-pair-bounded frame partitioned by det; no data
    * join-back inside the audit. Ties on count break on the smaller
    * dependent value so the report is deterministic. */
  def fdAudit(df: DataFrame, detCol: String, depCol: String): DataFrame = {
    val d = df.groupBy(col(detCol).as("det"), col(depCol).as("dep"))
      .agg(count(lit(1)).as("__c"))
    val wDet = Window.partitionBy(col("det"))
    val pick = Window.partitionBy(col("det"))
      .orderBy(col("__c").desc, col("dep"))
    d.withColumn("n", sum(col("__c")).over(wDet))
      .withColumn("__rk", row_number().over(pick))
      .filter(col("__rk") === 1)
      .select(col("det"), col("dep").as("dep_major"), col("n"),
        col("__c").as("n_major"),
        GraphOps.fdiv(lit(100L) * col("__c"), col("n")).as("conf_pct"))
  }

  /** §2.12 — does `source` determine `lang` over documents? */
  def fdAuditQ(s: SparkSession, d: String): DataFrame =
    fdAudit(Tables.documents(s, d), "source", "lang")
      .withColumnRenamed("det", "source")
      .orderBy(col("source"))

  /** §2.12 — per-language char-weighted median token count. */
  def weightedMedianQ(s: SparkSession, d: String): DataFrame =
    weightedMedian(Tables.documents(s, d), col("lang"),
      graft.functions.TextFunctions.tokenCount(col("text")), col("n_chars"))
      .withColumnRenamed("__g", "lang")
      .orderBy(col("lang"))

  /** Per-group OLS trend (SURVEY.md §2 row 147) — slope/intercept of y
    * on x from the closed form, the "is this metric drifting and how
    * fast" companion to the CUSUM alarm (row 137 says WHEN something
    * shifted; this says the RATE). One aggregation pass: n, Σx, Σy,
    * Σxy, Σx² accumulate as EXACT decimals (map-side partials,
    * order-independent), and only the final formula runs in double —
    * identical formula text both engines, slope rounded to 6 decimals,
    * and the intercept computed FROM the rounded slope so both engines
    * feed identical inputs. SIX decimals, not corrPairs' 12: the
    * intercept's magnitude is data-scaled (~1e4 here), and a round
    * grid at 1e-12 sits ON the double's ulp at that magnitude — the
    * two engines' round implementations (decimal-expansion vs
    * float-multiply) then legitimately disagree by one ulp on
    * boundary values (observed once at sf0.001). corrPairs keeps 12
    * because correlations are ≤1 in magnitude, four orders above
    * their ulp. */
  def trendPerGroup(df: DataFrame, grpCol: Column, xCol: Column,
                    yCol: Column): DataFrame = {
    val D0 = DecimalType(18, 0)
    val d = df.select(grpCol.as("__g"), xCol.cast(LongType).as("__x"),
      yCol.cast(DecimalType(12, 2)).as("__y"))
    d.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast(DecimalType(38, 0))).as("sx"),
        sum(col("__y").cast(DecimalType(38, 4))).as("sy"),
        sum((col("__x").cast(D0) * col("__y")).cast(DecimalType(38, 4))).as("sxy"),
        sum((col("__x").cast(D0) * col("__x").cast(D0)).cast(DecimalType(38, 0))).as("sxx"))
      .withColumn("slope",
        expr("""round((cast(n as double) * cast(sxy as double)
               | - cast(sx as double) * cast(sy as double))
               | / (cast(n as double) * cast(sxx as double)
               |    - cast(sx as double) * cast(sx as double)), 6)""".stripMargin))
      .withColumn("intercept",
        expr("""round((cast(sy as double) - slope * cast(sx as double))
               | / cast(n as double), 6)""".stripMargin))
      .select(col("__g"), col("n"), col("slope"), col("intercept"))
  }

  /** §2.12 — per-event-type value trend over wall-clock hours. */
  def trendQ(s: SparkSession, d: String): DataFrame =
    trendPerGroup(Tables.events(s, d), col("event_type"),
      expr("unix_micros(ts) div 3600000000"), col("value"))
      .withColumnRenamed("__g", "event_type")
      .orderBy(col("event_type"))

  /** §2.11 — order-independent dataset fingerprint: the reproducibility
    * checksum shard validation and cross-engine dataset equality audits
    * need. Each row hashes with the domain-prefixed poly-hash over its
    * canonical representation (length-prefixed fields — `v<len>:<val>`,
    * NULL → `n` — so boundaries and NULLs are unambiguous for ANY
    * value bytes, sentinels included), and the
    * dataset value is the mod-2^64 SUM of row hashes — commutative, so
    * it is independent of row order, partitioning and merge order, and
    * any single-row change flips it with overwhelming probability.
    * The sum accumulates in decimal(38,0) (≤ 9.3e31 at 1e13 rows —
    * no overflow, ANSI-safe) and reports the signed 64-bit image.
    * Caller contract: provide string/integer columns (float→string
    * rendering is engine-specific). Grouped form = one aggregation on
    * the group key — per-shard checksums in a single pass. */
  def datasetFingerprint(df: DataFrame, cols: Seq[Column],
                         groupCols: Seq[Column] = Nil): DataFrame = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    // self-delimiting field encoding: v<charlen>:<value>, NULL -> n —
    // no separator/sentinel byte can be forged by a value ("ab","c")
    // vs ("a","bc") and NULL vs any literal all stay distinct
    val repr = concat(
      lit("row") +: cols.map { c =>
        val cs = c.cast(StringType)
        when(cs.isNull, lit("n"))
          .otherwise(concat(lit("v"), length(cs).cast(StringType), lit(":"), cs))
      }: _*)
    val h = graft.plans.PolyHash64.poly_hash64(repr).cast(DecimalType(38, 0))
    val two64 = lit(BigDecimal("18446744073709551616")).cast(DecimalType(38, 0))
    val two63 = lit(BigDecimal("9223372036854775808")).cast(DecimalType(38, 0))
    val base = df.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_rows"), sum(h).as("__s"))
    base.withColumn("__m", pmod(col("__s"), two64))
      .withColumn("checksum",
        when(col("__m") >= two63, col("__m") - two64).otherwise(col("__m"))
          .cast(LongType))
      .drop("__s", "__m")
  }

  /** §2.11 — CUSUM change-point detection over a per-group daily
    * series: the standard drift monitor for ingest volumes / corpus
    * stats. Both one-sided sums, S⁺ₜ = max(0, S⁺ₜ₋₁ + xₜ − target) and
    * S⁻ₜ = max(0, S⁻ₜ₋₁ + target − xₜ), with target = floor(mean) —
    * all INTEGER, so they replay exactly cross-engine. The recurrence
    * is evaluated through the prefix-sum identity
    *   S⁺ₜ = Pₜ − min(0, min_{j≤t} Pⱼ),   Pₜ = Σ (xⱼ − target),
    * (and S⁻ₜ = −Pₜ + max(0, max_{j≤t} Pⱼ)) — pure WINDOW functions,
    * no sequential fold: codegen-friendly in Spark, and immune to the
    * DuckDB list_reduce struct-field evaluation-order quirk a direct
    * fold replay hits. Alarm = first day S⁺ exceeds the target (one
    * full day's worth of accumulated upward drift), NULL if never.
    *
    * Scale shape: the corpus-scale work is the daily aggregation the
    * caller already did; the windows partition per group over the DAY
    * series (bounded by the calendar span), then one grouped max. */
  def cusumDrift(daily: DataFrame, groupCol: Column, dayCol: Column,
                 xCol: Column): DataFrame = {
    // pre-aggregate to one row per (group, day): duplicate day rows
    // would otherwise make the ROWS-framed prefix sum order-dependent
    val d = daily
      .groupBy(groupCol.as("__g"), dayCol.as("__d"))
      .agg(sum(xCol.cast(LongType)).as("__x"))
    // per-group floor(mean) as a whole-partition window — ONE pass over
    // the day series, no second evaluation of the caller's aggregation
    val full = Window.partitionBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val w = Window.partitionBy(col("__g")).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("__target",
        GraphOps.fdiv(sum(col("__x")).over(full), count(lit(1)).over(full)))
      .withColumn("__p", sum(col("__x") - col("__target")).over(w))
      .withColumn("__sp", col("__p") - least(lit(0L), min(col("__p")).over(w)))
      .withColumn("__sd", -col("__p") + greatest(lit(0L), max(col("__p")).over(w)))
      .groupBy(col("__g"), col("__target"))
      // alarm threshold floors at 0: S+ is non-negative, so a negative
      // target must not fire on a perfectly stable series
      .agg(max(col("__sp")).as("max_up"),
        max(col("__sd")).as("max_down"),
        min(when(col("__sp") > greatest(col("__target"), lit(0L)), col("__d")))
          .as("alarm_day"))
      .select(col("__g"), col("__target").as("target"),
        col("max_up"), col("max_down"), col("alarm_day"))
  }

  /** §2.11 — drift monitor over daily event volumes per type. */
  def driftCusumQ(s: SparkSession, d: String): DataFrame =
    cusumDrift(
      Tables.events(s, d)
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("x")),
      col("event_type"), col("day"), col("x"))
      .withColumnRenamed("__g", "event_type")
      .orderBy(col("event_type"))

  /** Partition-skew audit (SURVEY.md §2 row 185) — the pre-flight
    * check before `repartition(key)`/bucketed writes at 100 TB: how
    * would the rows ACTUALLY balance over `buckets` hash partitions,
    * and is any bucket dominated by a single celebrity key? A skewed
    * key that would straggle a shuffle is found here, on one cheap
    * aggregation pass, instead of three hours into the join it
    * stalls — the report that decides between plain repartitioning,
    * salting, and AQE skew handling. Per bucket: row count, distinct
    * keys, total weight (bytes proxy), and the heaviest key with its
    * row count ("one key = the whole bucket" is the salting signal).
    *
    * Uses the replayable poly_hash64 (domain-prefixed "skew|") rather
    * than Spark's internal shuffle hash: the audit's point is the
    * SHAPE of a key distribution under A fixed hash — any mixing hash
    * gives the same diagnosis, and this one both engines can compute.
    *
    * Scale shape: one (bucket, key) aggregation with map-side combine
    * (output bounded by distinct keys), one bucket-level rollup
    * (bounded by `buckets`); the heaviest-key pick is the
    * max(struct(rows, key)) aggregation argmax — no window. */
  def partitionSkewAudit(df: DataFrame, keyCol: Column, weightCol: Column,
                         buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val keyed = df.select(keyCol.cast(StringType).as("k"),
        coalesce(weightCol.cast(LongType), lit(0L)).as("w"))
      .withColumn("bucket", pmod(graft.plans.PolyHash64.poly_hash64(
        concat(lit("skew|"), col("k"))), lit(buckets.toLong)))
    keyed.groupBy(col("bucket"), col("k"))
      .agg(count(lit(1)).as("nr"), sum(col("w")).as("tw"))
      .groupBy(col("bucket"))
      .agg(sum(col("nr")).as("n_rows"), count(lit(1)).as("n_keys"),
        sum(col("tw")).as("tot_w"),
        max(struct(col("nr"), col("k"))).as("m"))
      .select(col("bucket"), col("n_rows"), col("n_keys"), col("tot_w"),
        col("m.k").as("top_key"), col("m.nr").as("top_key_rows"))
  }

  /** §2 row 185 — events keyed by user_id into 32 buckets, weighted by
    * payload bytes. */
  def skewAuditQ(s: SparkSession, d: String): DataFrame =
    partitionSkewAudit(Tables.events(s, d), col("user_id"),
        length(col("props")), buckets = 32)
      .orderBy(col("bucket"))

  /** Token-distribution drift between two corpus snapshots (SURVEY.md
    * §2 row 182) — the DISTRIBUTION-level companion to row 144's
    * doc-level version diff and row 148's time-series CUSUM: two
    * snapshots can share zero documents yet be statistically
    * identical, or share 95% of documents while the remaining 5%
    * shifts the vocabulary (a spam influx, a new template, a language
    * mix change). Per token, the 2-proportion chi-square contribution
    *   χ²(t) = (c1·N2 − c2·N1)² / (N1·N2·(c1+c2))
    * — the per-token term of the classic homogeneity test; Σ over
    * tokens is the corpus statistic, the per-token ranking is the
    * "what drifted" answer.
    *
    * Exactness: c1·N2 − c2·N1 is computed in BIGINT (the kappa
    * overflow contract: count·N < 2^63 ⇒ N under ~3e9 tokens per
    * snapshot; pre-scale counts beyond — χ² ratios are scale-free up
    * to the common factor), then ONE cast to double and three pinned
    * single-op divisions — both engines evaluate the identical IEEE
    * sequence (the BM25 pinned-shape rule), so the doubles replay
    * bit-exactly. `minCount` floors c1+c2: rare-token cells below a
    * chi-square's validity threshold are noise, and at 100 TB the
    * filter also bounds output by the frequent vocabulary.
    *
    * Scale shape: ONE map-side-combined (token, snapshot) groupBy over
    * both snapshots read as a single pass (the snapshot tag is a
    * projection), pivoted to (c1, c2) in the same aggregation; totals
    * are a 1-row broadcast (watermark-scalar posture). No windows, no
    * joins beyond the broadcast. */
  def tokenDrift(docs: DataFrame, snapCol: Column, textCol: Column,
                 minCount: Long = 10L): DataFrame = {
    val tok = docs.select(snapCol.cast(LongType).as("snap"),
      explode(regexp_extract_all(lower(textCol), lit("[a-z0-9]+"), lit(0)))
        .as("token"))
    val tc = tok.groupBy(col("token"))
      .agg(coalesce(sum(when(col("snap") === 0L, 1L)), lit(0L)).as("c1"),
        coalesce(sum(when(col("snap") =!= 0L, 1L)), lit(0L)).as("c2"))
    val tot = tc.agg(coalesce(sum(col("c1")), lit(0L)).as("n1"),
      coalesce(sum(col("c2")), lit(0L)).as("n2"))
    tc.filter(col("c1") + col("c2") >= minCount)
      .crossJoin(broadcast(tot))
      .withColumn("d", (col("c1") * col("n2") - col("c2") * col("n1"))
        .cast(DoubleType))
      .select(col("token"), col("c1"), col("c2"),
        (col("d") * col("d") / col("n1").cast(DoubleType)
          / col("n2").cast(DoubleType)
          / (col("c1") + col("c2")).cast(DoubleType)).as("chi2"))
  }

  /** Categorical independence audit (SURVEY.md §2 row 205) — the
    * chi-square contingency test between two categorical columns, the
    * GENERAL-independence companion to row 182's two-snapshot
    * homogeneity: "is source independent of language?" decides whether
    * per-source quotas implicitly skew the language mixture (and any
    * other pair of stratification keys that secretly co-vary — the
    * classic sampling confounder). Per cell of the FULL row-domain ×
    * col-domain cross product (an absent combination is o = 0 and
    * still contributes — omitting it biases the statistic):
    *   term = (o·n − r·c)² / (n·r·c)
    * with the difference in BIGINT (o·n < 2^63 ⇒ n < ~3e9, the kappa
    * contract), then ONE cast and three pinned single divisions — the
    * row-182 recipe, doubles replay bit-exactly. Per-CELL terms only,
    * no Σχ² row: summing doubles across cells is reduction-order-
    * dependent; the reader sums display-side (df = (R−1)(C−1)). NULL
    * is a class ('__null__', the row-198 posture).
    *
    * Scale shape: ONE map-side-combined (a, b) cell count; marginals
    * and the total are aggregations of that cell frame (domain-
    * bounded); the cross product joins two marginal BROADCASTS. The
    * corpus is read once. */
  def independenceAudit(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.select(
      coalesce(col(aCol).cast(StringType), lit("__null__")).as("a"),
      coalesce(col(bCol).cast(StringType), lit("__null__")).as("b"))
    val cells = base.groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val rows = cells.groupBy(col("a")).agg(sum(col("o")).as("row_n"))
    val cols = cells.groupBy(col("b")).agg(sum(col("o")).as("col_n"))
    val tot = cells.agg(coalesce(sum(col("o")), lit(0L)).as("n"))
    broadcast(rows).crossJoin(broadcast(cols))
      .join(cells, Seq("a", "b"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("d", (col("o") * col("n") - col("row_n") * col("col_n"))
        .cast(DoubleType))
      .select(col("a"), col("b"), col("o"), col("row_n"), col("col_n"), col("n"),
        (col("d") * col("d") / col("n").cast(DoubleType)
          / col("row_n").cast(DoubleType)
          / col("col_n").cast(DoubleType)).as("term"))
  }

  /** §2 row 205 — is document source independent of language? */
  def independenceQ(s: SparkSession, d: String): DataFrame =
    independenceAudit(Tables.documents(s, d), "lang", "source")
      .orderBy(col("a"), col("b"))

  /** §2 row 182 — drift between the even- and odd-doc_id snapshot
    * halves (the version-diff split convention), minCount 10. */
  def tokenDriftQ(s: SparkSession, d: String): DataFrame =
    tokenDrift(Tables.documents(s, d), pmod(col("doc_id"), lit(2)),
        col("text"), minCount = 10L)
      .orderBy(col("token"))

  /** Corpus version diff (SURVEY.md §2 row 144) — the incremental twin
    * of [[datasetFingerprint]]: given two snapshots of a keyed corpus,
    * classify every id as added / removed / changed / unchanged. The
    * comparison moves CONTENT FINGERPRINTS, not text: each side
    * projects (id, poly_hash64("vdiff|" || text)) and the diff is one
    * full-outer equi-join on the id — at 100 TB the join ships 16
    * bytes/doc instead of documents, and when both snapshots persist a
    * fingerprint column (the row-134 posture) the diff reads no text
    * at all. Downstream incremental processing consumes the added ∪
    * changed ids as its work list.
    *
    * Collision caveat: only the SAME id's two versions are ever
    * compared, so a hash collision can only mask a changed doc as
    * unchanged — probability ≈ n·2⁻⁶⁴ over the whole corpus (no
    * birthday quadratic; contrast the cross-doc grouping cases where
    * we group by the string itself). The oracle replays the same
    * fingerprints, collisions included. */
  def versionDiff(v1: DataFrame, v2: DataFrame,
                  idCol: String, textCol: String): DataFrame = {
    // presence markers, not fingerprint nullness, decide added/removed:
    // a NULL text hashes to a NULL fingerprint, which must read as "a
    // present doc with NULL content" (null-safe-equal to another NULL
    // text), never as an absent row
    def fp(df: DataFrame, out: String, mark: String): DataFrame =
      df.select(col(idCol).cast(LongType).as("doc_id"),
        graft.plans.PolyHash64.poly_hash64(
          concat(lit("vdiff|"), col(textCol))).as(out),
        lit(true).as(mark))
    fp(v1, "fp_a", "in_a")
      .join(fp(v2, "fp_b", "in_b"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("in_a").isNull, "added")
          .when(col("in_b").isNull, "removed")
          .when(col("fp_a") <=> col("fp_b"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** §2.12 — diff `documents` against a deterministically derived
    * second snapshot (remove doc_id%23=0, edit text at %17=0, add
    * re-keyed copies of %29=0): every status class is exercised. */
  def versionDiffQ(s: SparkSession, d: String): DataFrame = {
    val v1 = Tables.documents(s, d)
    val v2 = v1.filter(pmod(col("doc_id"), lit(23)) =!= 0)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(17)) === 0,
          concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
      .unionByName(v1.filter(pmod(col("doc_id"), lit(29)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000000L)))
    versionDiff(v1, v2, "doc_id", "text").orderBy(col("doc_id"))
  }

  /** §2.11 — per-source shard checksums over `documents`. */
  def datasetHashQ(s: SparkSession, d: String): DataFrame =
    datasetFingerprint(Tables.documents(s, d),
        Seq(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text")),
        groupCols = Seq(col("source")))
      .orderBy(col("source"))

  /** Gini coefficient of a non-negative value column (SURVEY.md §2
    * row 291) — the concentration audit a data-mix owner reads next
    * to row-133's skyline and row-215's frequency spectrum: "how
    * unequal is token/byte mass across documents (or domains)?" —
    * G near 0 = uniform corpus, near 1 = a few giants carry it.
    *
    * Exact rational image, ONE pass on the shared bucketed-prefix
    * engine ([[Prefix.cumSumBucketed]] — no corpus-sized single-task
    * window): with values ascending and S_j the inclusive prefix sum,
    * Σ i·x_i = (n+1)·Σx − Σ_j S_j (swap the summation order), so
    * gini_num = 2·Σ i·x_i − (n+1)·Σx = (n+1)·Σx − 2·Σ_j S_j and
    * gini_den = n·Σx — BIGINTs, plus the floor-div ppm. Rank ties
    * are harmless (permuting equal values leaves Σ i·x_i unchanged),
    * so the statistic is deterministic under any tie order. OVERFLOW
    * CONTRACT: n²·mean(x) < 2⁶³ — beyond ~10⁸ rows of 1e3-token docs,
    * de-scale x (Gini is scale-invariant) or sample. */
  def gini(df: DataFrame, valueCol: Column, tieCol: Column): DataFrame = {
    val base = df.select(valueCol.cast(LongType).as("__v"),
        tieCol.as("__t"))
      .filter(col("__v").isNotNull && col("__v") >= 0L)
    val cum = Prefix.cumSumBucketed(base, "__v", descending = false,
      tieCols = Seq("__t"), valueCol = "__v", out = "__cs")
    cum.agg(count(lit(1)).as("n"),
        coalesce(sum(col("__v")), lit(0L)).as("total"),
        coalesce(sum(col("__cs")), lit(0L)).as("__ss"))
      .select(col("n"), col("total"),
        ((col("n") + 1L) * col("total") - col("__ss") * 2L).as("gini_num"),
        (col("n") * col("total")).as("gini_den"))
      .withColumn("gini_ppm", when(col("gini_den") === 0L, lit(null))
        .otherwise(GraphOps.fdiv(col("gini_num") * 1000000L, col("gini_den"))))
  }

  /** §2 row 291 — character-mass concentration across documents. */
  def giniQ(s: SparkSession, d: String): DataFrame =
    gini(Tables.documents(s, d), col("n_chars"), col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_drift_cusum"   -> (driftCusumQ _),
    "q_token_drift"   -> (tokenDriftQ _),
    "q_skew_audit"    -> (skewAuditQ _),
    "q_dataset_hash"  -> (datasetHashQ _),
    "q_version_diff"  -> (versionDiffQ _),
    "q_weighted_median" -> (weightedMedianQ _),
    "q_winsorize"     -> (winsorizeQ _),
    "q_fd_audit"      -> (fdAuditQ _),
    "q_trend"         -> (trendQ _),
    "q_profile"       -> (profileQ _),
    "q_histogram"     -> (histogramQ _),
    "q_time_weighted" -> (timeWeightedQ _),
    "q_forward_fill"  -> (forwardFillQ _),
    "q_outliers_mad"  -> (outliersMadQ _),
    "q_corr_matrix"   -> (corrMatrixQ _),
    "q_balance_audit" -> (balanceQ _),
    "q_join_fanout"   -> (joinFanoutQ _),
    "q_equidepth"     -> (equiDepthQ _),
    "q_independence"  -> (independenceQ _),
    "q_quantile_bands" -> (quantileBandsQ _),
    "q_gini"          -> (giniQ _),
  )

  val oracles: Map[String, String] = Map(
    // one global inclusive prefix window (integer sums reassociate, so
    // it equals the engine's bucketed decomposition bit-for-bit), then
    // the swapped-summation Gini identity
    "q_gini" ->
      """WITH v AS (
        |  SELECT CAST(n_chars AS BIGINT) AS x, doc_id FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars >= 0),
        |c AS (
        |  SELECT x, SUM(x) OVER (ORDER BY x, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        |  FROM v),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COALESCE(SUM(x), 0) AS BIGINT) AS total,
        |    CAST(COALESCE(SUM(cs), 0) AS BIGINT) AS ss
        |  FROM c)
        |SELECT n, total,
        |  (n + 1) * total - ss * 2 AS gini_num,
        |  n * total AS gini_den,
        |  CASE WHEN n * total = 0 THEN NULL
        |       ELSE (((n + 1) * total - ss * 2) * 1000000) // (n * total)
        |  END AS gini_ppm
        |FROM a""".stripMargin,

    // (group, value) counts, per-group inclusive cumsum, the VALUES
    // cut list and the cross-multiplied min-qualifying pick
    "q_quantile_bands" ->
      """WITH counts AS (
        |  SELECT lang AS g, CAST(n_chars AS BIGINT) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, v, c,
        |    CAST(SUM(c) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM counts),
        |qs(q) AS (VALUES (CAST(25 AS BIGINT)), (CAST(50 AS BIGINT)), (CAST(75 AS BIGINT)))
        |SELECT g, q, CAST(MIN(v) AS BIGINT) AS value, n
        |FROM cum CROSS JOIN qs
        |WHERE cum * 100 >= q * n
        |GROUP BY g, q, n
        |ORDER BY g, q""".stripMargin,

    // the same '__null__' fold, cell counts, marginals from the cell
    // frame, the full cross product LEFT-joined to observed cells,
    // BIGINT difference then one cast + three pinned divisions in the
    // identical order (n, row, col) — the row-182 bit-exact recipe
    "q_independence" ->
      """WITH base AS (
        |  SELECT COALESCE(lang, '__null__') AS a,
        |    COALESCE(source, '__null__') AS b
        |  FROM documents),
        |cells AS (
        |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o FROM base GROUP BY a, b),
        |rws AS (SELECT a, CAST(SUM(o) AS BIGINT) AS row_n FROM cells GROUP BY a),
        |cls AS (SELECT b, CAST(SUM(o) AS BIGINT) AS col_n FROM cells GROUP BY b),
        |tot AS (SELECT CAST(COALESCE(SUM(o), 0) AS BIGINT) AS n FROM cells)
        |SELECT rws.a, cls.b, COALESCE(cells.o, 0) AS o,
        |  rws.row_n, cls.col_n, tot.n,
        |  CAST(COALESCE(cells.o, 0) * tot.n - rws.row_n * cls.col_n AS DOUBLE)
        |    * CAST(COALESCE(cells.o, 0) * tot.n - rws.row_n * cls.col_n AS DOUBLE)
        |    / CAST(tot.n AS DOUBLE) / CAST(rws.row_n AS DOUBLE)
        |    / CAST(cls.col_n AS DOUBLE) AS term
        |FROM rws CROSS JOIN cls
        |LEFT JOIN cells ON cells.a = rws.a AND cells.b = cls.b
        |CROSS JOIN tot
        |ORDER BY rws.a, cls.b""".stripMargin,

    // distinct-value counts, the inclusive cumulative window in value
    // order, the lower-quantile bucket rule (all operands nonnegative
    // so // == floor), one bucket groupBy; HUGEINT → BIGINT
    "q_equidepth" ->
      """WITH counts AS (
        |  SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY n_chars),
        |cum AS (
        |  SELECT v, c,
        |    CAST(SUM(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm
        |  FROM counts),
        |tot AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n FROM counts)
        |SELECT CAST((cm - 1) * 10 // n AS BIGINT) AS bucket,
        |  MIN(v) AS lo, MAX(v) AS hi,
        |  CAST(SUM(c) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct
        |FROM cum CROSS JOIN tot
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin,

    // per-side key counts, matched-key products, ROW_NUMBER top-k and
    // the '__total__' summary row; HUGEINT sums/products → BIGINT
    "q_join_fanout" ->
      """WITH ca AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, CAST(COUNT(*) AS BIGINT) AS n_left
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |cb AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, CAST(COUNT(*) AS BIGINT) AS n_right
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |j AS (
        |  SELECT ca.key, ca.n_left, cb.n_right,
        |    CAST(ca.n_left * cb.n_right AS BIGINT) AS n_out
        |  FROM ca JOIN cb ON ca.key = cb.key),
        |top AS (
        |  SELECT key, n_left, n_right, n_out
        |  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_out DESC, key) AS rn FROM j) t
        |  WHERE rn <= 10),
        |tot AS (
        |  SELECT '__total__' AS key,
        |    CAST(COALESCE(SUM(n_left), 0) AS BIGINT) AS n_left,
        |    CAST(COALESCE(SUM(n_right), 0) AS BIGINT) AS n_right,
        |    CAST(COALESCE(SUM(n_out), 0) AS BIGINT) AS n_out
        |  FROM j)
        |SELECT * FROM (SELECT * FROM top UNION ALL SELECT * FROM tot) u
        |ORDER BY n_out DESC, key""".stripMargin,

    // 2-arm melt with the '__null__' fold, one (dim, value) count,
    // max/min struct argmax replayed as (c, value) DESC/ASC picks via
    // ROW_NUMBER; Gini as the integer fraction (n²-Σc²)/n²
    "q_balance_audit" ->
      """WITH melted AS (
        |  SELECT 'lang' AS dim, COALESCE(lang, '__null__') AS value FROM documents
        |  UNION ALL
        |  SELECT 'source', COALESCE(source, '__null__') FROM documents),
        |counts AS (
        |  SELECT dim, value, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM melted GROUP BY dim, value),
        |ranked AS (
        |  SELECT dim, value, c,
        |    ROW_NUMBER() OVER (PARTITION BY dim ORDER BY c DESC, value DESC) AS rmaj,
        |    ROW_NUMBER() OVER (PARTITION BY dim ORDER BY c ASC, value ASC) AS rmin
        |  FROM counts),
        |agg AS (
        |  SELECT dim, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(c * c) AS BIGINT) AS sq
        |  FROM counts GROUP BY dim)
        |SELECT a.dim, a.n, a.k,
        |  mj.value AS majority_value, mj.c AS majority_n,
        |  mn.value AS minority_value, mn.c AS minority_n,
        |  CAST(a.n * a.n - a.sq AS BIGINT) AS gini_num,
        |  CAST(a.n * a.n AS BIGINT) AS gini_den
        |FROM agg a
        |JOIN ranked mj ON mj.dim = a.dim AND mj.rmaj = 1
        |JOIN ranked mn ON mn.dim = a.dim AND mn.rmin = 1
        |ORDER BY a.dim""".stripMargin,

    // poly_hash64 replayed once per DISTINCT key then joined back;
    // bucket = pmod(h, 32); ROW_NUMBER (nr DESC, k DESC) == the
    // engine's max(struct(nr, k)) argmax; HUGEINT sums → BIGINT
    "q_skew_audit" -> {
      val hk = TrainingOps.polyHashOverSql("k",
        """SELECT k, 'skew|' || k AS t FROM (
          |  SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events) _d""".stripMargin)
      s"""WITH hk AS ($hk),
         |rows_w AS (
         |  SELECT CAST(e.user_id AS VARCHAR) AS k,
         |    COALESCE(length(e.props), 0) AS w
         |  FROM events e),
         |keyed AS (
         |  SELECT ((hk.h % 32) + 32) % 32 AS bucket, r.k, r.w
         |  FROM rows_w r JOIN hk ON r.k = hk.k),
         |per_key AS (
         |  SELECT bucket, k, COUNT(*) AS nr, SUM(w) AS tw
         |  FROM keyed GROUP BY 1, 2),
         |agg AS (
         |  SELECT bucket,
         |    CAST(SUM(nr) AS BIGINT) AS n_rows,
         |    CAST(COUNT(*) AS BIGINT) AS n_keys,
         |    CAST(SUM(tw) AS BIGINT) AS tot_w
         |  FROM per_key GROUP BY bucket),
         |top AS (
         |  SELECT bucket, k AS top_key, CAST(nr AS BIGINT) AS top_key_rows
         |  FROM (SELECT bucket, k, nr, ROW_NUMBER() OVER (PARTITION BY bucket
         |          ORDER BY nr DESC, k DESC) AS rn FROM per_key) t
         |  WHERE rn = 1)
         |SELECT CAST(a.bucket AS BIGINT) AS bucket, a.n_rows, a.n_keys,
         |  a.tot_w, t.top_key, t.top_key_rows
         |FROM agg a JOIN top t ON a.bucket = t.bucket
         |ORDER BY a.bucket""".stripMargin
    },

    // one (token, snapshot-tag) count pass pivoted to (c1, c2); the
    // chi term replayed with the SAME pinned IEEE shape: one BIGINT
    // difference cast to double, a square, then three single
    // divisions in the same order
    "q_token_drift" ->
      """WITH tok AS (
        |  SELECT doc_id % 2 AS snap,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS token
        |  FROM documents),
        |tc AS (
        |  SELECT token,
        |    CAST(COALESCE(SUM(CASE WHEN snap = 0 THEN 1 END), 0) AS BIGINT) AS c1,
        |    CAST(COALESCE(SUM(CASE WHEN snap <> 0 THEN 1 END), 0) AS BIGINT) AS c2
        |  FROM tok GROUP BY token),
        |tot AS (SELECT CAST(COALESCE(SUM(c1), 0) AS BIGINT) AS n1,
        |               CAST(COALESCE(SUM(c2), 0) AS BIGINT) AS n2 FROM tc)
        |SELECT token, c1, c2,
        |  (CAST(c1 * n2 - c2 * n1 AS DOUBLE) * CAST(c1 * n2 - c2 * n1 AS DOUBLE))
        |    / CAST(n1 AS DOUBLE) / CAST(n2 AS DOUBLE)
        |    / CAST(c1 + c2 AS DOUBLE) AS chi2
        |FROM tc CROSS JOIN tot
        |WHERE c1 + c2 >= 10
        |ORDER BY token""".stripMargin,

    // the prefix-sum window form of the CUSUM recurrence, identical
    // expressions both engines; target = floor(mean)
    "q_drift_cusum" ->
      """WITH daily AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |tgt AS (
        |  SELECT event_type, CAST(sum(x) // count(*) AS BIGINT) AS target FROM daily GROUP BY 1),
        |p AS (
        |  SELECT d.event_type, t.target, d.day,
        |    SUM(d.x - t.target) OVER (PARTITION BY d.event_type ORDER BY d.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        |  FROM daily d JOIN tgt t USING (event_type)),
        |s AS (
        |  SELECT event_type, target, day,
        |    p - LEAST(CAST(0 AS BIGINT), MIN(p) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS sp,
        |    -p + GREATEST(CAST(0 AS BIGINT), MAX(p) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS sd
        |  FROM p)
        |SELECT event_type, target,
        |  CAST(MAX(sp) AS BIGINT) AS max_up,
        |  CAST(MAX(sd) AS BIGINT) AS max_down,
        |  MIN(CASE WHEN sp > GREATEST(target, CAST(0 AS BIGINT)) THEN day END) AS alarm_day
        |FROM s GROUP BY event_type, target
        |ORDER BY event_type""".stripMargin,

    // per-(lang, token-count) weight sums, integer cumsum windows,
    // 2*cumw >= W lower-median rule — all BIGINT
    "q_weighted_median" ->
      """WITH d AS (
        |  SELECT lang,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS BIGINT) AS v,
        |    CAST(SUM(n_chars) AS BIGINT) AS w
        |  FROM documents GROUP BY 1, 2),
        |c AS (
        |  SELECT lang, v,
        |    SUM(w) OVER (PARTITION BY lang ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    SUM(w) OVER (PARTITION BY lang) AS tw
        |  FROM d)
        |SELECT lang, CAST(MIN(v) AS BIGINT) AS w_median, CAST(tw AS BIGINT) AS total_w
        |FROM c WHERE cw * 2 >= tw
        |GROUP BY lang, tw
        |ORDER BY lang""".stripMargin,

    // (det, dep) counts, majority via ROW_NUMBER (count desc, dep asc),
    // floor-div confidence — all integers
    "q_fd_audit" ->
      """WITH d AS (
        |  SELECT source AS det, lang AS dep, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |w AS (
        |  SELECT det, dep, c,
        |    CAST(SUM(c) OVER (PARTITION BY det) AS BIGINT) AS n,
        |    ROW_NUMBER() OVER (PARTITION BY det ORDER BY c DESC, dep) AS rk
        |  FROM d)
        |SELECT det AS source, dep AS dep_major, n, c AS n_major,
        |  CAST((100 * c) // n AS BIGINT) AS conf_pct
        |FROM w WHERE rk = 1
        |ORDER BY source""".stripMargin,

    // cents image of value, per-(type, cents) counts, integer cumsum
    // windows, lower-quantile conditional mins, clamped integer sums
    "q_winsorize" ->
      """WITH d AS (
        |  SELECT event_type AS g,
        |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT g, v, c,
        |    SUM(c) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    SUM(c) OVER (PARTITION BY g) AS n
        |  FROM d),
        |b AS (
        |  SELECT g, v, c, CAST(n AS BIGINT) AS n,
        |    MIN(CASE WHEN cw * 100 >= n * 5 THEN v END)
        |      OVER (PARTITION BY g) AS lo,
        |    MIN(CASE WHEN cw * 100 >= n * 95 THEN v END)
        |      OVER (PARTITION BY g) AS hi
        |  FROM w)
        |SELECT g AS event_type, n, lo, hi,
        |  CAST(SUM(CASE WHEN v < lo THEN c ELSE 0 END) AS BIGINT) AS n_lo,
        |  CAST(SUM(CASE WHEN v > hi THEN c ELSE 0 END) AS BIGINT) AS n_hi,
        |  CAST(SUM(c * GREATEST(lo, LEAST(hi, v))) AS BIGINT) AS sum_wins
        |FROM b GROUP BY g, n, lo, hi
        |ORDER BY event_type""".stripMargin,

    // exact decimal sums, then the identical double formula text:
    // slope rounded to 12 decimals, intercept computed FROM the
    // rounded slope (the corr_matrix convention)
    "q_trend" ->
      """WITH d AS (
        |  SELECT event_type AS g, epoch_us(ts) // 3600000000 AS x,
        |    CAST(value AS DECIMAL(12,2)) AS y
        |  FROM events),
        |a AS (
        |  SELECT g, COUNT(*) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sy,
        |    SUM(CAST(CAST(x AS DECIMAL(18,0)) * y AS DECIMAL(38,4))) AS sxy,
        |    SUM(CAST(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0)) AS DECIMAL(38,0))) AS sxx
        |  FROM d GROUP BY g),
        |sl AS (
        |  SELECT g, n, sx, sy,
        |    ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope
        |  FROM a)
        |SELECT g AS event_type, n, slope,
        |  ROUND((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |   / CAST(n AS DOUBLE), 6) AS intercept
        |FROM sl
        |ORDER BY event_type""".stripMargin,

    // same derived v2 snapshot, same "vdiff|"-prefixed content
    // fingerprints (hashed once per DISTINCT text, joined back by the
    // text itself), same full-outer status fold — collisions, if any,
    // replay identically. Presence comes from v1/v2 markers (LEFT
    // join to the hash table), never from fingerprint non-NULLness:
    // the engine defines NULL text as a PRESENT doc with NULL content
    // (fp NULL, null-safe-equal), so the oracle must too
    "q_version_diff" -> {
      s"""WITH v1 AS (SELECT doc_id, text FROM documents),
         |v2 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 17 = 0 THEN text || ' [rev2]' ELSE text END AS text
         |  FROM documents WHERE doc_id % 23 <> 0
         |  UNION ALL
         |  SELECT doc_id + 1000000000, text FROM documents WHERE doc_id % 29 = 0),
         |allt AS (SELECT DISTINCT txt FROM (
         |  SELECT text AS txt FROM v1 UNION ALL SELECT text FROM v2) u
         |  WHERE txt IS NOT NULL),
         |hs AS (${TrainingOps.polyHashSql("vdiff|", "allt", "txt")}),
         |f1 AS (SELECT v1.doc_id, hs.h AS fa, TRUE AS ia
         |       FROM v1 LEFT JOIN hs ON v1.text = hs.txt),
         |f2 AS (SELECT v2.doc_id, hs.h AS fb, TRUE AS ib
         |       FROM v2 LEFT JOIN hs ON v2.text = hs.txt),
         |j AS (SELECT COALESCE(f1.doc_id, f2.doc_id) AS doc_id,
         |             f1.fa, f2.fb, f1.ia, f2.ib
         |      FROM f1 FULL OUTER JOIN f2 ON f1.doc_id = f2.doc_id)
         |SELECT doc_id,
         |  CASE WHEN ia IS NULL THEN 'added'
         |       WHEN ib IS NULL THEN 'removed'
         |       WHEN fa IS NOT DISTINCT FROM fb THEN 'unchanged'
         |       ELSE 'changed' END AS status
         |FROM j ORDER BY doc_id""".stripMargin
    },

    // row repr replayed byte-for-byte (length-prefixed fields, NULL->n),
    // poly-hash via the shared UTF-8-byte HUGEINT replay (empty domain
    // prefix: "row" leads the repr itself), mod-2^64 sum, signed image
    "q_dataset_hash" -> {
      val rows =
        """SELECT source,
          |    'row' ||
          |    'v' || CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR) ||
          |    CASE WHEN lang IS NULL THEN 'n' ELSE 'v' || CAST(length(lang) AS VARCHAR) || ':' || lang END ||
          |    CASE WHEN source IS NULL THEN 'n' ELSE 'v' || CAST(length(source) AS VARCHAR) || ':' || source END ||
          |    'v' || CAST(length(CAST(n_chars AS VARCHAR)) AS VARCHAR) || ':' || CAST(n_chars AS VARCHAR) ||
          |    CASE WHEN text IS NULL THEN 'n' ELSE 'v' || CAST(length(text) AS VARCHAR) || ':' || text END AS r
          |  FROM documents""".stripMargin
      val M = "18446744073709551616"
      s"""WITH rows_ AS (
         |  $rows),
         |hs AS (${TrainingOps.polyHashSql("", "(SELECT DISTINCT r FROM rows_)", "r")}),
         |j AS (SELECT rows_.source, hs.h FROM rows_ JOIN hs ON rows_.r = hs.r),
         |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
         |               sum(CAST(h AS HUGEINT)) AS s0
         |        FROM j GROUP BY source),
         |fin AS (SELECT source, n_rows, ((s0 % $M) + $M) % $M AS m FROM agg)
         |SELECT source, n_rows,
         |  CAST(CASE WHEN m >= 9223372036854775808 THEN m - $M ELSE m END AS BIGINT) AS checksum
         |FROM fin ORDER BY source""".stripMargin
    },
    "q_profile" ->
      """WITH s AS (SELECT COUNT(*) AS n,
        |  COUNT(event_id) AS nn1, COUNT(DISTINCT event_id) AS nd1,
        |  CAST(MIN(event_id) AS DOUBLE) AS mn1, CAST(MAX(event_id) AS DOUBLE) AS mx1,
        |  COUNT(user_id) AS nn2, COUNT(DISTINCT user_id) AS nd2,
        |  CAST(MIN(user_id) AS DOUBLE) AS mn2, CAST(MAX(user_id) AS DOUBLE) AS mx2,
        |  COUNT(value) AS nn3, COUNT(DISTINCT value) AS nd3,
        |  MIN(value) AS mn3, MAX(value) AS mx3,
        |  COUNT(event_type) AS nn4, COUNT(DISTINCT event_type) AS nd4,
        |  MIN(event_type) AS mns4, MAX(event_type) AS mxs4
        |  FROM events)
        |SELECT column_name, n_rows, n_null, n_distinct, min_num, max_num, min_str, max_str FROM (
        |  SELECT 'event_id' AS column_name, n AS n_rows, n - nn1 AS n_null, nd1 AS n_distinct,
        |    mn1 AS min_num, mx1 AS max_num, CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM s
        |  UNION ALL
        |  SELECT 'user_id', n, n - nn2, nd2, mn2, mx2, NULL, NULL FROM s
        |  UNION ALL
        |  SELECT 'value', n, n - nn3, nd3, mn3, mx3, NULL, NULL FROM s
        |  UNION ALL
        |  SELECT 'event_type', n, n - nn4, nd4, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mns4, mxs4 FROM s) t
        |ORDER BY column_name""".stripMargin,

    "q_histogram" ->
      """SELECT bin, CAST(bin * 25 AS DOUBLE) AS bin_lo, n, bin_sum FROM (
        |  SELECT CAST(FLOOR(value / 25) AS BIGINT) AS bin, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS bin_sum
        |  FROM events GROUP BY 1) t
        |ORDER BY bin""".stripMargin,

    "q_time_weighted" ->
      """WITH t AS (
        |  SELECT user_id, value,
        |    (LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      - epoch_us(ts)) // 1000 AS dt_ms
        |  FROM events)
        |SELECT user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2)) * dt_ms) AS DOUBLE)
        |    / CAST(SUM(dt_ms) AS DOUBLE) AS tw_avg,
        |  COUNT(*) AS n_intervals
        |FROM t WHERE dt_ms IS NOT NULL AND dt_ms > 0
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q_forward_fill" ->
      """WITH daily AS (
        |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
        |    SUM(CAST(value AS DECIMAL(12,2))) AS dsum
        |  FROM events GROUP BY 1, 2),
        |days AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events),
        |users AS (SELECT DISTINCT user_id FROM events),
        |grid AS (SELECT user_id, day FROM users CROSS JOIN days)
        |SELECT g.user_id, g.day,
        |  CAST(last_value(d.dsum IGNORE NULLS) OVER (PARTITION BY g.user_id
        |    ORDER BY g.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS filled_value,
        |  d.dsum IS NOT NULL AS observed
        |FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
        |ORDER BY g.user_id, g.day""".stripMargin,

    "q_corr_matrix" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      def dd(c: String) = s"CAST($c AS DECIMAL(12,2))"
      val aggs =
        Seq("COUNT(*) AS n") ++
        cols.map(c => s"CAST(SUM(${dd(c)}) AS DECIMAL(38,4)) AS s_$c") ++
        (for (i <- cols.indices; j <- i until cols.size) yield {
          val (a, b) = (cols(i), cols(j))
          s"SUM(CAST(${dd(a)} * ${dd(b)} AS DECIMAL(38,4))) AS p_${a}__$b"
        })
      val pairSelects = for (i <- cols.indices; j <- (i + 1) until cols.size) yield {
        val (a, b) = (cols(i), cols(j))
        s"""SELECT '$a' AS col_x, '$b' AS col_y,
           |  ROUND((CAST(n AS DOUBLE) * CAST(p_${a}__$b AS DOUBLE)
           |   - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
           |  / sqrt((CAST(n AS DOUBLE) * CAST(p_${a}__$a AS DOUBLE)
           |           - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
           |         * (CAST(n AS DOUBLE) * CAST(p_${b}__$b AS DOUBLE)
           |            - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))), 12) AS corr
           |FROM a""".stripMargin
      }
      s"""WITH a AS (SELECT ${aggs.mkString(", ")} FROM lineitem)
         |${pairSelects.mkString("\nUNION ALL\n")}
         |ORDER BY col_x, col_y""".stripMargin
    },

    "q_outliers_mad" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS m
        |  FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_id, e.event_type, e.value, abs(e.value - med.m) AS d
        |  FROM events e JOIN med USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(d, 0.5) AS md FROM dev GROUP BY 1)
        |SELECT dev.event_id, dev.event_type, dev.value
        |FROM dev JOIN mad USING (event_type)
        |WHERE dev.d > 4.4478 * mad.md
        |ORDER BY dev.event_id""".stripMargin,
  )
}
