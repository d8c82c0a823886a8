package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Third relational batch — the remaining TPC-H query SHAPES this
  * dataset's schema supports (no partsupp table ships, so Q2/Q9/Q11/
  * Q16/Q20 have no analog; Q21/Q22 are re-expressed on the available
  * columns, marked below). Same oracle-parity rules as Relational
  * (SURVEY.md §5): DECIMAL-exact sums cast to double ONCE at display,
  * explicit ORDER BY with tiebreakers, identical aliases both sides.
  *
  * Scale postures are the classic ones: only FIXED-cardinality dims
  * (nation = 25 rows, region = 5) carry an explicit `broadcast` hint;
  * customer/supplier/part GROW with scale factor, so their joins are
  * left unhinted — at sf0.1 AQE broadcasts them anyway (observe the
  * plan), while at 100× a forced hint would OR the build side past
  * the executor heap and kill the job where AQE would shuffle. This
  * mirrors Relational.scala's round-1 posture (customer left to AQE).
  * The two correlated-aggregate shapes (Q15's max-revenue join-back,
  * Q17's per-part average) materialize the aggregate as a frame and
  * join it back co-partitioned rather than re-scanning per row. */
object Relational3 {

  import Relational.{dec2, revenueTerm}

  private def rev = revenueTerm(col("l_extendedprice"), col("l_discount"))

  /** Q7 shape — volume shipping between two nations: revenue by
    * (supplier nation, customer nation, ship year) for the ordered
    * pairs (A,B) and (B,A). The 25-row nation dim broadcasts twice under
    * aliases; the lineitem↔orders join is the only big shuffle. */
  def q7NationVolume(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("snk"),
      col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("cnk"),
      col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
              col("l_shipdate") <  lit("1998-01-01").cast(TimestampType))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(n1), col("snk") === col("s_nationkey"))
      .join(broadcast(n2), col("cnk") === col("c_nationkey"))
      .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
              (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast(LongType).as("l_year"))
      .agg(sum(rev).cast(DoubleType).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q8 shape — national market share: of all PROMO-part revenue sold
    * to EUROPE customers, the share supplied by NATION_5, by order
    * year. Ratio of two exact decimal sums per year, one division. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val euNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cnk"))
    val suppNation = Tables.nation(s, d)
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
        col("p_partkey") === col("l_partkey"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(euNations), col("cnk") === col("c_nationkey"), "left_semi")
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(suppNation), col("snk") === col("s_nationkey"))
      .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_5", rev)
          .otherwise(lit(0).cast(DecimalType(12, 2)))).cast(DoubleType) /
        sum(rev).cast(DoubleType)).as("mkt_share"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_year"))
  }

  /** Q10 shape — returned-item revenue by customer: who shipped the
    * most revenue back (returnflag = 'R') in a quarter. Top-20 like
    * Q18, tiebroken on the key. */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
                  col("o_orderdate") <  lit("1996-07-01").cast(TimestampType)),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(rev).cast(DoubleType).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Q13 shape — customer order-count distribution: how many customers
    * placed k orders, k = 0 included (the LEFT join is the point). */
  def q13CustDistribution(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"))
      .join(Tables.orders(s, d).select(col("o_custkey")),
        col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Q15 shape — top supplier(s) by quarter revenue: the revenue view,
    * its max as a 1-row broadcast, equality join-back (ties all
    * surface, deterministically ordered). */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val revenue = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
              col("l_shipdate") <  lit("1996-04-01").cast(TimestampType))
      .groupBy(col("l_suppkey"))
      .agg(sum(rev).as("__tr"))
    val mx = revenue.agg(max(col("__tr")).as("__mx"))
    revenue.crossJoin(broadcast(mx))
      .filter(col("__tr") === col("__mx"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("__tr").cast(DoubleType).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q17 shape — small-quantity-order revenue: lines under 50% of
    * their part's average quantity, for one brand (no p_container in
    * this schema — the brand filter carries the selectivity). The
    * per-part average is a co-partitioned aggregate joined back,
    * never a correlated rescan; the ratio avoids fractional DECIMAL
    * division by comparing 2·qty < avg·count via exact integers-in-
    * decimal (qty·cnt·2 < sum·1 cross-multiplied). */
  def q17SmallQuantity(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_brand") === "Brand#23"),
        col("p_partkey") === col("l_partkey"))
    val avgq = li.groupBy(col("p_partkey").as("__pk"))
      .agg(sum(dec2(col("l_quantity"))).as("__sq"), count(lit(1)).as("__nq"))
    li.join(avgq, col("__pk") === col("p_partkey"))
      // qty < 0.5 * avg  ==  qty * n * 2 < sum  (all exact decimals)
      .filter(dec2(col("l_quantity")) * col("__nq") * 2 < col("__sq"))
      .agg(sum(rev).cast(DoubleType).as("small_qty_revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Q21 shape on the available columns (no receipt/commit dates ship):
    * suppliers who were the SOLE late shipper on a multi-supplier
    * order — their line shipped > 90 days after the order date while
    * every other supplier's lines were on time. The exists/not-exists
    * pair is two unordered window aggregates over the ONE order-keyed
    * exchange: repartition by l_orderkey up front (HashPartitioning on
    * a subset key satisfies both the (orderkey, suppkey) aggregation
    * and the orderkey window), so the old three exchanges of the
    * per-supplier frame (groupBy pair + per-order re-agg + join-back)
    * collapse to one — same aggregates, same rows (guide §2.4: two
    * operations keyed the same way share one exchange). */
  def q21LateSuppliers(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .as("__late"))
      .repartition(col("l_orderkey"))
    val perSupp = li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("__late"), 1L).otherwise(0L)).as("__supp_late"))
    val w = Window.partitionBy(col("l_orderkey"))
    perSupp
      .withColumn("__n_supp", count(lit(1)).over(w))
      .withColumn("__n_late", sum(col("__supp_late")).over(w))
      .filter(col("__n_supp") >= 2 && col("__n_late") === 1L &&
        col("__supp_late") === 1L)
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  /** Q22 shape on the available columns (no phone country codes ship):
    * dormant high-balance customers — above the positive-balance
    * average for their nation-key bucket, with no RECENT orders (the
    * anti join; "no orders ever" would be empty at every SF because
    * the generator gives each customer early orders), counted per
    * bucket. The per-bucket average is a broadcast scalar frame, the
    * anti join shuffles on the key. */
  def q22GlobalSales(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), pmod(col("c_nationkey"), lit(5)).as("bucket"),
        dec2(col("c_acctbal")).as("bal"))
    val avgPos = cust.filter(col("bal") > 0)
      .groupBy(col("bucket"))
      .agg(sum(col("bal")).as("__s"), count(lit(1)).as("__n"))
    cust.join(broadcast(avgPos), Seq("bucket"))
      // bal > avg  ==  bal * n > sum (exact decimal cross-multiply)
      .filter(col("bal") * col("__n") > col("__s"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast(TimestampType))
          .select(col("o_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("bal")).cast(DoubleType).as("totacctbal"))
      .orderBy(col("bucket"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q7_nation_volume"  -> (q7NationVolume _),
    "q8_market_share"   -> (q8MarketShare _),
    "q10_returned"      -> (q10ReturnedItems _),
    "q13_cust_dist"     -> (q13CustDistribution _),
    "q15_top_supplier"  -> (q15TopSupplier _),
    "q17_small_qty"     -> (q17SmallQuantity _),
    "q21_late_suppliers" -> (q21LateSuppliers _),
    "q22_global_sales"  -> (q22GlobalSales _))

  private val RevSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(9,4)))"

  val oracles: Map[String, String] = Map(
    "q7_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  CAST(SUM($RevSql) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN orders   ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN nation n1 ON n1.n_nationkey = s_nationkey
         |JOIN nation n2 ON n2.n_nationkey = c_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate <  TIMESTAMP '1998-01-01'
         |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         |GROUP BY 1, 2, 3
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q8_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(SUM(CASE WHEN ns.n_name = 'NATION_5' THEN $RevSql
         |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         |    / CAST(SUM($RevSql) AS DOUBLE) AS mkt_share,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN part     ON p_partkey = l_partkey
         |JOIN orders   ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN nation ns ON ns.n_nationkey = s_nationkey
         |WHERE p_type = 'PROMO'
         |  AND c_nationkey IN (
         |    SELECT n_nationkey FROM nation JOIN region
         |      ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE')
         |GROUP BY 1
         |ORDER BY o_year""".stripMargin,

    "q10_returned" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(SUM($RevSql) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN orders   ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN nation   ON n_nationkey = c_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate <  TIMESTAMP '1996-07-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,

    "q13_cust_dist" ->
      """WITH co AS (
        |  SELECT c_custkey, COUNT(o_custkey) AS c_count
        |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |  GROUP BY 1)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM co
        |GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH r AS (
         |  SELECT l_suppkey, SUM($RevSql) AS tr
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate <  TIMESTAMP '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_revenue
         |FROM r JOIN supplier ON s_suppkey = l_suppkey
         |WHERE tr = (SELECT MAX(tr) FROM r)
         |ORDER BY s_suppkey""".stripMargin,

    "q17_small_qty" ->
      s"""WITH li AS (
         |  SELECT l_partkey, CAST(l_quantity AS DECIMAL(12,2)) AS q,
         |    $RevSql AS rv
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  WHERE p_brand = 'Brand#23'),
         |a AS (
         |  SELECT l_partkey AS pk, SUM(q) AS sq, COUNT(*) AS nq
         |  FROM li GROUP BY 1)
         |SELECT CAST(SUM(rv) AS DOUBLE) AS small_qty_revenue,
         |  COUNT(*) AS n_lines
         |FROM li JOIN a ON pk = l_partkey
         |WHERE q * nq * 2 < sq""".stripMargin,

    "q21_late_suppliers" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |      THEN 1 ELSE 0 END AS late
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
        |ps AS (
        |  SELECT l_orderkey, l_suppkey, MAX(late) AS supp_late
        |  FROM li GROUP BY 1, 2),
        |po AS (
        |  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(supp_late) AS n_late
        |  FROM ps GROUP BY 1)
        |SELECT s_suppkey, s_name, COUNT(*) AS numwait
        |FROM ps
        |JOIN po USING (l_orderkey)
        |JOIN supplier ON s_suppkey = l_suppkey
        |WHERE n_supp >= 2 AND n_late = 1 AND supp_late = 1
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey
        |LIMIT 20""".stripMargin,

    "q22_global_sales" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey % 5 AS bucket,
        |    CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        |  FROM customer),
        |ap AS (
        |  SELECT bucket, SUM(bal) AS s, COUNT(*) AS n
        |  FROM cust WHERE bal > 0 GROUP BY 1)
        |SELECT bucket, COUNT(*) AS numcust,
        |  CAST(SUM(bal) AS DOUBLE) AS totacctbal
        |FROM cust
        |JOIN ap USING (bucket)
        |WHERE bal * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin)
}
