package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables

/** The remaining TPC-H query shapes (Q2, Q8, Q9, Q11, Q12, Q16, Q19, Q20),
  * adapted to the driver tables' columns (no partsupp / shipmode /
  * commit-receipt dates — each query keeps its defining OPERATOR SHAPE and
  * swaps the missing column for an available analog). Together with the
  * q01/q03/q04/q05/q06/q07/q10/q13/q14/q15/q17/q18/q21/q22 shapes in
  * CoreQueries this completes all 22 TPC-H patterns.
  *
  * Numeric discipline is CoreQueries' (decimal sums, one double cast);
  * every dimension side is explicitly broadcast; fact⋈fact joins shuffle
  * on their natural keys and are AQE-replannable.
  */
object TpchQueries {

  private def pd = col("l_extendedprice").cast("decimal(18,4)")
  private def dd = col("l_discount").cast("decimal(8,4)")

  /** Q2 shape — per-part minimum-cost supplier, region-scoped: the
    * correlated `cost = (SELECT min …)` subquery decorrelated to a
    * min-aggregate joined back on (part, cost) equality — the same
    * decorrelation Catalyst produces, made explicit. Supplier cost for a
    * part stands in for ps_supplycost as the supplier's cheapest observed
    * line price. Ties (two suppliers at the exact min) are all emitted,
    * as in TPC-H. Scale: the eligible-supplier dim and the filtered part
    * dim broadcast; only the offer aggregation shuffles, on l_partkey. */
  val q02MinCostSupplier = Q(
    "q02_min_cost_supplier",
    """WITH elig AS (
      |  SELECT s_suppkey, s_name, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |offer AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
      |  FROM lineitem JOIN elig ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2),
      |best AS (SELECT l_partkey, min(cost) AS min_cost FROM offer GROUP BY 1)
      |SELECT p.p_partkey, p.p_name, e.s_name, e.n_name, o.cost
      |FROM part p
      |JOIN offer o ON p.p_partkey = o.l_partkey
      |JOIN best b ON o.l_partkey = b.l_partkey AND o.cost = b.min_cost
      |JOIN elig e ON o.l_suppkey = e.s_suppkey
      |WHERE p.p_type = 'LARGE' AND p.p_size <= 10""".stripMargin) { (s, d) =>
    val elig = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val offer = Tables.lineitem(s, d)
      .join(broadcast(elig.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("cost"))
    val parts = Tables.part(s, d)
      .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
      .select(col("p_partkey"), col("p_name"))
    // the min-join-back of the oracle, expressed as rank()=1 over the SAME
    // offer aggregate (ties all kept, as TPC-H requires) — one fact scan
    // and one partkey shuffle instead of recomputing `offer` for the best
    // side, and the rank filter gets the WindowGroupLimit pushdown
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_partkey")).orderBy(col("cost"))
    offer
      .withColumn("__rk", rank().over(w))
      .filter(col("__rk") === 1).drop("__rk")
      .join(broadcast(parts), col("p_partkey") === col("l_partkey"))
      .join(broadcast(elig), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        col("cost"))
  }

  /** Q8 shape — national market share: one nation's revenue share of a
    * region's market per year. The defining form is the conditional
    * aggregate RATIO — Σ(case nation)⁄Σ(all) in one grouped pass, no
    * second join against the total. Both nation roles (supplier's for the
    * share, customer's for the region scope) resolve through broadcast
    * dims; lineitem⋈orders is the only fact shuffle. */
  val q08MarketShare = Q(
    "q08_market_share",
    """WITH rev AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,4)) AS pd,
      |    CAST(l_extendedprice AS DECIMAL(18,4))
      |      * CAST(l_discount AS DECIMAL(8,4)) AS pdd,
      |    sn.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region ON cn.n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      |SELECT o_year,
      |  CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN pd
      |             ELSE CAST(0 AS DECIMAL(18,4)) END)
      |     - SUM(CASE WHEN supp_nation = 'NATION_5' THEN pdd
      |             ELSE CAST(0 AS DECIMAL(27,8)) END) AS DOUBLE)
      |  / CAST(SUM(pd) - SUM(pdd) AS DOUBLE) AS mkt_share
      |FROM rev GROUP BY 1""".stripMargin) { (s, d) =>
    val nat = Tables.nation(s, d)
    val sn = Tables.supplier(s, d)
      .join(broadcast(nat.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val euroCust = Tables.customer(s, d)
      .join(broadcast(nat.select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val promoParts = Tables.part(s, d).filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val isN5 = col("supp_nation") === "NATION_5"
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(promoParts), col("p_partkey") === col("l_partkey"))
      .join(broadcast(sn), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(euroCust), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(isN5, pd).otherwise(lit(0).cast("decimal(18,4)"))).as("np"),
        sum(when(isN5, pd * dd).otherwise(lit(0).cast("decimal(27,8)"))).as("npd"),
        sum(pd).as("sp"), sum(pd * dd).as("spd"))
      .select(col("o_year"),
        ((col("np") - col("npd")).cast("double")
          / (col("sp") - col("spd")).cast("double")).as("mkt_share"))
  }

  /** Q9 shape — product-line profit by supplier nation × year: profit =
    * revenue − cost where the part's retail price per unit stands in for
    * ps_supplycost. The shape is the multi-dim star join with an
    * arithmetic measure spanning two fact columns and a dim column —
    * the dims (filtered part, supplier⋈nation) broadcast, orders joins
    * on the fact key for the year. */
  val q09ProductProfit = Q(
    "q09_product_profit",
    """WITH base AS (
      |  SELECT sn.n_name AS nation,
      |    CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,4)) AS pd,
      |    CAST(l_extendedprice AS DECIMAL(18,4))
      |      * CAST(l_discount AS DECIMAL(8,4)) AS pdd,
      |    CAST(p_retailprice AS DECIMAL(18,4))
      |      * CAST(l_quantity AS DECIMAL(8,4)) AS cost
      |  FROM lineitem
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  WHERE p_name LIKE '%widget%')
      |SELECT nation, o_year,
      |  CAST(SUM(pd) - SUM(pdd) - SUM(cost) AS DOUBLE) AS profit
      |FROM base GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val widgetParts = Tables.part(s, d)
      .filter(col("p_name").like("%widget%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sn = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(widgetParts), col("p_partkey") === col("l_partkey"))
      .join(broadcast(sn), col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(pd).as("sp"), sum(pd * dd).as("spd"),
        sum(col("p_retailprice").cast("decimal(18,4)")
          * col("l_quantity").cast("decimal(8,4)")).as("sc"))
      .select(col("nation"), col("o_year"),
        (col("sp") - col("spd") - col("sc")).cast("double").as("profit"))
  }

  /** Q11 shape — important parts: per-part value vs a GLOBAL scalar
    * threshold (HAVING value > fraction × Σ all). The total re-uses the
    * per-part aggregate (sum of sums — exact in decimal) and broadcasts
    * as a one-row frame; nothing recomputes the fact scan. */
  val q11ImportantParts = Q(
    "q11_important_parts",
    """WITH v AS (
      |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS val
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_3'
      |  GROUP BY 1),
      |tot AS (SELECT SUM(val) AS total FROM v)
      |SELECT l_partkey, CAST(val AS DOUBLE) AS value
      |FROM v, tot
      |WHERE CAST(val AS DOUBLE) > CAST(total AS DOUBLE) * 0.001""".stripMargin) {
    (s, d) =>
      val n3Supp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name") === "NATION_3").select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val v = Tables.lineitem(s, d)
        .join(broadcast(n3Supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(sum(pd).as("val"))
      val tot = v.agg(sum(col("val")).as("total"))
      v.crossJoin(broadcast(tot))
        .filter(col("val").cast("double") > col("total").cast("double") * 0.001)
        .select(col("l_partkey"), col("val").cast("double").as("value"))
  }

  /** Q12 shape — priority counts by category: the two-armed conditional
    * count over a fact⋈fact join (line status standing in for shipmode),
    * date-windowed. One shuffle join on the order key, one grouped pass. */
  val q12PriorityByStatus = Q(
    "q12_priority_by_status",
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS low_count
      |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(high, 1).otherwise(0)).as("high_count"),
        sum(when(!high, 1).otherwise(0)).as("low_count"))
  }

  /** Q16 shape — supplier diversity per part profile: COUNT(DISTINCT
    * supplier) per (brand, type, size) after excluding a NOT-IN supplier
    * set. The exclusion is a broadcast anti-join (never a NOT IN
    * subquery at runtime); the distinct-count shuffles once on the
    * (brand, type, size) profile with partial distinct aggregation
    * map-side. */
  val q16SupplierCnt = Q(
    "q16_supplier_cnt",
    """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#3' AND p_type <> 'MEDIUM'
      |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
    val profiles = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#3" && col("p_type") =!= "MEDIUM"
        && col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val badSupp = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(s, d)
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(profiles), col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Q19 shape — disjunctive predicate revenue: an OR of three
    * (brand × size-range × quantity-range) conjunction branches spanning
    * BOTH join sides, with the common conjunct factored out so it still
    * reaches the lineitem scan as a pushed filter. Catalyst keeps the
    * residual OR as a post-join filter — the correct plan, since no
    * single branch subsumes the scan. */
  val q19Disjunctive = Q(
    "q19_disjunctive",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
      |  - SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |        * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_returnflag = 'N' AND (
      |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |      AND l_quantity BETWEEN 1 AND 11)
      |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |      AND l_quantity BETWEEN 10 AND 20)
      |  OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
      |      AND l_quantity BETWEEN 20 AND 30))""".stripMargin) { (s, d) =>
    val branch = (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
      && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
        && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#4" && col("p_size").between(1, 15)
        && col("l_quantity").between(20, 30))
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "N")
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("p_partkey") === col("l_partkey"))
      .filter(branch)
      .agg(sum(pd).as("sp"), sum(pd * dd).as("spd"))
      .select((col("sp") - col("spd")).cast("double").as("revenue"))
  }

  /** Q20 shape — suppliers who shipped excess volume of a part family in
    * a window: the nested agg-derived IN chain (parts → shipped volume per
    * supplier → HAVING threshold → semi-join into the supplier dim). Each
    * derived set stays a semi-join; the fact scan happens once. */
  val q20ExcessShippers = Q(
    "q20_excess_shippers",
    """WITH rp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
      |sh AS (
      |  SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM rp)
      |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1)
      |SELECT s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM sh WHERE CAST(qty AS DOUBLE) > 150.0)""".stripMargin) {
    (s, d) =>
      val redParts = Tables.part(s, d).filter(col("p_name").like("red%"))
        .select(col("p_partkey"))
      val excess = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("qty"))
        .filter(col("qty").cast("double") > 150.0)
        .select(col("l_suppkey"))
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(excess), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("n_name"))
  }

  val all: Seq[Q] = Seq(q02MinCostSupplier, q08MarketShare, q09ProductProfit,
    q11ImportantParts, q12PriorityByStatus, q16SupplierCnt, q19Disjunctive,
    q20ExcessShippers)
}
