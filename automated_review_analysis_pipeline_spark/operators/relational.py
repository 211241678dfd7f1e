"""Relational core over the TPC-H-ish star schema (SURVEY.md §2B).

The reference has no joins/windows/set-ops (SURVEY.md §2A "no reference
counterpart"); Spark provides them natively. These queries exist to prove
the engine's relational surface and to anchor the benchmark: they are the
classic TPC-H shapes re-expressed on the driver's schema.

Scale notes baked in:
* dimension joins (region/nation/customer/supplier/part) are BROADCAST --
  at 100 TB the fact tables shuffle, dims never should;
* money aggregates go through decimal(18,2) so partial/final aggregation is
  exact and associative -- bit-identical across engines and partitionings
  (double sums are order-dependent; decimal sums are not), cast to double
  only at the end;
* aggregates run partial+final (Catalyst hash agg) -- map-side combine
  before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark.plan_cache import plan_cache
from pyspark.sql.functions import broadcast


def _dec(c: str) -> F.Column:
    """Prices/quantities: decimal(12,2) -- wide enough for any value in the
    schema, narrow enough that price * (1-disc) * (1+tax) stays within
    width 38 under BOTH Spark's and DuckDB's decimal-multiply rules (the
    engines clamp differently once width overflows, which would break
    exact-sum parity)."""
    return F.col(c).cast("decimal(12,2)")


def _frac(c: str) -> F.Column:
    """Discount/tax fractions: decimal(4,2)."""
    return F.col(c).cast("decimal(4,2)")


def _one() -> F.Column:
    return F.lit(1).cast("decimal(4,2)")


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "2000-12-01") -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary for
    lineitems shipped on/before the cutoff.

    One scan, one shuffle on a 6-group key; the shipdate filter and the
    8-column projection both push into the parquet scan.
    """
    disc_price = _dec("l_extendedprice") * (_one() - _frac("l_discount"))
    charge = disc_price * (_one() + _frac("l_tax"))
    # Averages = exact decimal sum -> one double division -> round: the only
    # float op is a single IEEE divide, identical on any engine/partitioning.
    cnt = F.count(F.lit(1))
    agged = (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("__sq"),
            F.sum(_dec("l_extendedprice")).alias("__sp"),
            F.sum(disc_price).alias("__sd"),
            F.sum(charge).alias("__sc"),
            F.sum(_frac("l_discount")).alias("__sdisc"),
            cnt.alias("count_order"),
        )
    )
    n = F.col("count_order").cast("double")
    return agged.select(
        "l_returnflag", "l_linestatus",
        F.col("__sq").cast("double").alias("sum_qty"),
        F.col("__sp").cast("double").alias("sum_base_price"),
        F.col("__sd").cast("double").alias("sum_disc_price"),
        F.col("__sc").cast("double").alias("sum_charge"),
        F.round(F.col("__sq").cast("double") / n, 6).alias("avg_qty"),
        F.round(F.col("__sp").cast("double") / n, 6).alias("avg_price"),
        F.round(F.col("__sdisc").cast("double") / n, 6).alias("avg_disc"),
        F.col("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


def q3_shipping_priority(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame, segment: str = "BUILDING",
                         date: str = "1998-03-15") -> DataFrame:
    """TPC-H Q3 shape: top unshipped-revenue orders for one market segment.

    customer is small -> broadcast into orders; orders->lineitem is the one
    real shuffle join (both sides filtered before the join so the shuffle
    carries only qualifying rows).
    """
    revenue = F.sum(
        _dec("l_extendedprice") * (_one() - _frac("l_discount"))
    ).cast("double").alias("revenue")
    return (
        lineitem.where(F.col("l_shipdate") > F.lit(date).cast("timestamp_ntz"))
        .join(
            orders.where(F.col("o_orderdate") < F.lit(date).cast("timestamp_ntz")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            broadcast(customer.where(F.col("c_mktsegment") == segment)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"), "o_orderpriority")
        .agg(revenue)
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(region: DataFrame, nation: DataFrame,
                             customer: DataFrame, supplier: DataFrame,
                             orders: DataFrame, lineitem: DataFrame,
                             region_name: str = "ASIA",
                             date_from: str = "1996-01-01",
                             date_to: str = "1997-01-01") -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where customer and supplier share
    the nation. All four dims broadcast; the only shuffles are the
    orders->lineitem join and the final small agg."""
    nations = (
        broadcast(nation)
        .join(broadcast(region.where(F.col("r_name") == region_name)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    revenue = F.sum(
        _dec("l_extendedprice") * (_one() - _frac("l_discount"))
    ).cast("double").alias("revenue")
    return (
        lineitem
        .join(orders.where(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp_ntz"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(supplier),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(revenue)
        .orderBy(F.desc("revenue"), "n_name")
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Window ranking: each customer's k highest-value orders.

    row_number over (partition by custkey order by totalprice desc) -- the
    per-key top-k idiom that scales (no global sort; one hash shuffle on
    the partition key, then a per-partition sort)."""
    from pyspark.sql import Window

    w = (
        F.row_number()
        .over(Window.partitionBy("o_custkey")
              .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")))
        .alias("rank")
    )
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice", w)
        .where(F.col("rank") <= k)
        .orderBy("o_custkey", "rank")
    )


def order_priority_counts(orders: DataFrame, lineitem: DataFrame,
                          date_from: str = "1996-01-01",
                          date_to: str = "1996-04-01") -> DataFrame:
    """TPC-H Q4 shape: orders with at least one returned lineitem (the
    schema has no commit/receipt dates, so returnflag='R' plays the "late"
    predicate), counted by priority. The EXISTS becomes a left-semi join --
    no row duplication, the join carries only the key column."""
    returned = lineitem.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp_ntz")))
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def revenue_rollup(lineitem: DataFrame) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): per-group, per-flag subtotal,
    and grand total in one pass -- Catalyst expands the grouping sets and
    still runs a single partial+final hash aggregation."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def customer_set_ops(orders: DataFrame,
                     y1: str = "1996", y2: str = "1997") -> DataFrame:
    """Set operations over yearly buyer sets: customers active in y1
    INTERSECT / EXCEPT / UNION those active in y2, reported as one tagged
    union (set ops the reference lacks entirely; Catalyst plans them as
    aggregates/semi-joins, not row-by-row)."""
    def buyers(year: str) -> DataFrame:
        return orders.where(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(f"{int(year)+1}-01-01").cast("timestamp_ntz"))
        ).select("o_custkey").distinct()

    b1, b2 = buyers(y1), buyers(y2)
    tagged = (
        b1.intersect(b2).withColumn("set_op", F.lit("both"))
        .unionByName(b1.exceptAll(b2).withColumn("set_op", F.lit("only_y1")))
        .unionByName(b2.exceptAll(b1).withColumn("set_op", F.lit("only_y2")))
    )
    return (
        tagged.groupBy("set_op")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("set_op")
    )


def cumulative_order_value(orders: DataFrame) -> DataFrame:
    """Analytic-window suite per customer: running revenue total, previous
    order value (lag), and order sequence number over the order-date
    timeline."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey", "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        F.row_number().over(w).alias("order_seq"),
        F.round(F.sum(_dec("o_totalprice")).over(run).cast("double"), 2)
        .alias("running_total"),
        F.round(F.lag(_dec("o_totalprice")).over(w).cast("double"), 2)
        .alias("prev_order_value"),
    ).orderBy("o_custkey", "order_seq")


def q6_forecast_revenue(lineitem: DataFrame,
                        date_from: str = "1996-01-01",
                        date_to: str = "1997-01-01",
                        disc_lo: float = 0.02, disc_hi: float = 0.06,
                        qty_cap: float = 24.0) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, no join, no group key.
    The whole predicate pushes into the parquet scan; the aggregation is a
    single global partial+final sum."""
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz"))
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < qty_cap))
        .agg(
            F.sum(_dec("l_extendedprice") * _frac("l_discount"))
            .cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q10_returned_items(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, nation: DataFrame,
                       date_from: str = "1996-01-01",
                       date_to: str = "1996-04-01", k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top-k.
    Facts shuffle-join on orderkey; customer/nation broadcast."""
    revenue = F.sum(
        _dec("l_extendedprice") * (_one() - _frac("l_discount"))
    ).cast("double").alias("revenue")
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(orders.where(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp_ntz"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue)
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(k)
    )


def q14_promo_share(lineitem: DataFrame, part: DataFrame,
                    date_from: str = "1996-01-01",
                    date_to: str = "1996-02-01") -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a broadcast part join
    -- share of revenue from 'PROMO%' parts. Ratio of two exact decimal
    sums, single double division, rounded."""
    rev = _dec("l_extendedprice") * (_one() - _frac("l_discount"))
    promo_rev = F.sum(
        F.when(F.col("p_type").startswith("PROMO"), rev)
        .otherwise(F.lit(0).cast("decimal(17,4)")))
    total_rev = F.sum(rev)
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz")))
        .join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * promo_rev.cast("double")
                / total_rev.cast("double"), 6
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def volume_cube(lineitem: DataFrame) -> DataFrame:
    """CUBE over (returnflag, linestatus): every grouping-set combination
    (full pairs, each single dimension, grand total) in one pass."""
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def q7_volume_shipping(supplier: DataFrame, lineitem: DataFrame,
                       orders: DataFrame, customer: DataFrame,
                       nation: DataFrame,
                       nation_a: str = "NATION_1", nation_b: str = "NATION_2",
                       date_from: str = "1996-01-01",
                       date_to: str = "1998-01-01") -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year (schema has no l_shipmode, so the grouping is (supp_nation,
    cust_nation, year) only).

    Scale: supplier and customer are pre-filtered to the two nations BEFORE
    touching the facts, so the lineitem->orders shuffle only carries rows
    that can survive; both dim joins broadcast. Restricted to {A,B} on both
    sides, the TPC-H pair disjunction reduces to supp_nation != cust_nation.
    """
    pair = [nation_a, nation_b]
    n = broadcast(nation.select("n_nationkey", "n_name")
                  .where(F.col("n_name").isin(pair)))
    supp = (supplier.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cust = (customer.join(n, F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", F.col("n_name").alias("cust_nation")))
    volume = F.sum(
        _dec("l_extendedprice") * (_one() - _frac("l_discount"))
    ).cast("double").alias("revenue")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz")))
        .join(broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(volume)
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
                    orders: DataFrame, customer: DataFrame, nation: DataFrame,
                    region: DataFrame, target_nation: str = "NATION_3",
                    region_name: str = "ASIA", p_type: str = "PROMO",
                    date_from: str = "1996-01-01",
                    date_to: str = "1998-01-01") -> DataFrame:
    """TPC-H Q8 shape: the target nation's share of PROMO-part revenue sold
    into one region, per order year.

    Scale: part is filtered to one p_type and broadcast -- at 100 TB this is
    the selective probe that prunes most lineitems in the first join; the
    customer->nation->region chain collapses to one broadcast dim. Share =
    exact decimal sums, ONE double division at the end.
    """
    region_cust = (
        customer
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region.where(F.col("r_name") == region_name)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey"))
    supp_nation = (
        supplier
        .join(broadcast(nation.select(
            "n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "supp_nation"))
    volume = _dec("l_extendedprice") * (_one() - _frac("l_discount"))
    joined = (
        lineitem
        .join(broadcast(part.where(F.col("p_type") == p_type)
                        .select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.where(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp_ntz"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(region_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.year("o_orderdate").alias("o_year"),
                volume.alias("volume"), "supp_nation"))
    target = F.sum(F.when(F.col("supp_nation") == target_nation,
                          F.col("volume")).otherwise(F.lit(0).cast("decimal(12,2)")))
    return (
        joined.groupBy("o_year")
        .agg(F.round(target.cast("double")
                     / F.sum("volume").cast("double"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


def q13_customer_distribution(customer: DataFrame, orders: DataFrame,
                              excluded_priority: str = "1-URGENT") -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts, keeping
    customers with zero orders (LEFT OUTER join + count of non-null keys).
    The order-side predicate lives in the JOIN condition, not a WHERE --
    filtering after the outer join would silently drop the zero-order rows.

    Scale: two hash shuffles (join on custkey, regroup on c_count); the
    second groupBy input is |customers| rows and the output is tiny.
    """
    per_cust = (
        customer.join(
            orders.where(F.col("o_orderpriority") != excluded_priority),
            F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q17_small_quantity_revenue(lineitem: DataFrame, part: DataFrame,
                               brand: str = "Brand#23") -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below 20% of the part's average quantity) were not filled.
    The correlated scalar subquery (per-part avg over ALL lineitems of that
    part) is decorrelated by hand: groupBy(partkey) -> broadcast join back.

    Scale: the brand filter cuts `part` to ~1/25 and broadcasts; BOTH the
    per-part average and the final sum then run over only that brand's
    lineitems -- never aggregate all parts when the probe side is selective.
    """
    brand_parts = broadcast(
        part.where(F.col("p_brand") == brand).select("p_partkey"))
    brand_items = plan_cache(lineitem.join(
        brand_parts, F.col("l_partkey") == F.col("p_partkey")))
    # Exact average: decimal sum -> one double division (order-independent).
    part_avg = (
        brand_items.groupBy("l_partkey")
        .agg((F.sum(_dec("l_quantity")).cast("double")
              / F.count(F.lit(1)).cast("double")).alias("__avg_qty"))
        .select(F.col("l_partkey").alias("__pk"), "__avg_qty"))
    return (
        brand_items
        .join(broadcast(part_avg), F.col("l_partkey") == F.col("__pk"))
        .where(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0,
                     6).alias("avg_yearly"))
    )


def q18_large_volume_customers(customer: DataFrame, orders: DataFrame,
                               lineitem: DataFrame,
                               min_qty: float = 250.0) -> DataFrame:
    """TPC-H Q18 shape: customers whose single orders exceed a total
    quantity threshold. The IN-(grouped HAVING subquery) becomes
    aggregate-then-join: sum per orderkey first, keep qualifying keys, then
    enrich with orders + customer.

    Scale: the HAVING prunes to a handful of orderkeys, so the enrichment
    joins broadcast the QUALIFYING side against the big tables, not vice
    versa; top-100 runs as TakeOrdered (no global sort materialization).
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"))
        .where(F.col("sum_qty") > min_qty))
    return (
        orders.join(broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey",
                F.col("o_orderdate").cast("date").alias("o_orderdate"),
                "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


def q19_discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue from three disjunctive brand/size/quantity
    bands (schema lacks shipmode/container, so the bands use brand + p_size
    + l_quantity only).

    Scale: part is broadcast; Catalyst CNF-converts the OR so the common
    `p_brand IN (...)` and `p_size <= 35` conjuncts push into BOTH parquet
    scans, and the band residual evaluates post-join. Single scalar result.
    """
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    bands = (
        ((br == "Brand#12") & sz.between(1, 15) & q.between(1, 21))
        | ((br == "Brand#23") & sz.between(1, 25) & q.between(10, 30))
        | ((br == "Brand#15") & sz.between(1, 35) & q.between(20, 40)))
    return (
        lineitem
        .join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(bands)
        .agg(F.sum(_dec("l_extendedprice") * (_one() - _frac("l_discount")))
             .cast("double").alias("revenue"))
    )


def q22_prospect_balance(customer: DataFrame, orders: DataFrame,
                         nation: DataFrame,
                         dormant_since: str = "2000-01-01") -> DataFrame:
    """TPC-H Q22 shape: count + total balance of above-average-balance
    customers with no orders since a cutoff, per nation (schema has no
    c_phone, so the country-code grouping becomes the nation dim; the
    dormancy cutoff keeps the prospect set non-empty on this data).

    Scale: the scalar AVG is a 1-row aggregate cross-joined (broadcast) into
    the filter -- never collected to the driver; the NOT EXISTS is a
    left_anti join on custkey (hash, null-safe by construction) whose right
    side is date-pruned before the shuffle.
    """
    avg_bal = (
        customer.where(F.col("c_acctbal") > 0)
        .agg((F.sum(_dec("c_acctbal")).cast("double")
              / F.count(F.lit(1)).cast("double")).alias("__avg_bal")))
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(dormant_since).cast("timestamp_ntz"))
    return (
        customer.crossJoin(broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent.select("o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.round(F.sum(_dec("c_acctbal")).cast("double"), 2)
             .alias("totacctbal"))
        .orderBy("n_name")
    )


def order_value_percentiles(orders: DataFrame) -> DataFrame:
    """Exact p25/p50/p75/p90 of order value per order priority.

    Uses Spark's exact `percentile` aggregate (linear interpolation at
    rank (n-1)*p -- the same definition as DuckDB's quantile_cont, so the
    oracle matches bit-for-bit after 6dp rounding).

    Scale: exact percentiles require a per-group sort of the full column;
    this is the deliberate "small-cardinality group key" case (5
    priorities). For high-cardinality keys at 100 TB, switch to
    approx_percentile (t-digest, mergeable sketch, one pass).
    """
    pct = F.expr(
        "percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.9))")
    return (
        orders.groupBy("o_orderpriority")
        .agg(pct.alias("__p"),
             F.count(F.lit(1)).alias("n_orders"))
        .select(
            "o_orderpriority",
            F.round(F.col("__p")[0], 6).alias("p25"),
            F.round(F.col("__p")[1], 6).alias("p50"),
            F.round(F.col("__p")[2], 6).alias("p75"),
            F.round(F.col("__p")[3], 6).alias("p90"),
            "n_orders",
        )
        .orderBy("o_orderpriority")
    )


def totalprice_histogram(orders: DataFrame,
                         bucket_width: float = 50_000.0) -> DataFrame:
    """Fixed-width histogram of order values: bucket = floor(x / width).

    Scale: a single map-side floor + partial/final count -- the cheapest
    possible distribution profile of a 100 TB column (output is bounded by
    the value range, not the row count).
    """
    b = F.floor(F.col("o_totalprice") / F.lit(bucket_width)).alias("bucket")
    return (
        orders.groupBy(b)
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum(_dec("o_totalprice")).cast("double"), 2)
             .alias("total_value"))
        .orderBy("bucket")
    )


def lineitem_stats(lineitem: DataFrame) -> DataFrame:
    """Per-returnflag statistical profile: mean/population-stddev of
    quantity and corr(quantity, extendedprice) -- computed from
    decimal-EXACT moment sums (n, Sx, Sy, Sxx, Syy, Sxy).

    Scale rationale: built-in stddev/corr keep double accumulators whose
    result depends on partition merge order -- unreproducible across runs
    and engines. Moment sums in decimal are associative, so partial/final
    aggregation is exact on any partitioning; the textbook formulas then
    run ONCE per group in double (identical IEEE op sequence on identical
    inputs -> bit-identical everywhere), rounded at 6dp.
    """
    x, y = _dec("l_quantity"), _dec("l_extendedprice")
    agged = lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(x).alias("__sx"), F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"), F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    n = F.col("n_items").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxx, syy = F.col("__sxx").cast("double"), F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    var_x = (n * sxx - sx * sx) / (n * n)
    cov_num = n * sxy - sx * sy
    return agged.select(
        "l_returnflag", "n_items",
        F.round(sx / n, 6).alias("mean_qty"),
        F.round(F.sqrt(var_x), 6).alias("stddev_qty"),
        F.round(
            cov_num / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


def q15_top_supplier(supplier: DataFrame, lineitem: DataFrame,
                     date_from: str = "1996-01-01",
                     date_to: str = "1996-04-01") -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a quarter
    (the reference view + scalar MAX subquery, decorrelated by hand).

    Scale: revenue aggregates once per suppkey (one shuffle); the scalar
    max is a 1-row aggregate broadcast back into the filter -- never a
    driver collect, never a re-aggregation. The equality compare happens
    on the EXACT decimal revenue (comparing doubles for equality would be
    engine-dependent); double appears only in the output column.
    """
    revenue = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz")))
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_extendedprice") * (_one() - _frac("l_discount")))
             .alias("__rev")))
    max_rev = revenue.agg(F.max("__rev").alias("__max_rev"))
    return (
        revenue.crossJoin(broadcast(max_rev))
        .where(F.col("__rev") == F.col("__max_rev"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                F.col("__rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


def q21_sole_blame_supplier(supplier: DataFrame, orders: DataFrame,
                            lineitem: DataFrame) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely to blame for problem orders --
    their items came back ('R'), the order involved other suppliers, and
    NO other supplier's items came back. (Schema lacks receipt/commit
    dates, so returnflag='R' plays the "late" role, as in Q4/Q10.)

    The reference formulation is EXISTS + NOT-EXISTS correlated
    subqueries; here both collapse into ONE pair-level pre-aggregate
    (per (order, supplier): did anything come back) that feeds both the
    order profile and the returned-pairs side -- Spark reuses the
    exchange, so lineitem is scanned and shuffled ONCE. Two sibling
    countDistincts would instead trigger an Expand (row multiplication
    before the shuffle) plus a second scan for the returned side
    (measured 0.98s -> 0.74s at sf0.1).
    """
    # Explicit isNotNull on BOTH keys: the downstream joins push
    # isnotnull(l_orderkey) into the profile branch but isnotnull of both
    # keys into the returned branch -- without matching filters the two
    # subplans canonicalize differently and AQE will not reuse the pair
    # aggregate's exchange (lineitem scanned + aggregated twice).
    pairs = (
        lineitem.where(F.col("l_orderkey").isNotNull()
                       & F.col("l_suppkey").isNotNull())
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max((F.col("l_returnflag") == "R").cast("int"))
             .alias("__ret")))
    profile = (
        pairs.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("__n_supp"),
             F.sum("__ret").alias("__n_ret_supp"))
        .where((F.col("__n_supp") > 1) & (F.col("__n_ret_supp") == 1))
        .select(F.col("l_orderkey").alias("__ok")))
    returned = pairs.where(F.col("__ret") == 1).select("l_orderkey",
                                                       "l_suppkey")
    return (
        returned.join(profile, F.col("l_orderkey") == F.col("__ok"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


def order_value_percentiles_approx(orders: DataFrame,
                                   accuracy: int = 10000) -> DataFrame:
    """Sketch-based p25/p50/p75/p90 per priority: the 100 TB path that
    order_value_percentiles documents.

    `approx_percentile` (Greenwald-Khanna sketch) is single-pass and
    MERGEABLE: partial sketches combine map-side, so the shuffle carries
    one bounded sketch per (partition, group) instead of every value --
    the exact variant's per-group sort does not scale past
    small-cardinality keys. Error is <= 1/accuracy in rank terms.
    Deterministic for a fixed input + accuracy, but sketch internals are
    engine-specific -> no value-level DuckDB oracle; the driver records
    rows-only and tests/test_curation.py bounds the error against the
    exact percentiles.
    """
    pct = F.expr(
        f"approx_percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.9), "
        f"{accuracy})")
    return (
        orders.groupBy("o_orderpriority")
        .agg(pct.alias("__p"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            "o_orderpriority",
            F.round(F.col("__p")[0], 6).alias("p25"),
            F.round(F.col("__p")[1], 6).alias("p50"),
            F.round(F.col("__p")[2], 6).alias("p75"),
            F.round(F.col("__p")[3], 6).alias("p90"),
            "n_orders",
        )
        .orderBy("o_orderpriority")
    )


def q2_min_cost_supplier(region: DataFrame, nation: DataFrame,
                         supplier: DataFrame, part: DataFrame,
                         lineitem: DataFrame, r_name: str = "EUROPE",
                         min_size: int = 10, p_type: str = "STANDARD",
                         k: int = 100) -> DataFrame:
    """TPC-H Q2 shape (correlated min-cost subquery) on the driver schema.

    The testdata has no partsupp table, so the part-supplier offer relation
    is derived from lineitem: a supplier's unit cost for a part is the
    minimum observed extendedprice/quantity. The Q2 skeleton is intact:
    region-restricted suppliers, a per-part scalar MIN correlated subquery,
    and the equality join back -- decorrelated here into ONE window MIN
    over the part key (no second scan, no self-join; reference
    survey_analysis.py has no joins at all, cf. SURVEY.md §2A).

    Scale: the offers agg shuffles lineitem once on (part, supp); part /
    supplier / nation / region are broadcast; the window partitions by
    part key -- same key as the agg, so AQE coalesces without a reshuffle.
    """
    from pyspark.sql.window import Window

    unit = F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6)
    offers = (
        lineitem.where(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit).alias("unit_cost"))
    )
    sup = (
        supplier
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region.where(F.col("r_name") == r_name)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = part.where(
        (F.col("p_size") >= min_size) & (F.col("p_type") == p_type)
    ).select("p_partkey", "p_name")
    best = F.min("unit_cost").over(Window.partitionBy("p_partkey"))
    return (
        offers.join(broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("__best", best)
        .where(F.col("unit_cost") == F.col("__best"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(k)
    )


def q9_product_type_profit(part: DataFrame, supplier: DataFrame,
                           lineitem: DataFrame, orders: DataFrame,
                           nation: DataFrame,
                           name_like: str = "%widget%") -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) for parts
    whose name matches a pattern. Without partsupp there is no supplycost
    term; profit is the discounted revenue, which preserves the plan shape
    (5-way join, LIKE pushdown, year extract, two-key agg).

    Scale: part is filtered BEFORE the join and broadcast, so the LIKE
    prunes the fact scan's join fan-out; supplier/nation broadcast; the
    only shuffles are lineitem->orders (both large, sort-merge under AQE)
    and the final small agg."""
    profit = _dec("l_extendedprice") * (_one() - _frac("l_discount"))
    parts = part.where(F.col("p_name").like(name_like)).select("p_partkey")
    return (
        lineitem
        .join(broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q11_revenue_concentration(lineitem: DataFrame, part: DataFrame,
                              fraction: float = 0.00075) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds a fraction of GLOBAL
    revenue -- a group-by HAVING against a whole-table scalar.

    Scale: one shuffle for the per-part agg; the global total is a second
    partial+final agg over the SAME shuffled frame, then broadcast as a
    1-row cross join -- the fact table is scanned once (Spark reuses the
    exchange), and nothing resembling a correlated subquery survives."""
    disc_price = _dec("l_extendedprice") * (_one() - _frac("l_discount"))
    # Explicit isNotNull BEFORE the shared aggregate: the part join pushes
    # one into its branch anyway, and without it here the total branch's
    # subplan differs -> ReuseExchange declines -> lineitem scanned and
    # aggregated twice (plan-asserted in tests/test_plans.py).
    per_part = (
        lineitem.where(F.col("l_partkey").isNotNull())
        .groupBy("l_partkey")
        .agg(F.sum(disc_price).alias("__value"))
    )
    total = per_part.agg(F.sum("__value").alias("__total"))
    return (
        per_part.crossJoin(broadcast(total))
        .where(F.col("__value").cast("double")
               > F.lit(fraction) * F.col("__total").cast("double"))
        .join(broadcast(part.select("p_partkey", "p_name")),
              F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_name",
                F.col("__value").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "p_partkey")
    )


def q12_priority_lines(orders: DataFrame, lineitem: DataFrame,
                       year: int = 1996) -> DataFrame:
    """TPC-H Q12 shape: per line class, how many lines belong to
    high-priority vs low-priority orders. The schema has no l_shipmode /
    commit-receipt dates, so the group key is l_returnflag and the date
    band is the ship year -- the conditional-aggregation-after-join plan
    is identical.

    Scale: lineitem filtered by the year band at the scan, then ONE
    shuffle join to orders and a 3-group conditional agg (map-side
    partials)."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp_ntz")))
        .join(orders.select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(hi.cast("bigint")).alias("high_line_count"),
            F.sum((~hi).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q16_part_supplier_breadth(part: DataFrame, supplier: DataFrame,
                              lineitem: DataFrame,
                              brand_excl: str = "Brand#5",
                              type_excl: str = "PROMO",
                              sizes: tuple[int, ...] = (1, 4, 9, 14, 19, 23,
                                                        36, 45),
                              ) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier breadth per (brand, type, size),
    excluding a brand/type/size slice and a supplier blocklist. partsupp
    is derived as the distinct (part, supplier) pairs in lineitem; the
    complaint-supplier NOT IN becomes an anti-join on negative-balance
    suppliers.

    Scale: the pair-distinct is the only fact shuffle (on the same
    composite key the count-distinct then groups by); the blocklist is a
    broadcast anti-join; part is a broadcast inner join."""
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    blocked = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.where(
        (F.col("p_brand") != brand_excl) & (F.col("p_type") != type_excl)
        & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(broadcast(blocked),
                   F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q20_dominant_part_suppliers(supplier: DataFrame, nation: DataFrame,
                                part: DataFrame, lineitem: DataFrame,
                                name_like: str = "red%", year: int = 1996,
                                share: float = 0.2) -> DataFrame:
    """TPC-H Q20 shape: suppliers who hold an outsized position in some
    pattern-matched part. Without partsupp availability, the inner
    correlated subquery ("availqty > 1/2 the year's shipments") becomes:
    supplier's shipped quantity of the part that year > ``share`` of the
    part's total -- same nested-aggregate -> semi-join -> dim-join
    skeleton.

    Scale: one shuffle aggregates (part, supplier, qty); the per-part
    total is a window over the part key (no second scan); the supplier
    list is a semi-join distinct, then nation broadcast."""
    from pyspark.sql.window import Window

    parts = part.where(F.col("p_name").like(name_like)).select("p_partkey")
    year_lines = lineitem.where(
        (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp_ntz")))
    per_pair = (
        year_lines
        .join(broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("__qty"))
    )
    part_total = F.sum("__qty").over(Window.partitionBy("l_partkey"))
    dominant = (
        per_pair.withColumn("__total", part_total)
        .where(F.col("__qty").cast("double")
               > F.lit(share) * F.col("__total").cast("double"))
        .select("l_suppkey").distinct()
    )
    return (
        supplier.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"),
                      "left_semi")
        .join(broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "s_acctbal", "n_name")
        .orderBy("s_name")
    )


def totalprice_equidepth(orders: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Equi-DEPTH histogram of order values: ntile buckets with equal row
    counts and data-driven boundaries -- the complement of the fixed-width
    totalprice_histogram, and what query optimizers actually keep.

    The exact form needs a total order (ntile over a global window =
    one-partition sort), which is fine at report grain but NOT the 100 TB
    path; at scale compute cut points with approx_percentile (mergeable GK
    sketch, see order_value_percentiles_approx) and assign buckets with a
    range predicate -- scan-parallel, no global sort. Ties order
    deterministically by (price, orderkey) so bucket assignment is stable
    and oracle-comparable.
    """
    from pyspark.sql.window import Window

    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            F.ntile(n_buckets).over(w).alias("bucket"),
            F.col("o_totalprice"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
            F.round(F.sum(_dec("o_totalprice")).cast("double"), 2)
            .alias("total_value"),
        )
        .orderBy("bucket")
    )


def customer_rfm(orders: DataFrame, n_tiles: int = 4) -> DataFrame:
    """RFM segmentation: per customer recency (last order date), frequency
    (order count), monetary (revenue), each scored into quartiles, plus
    the combined RFM class -- the standard customer-value report.

    One fact-table aggregate to customer grain, then three ntile windows
    over the (already small) customer frame. Deterministic tie-breaks by
    custkey; quartile 4 = most recent / most frequent / highest spend.
    Same scale note as totalprice_equidepth: swap ntile for
    approx-percentile cut points when the customer frame stops being
    report-sized.
    """
    from pyspark.sql.window import Window

    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(_dec("o_totalprice")).alias("__rev"),
    )
    r_w = Window.orderBy("last_order", "o_custkey")
    f_w = Window.orderBy("frequency", "o_custkey")
    m_w = Window.orderBy("__rev", "o_custkey")
    return (
        per_cust.select(
            "o_custkey",
            F.col("last_order").cast("date").alias("last_order"),
            "frequency",
            F.col("__rev").cast("double").alias("monetary"),
            F.ntile(n_tiles).over(r_w).alias("r_score"),
            F.ntile(n_tiles).over(f_w).alias("f_score"),
            F.ntile(n_tiles).over(m_w).alias("m_score"),
        )
        .withColumn(
            "rfm",
            F.concat_ws("", F.col("r_score"), F.col("f_score"),
                        F.col("m_score")),
        )
        .orderBy("o_custkey")
    )


def customer_pareto(orders: DataFrame, a_cut: float = 0.5,
                    b_cut: float = 0.8) -> DataFrame:
    """Pareto / ABC analysis: customers ranked by revenue with each one's
    cumulative share of the total, classed A (first ``a_cut`` of revenue),
    B (to ``b_cut``), else C -- the classic concentration report.

    Exact-decimal discipline: per-customer sums and the running cumulative
    are decimal (associative, partition-order independent); the share is
    ONE double division rounded at 6dp. The global total rides along as a
    window over an empty partition -- on the already-aggregated customer
    frame (|customers| rows), not the fact table, so the single-partition
    window is bounded. Ties rank deterministically by (revenue desc,
    custkey).
    """
    from pyspark.sql.window import Window

    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.sum(_dec("o_totalprice")).alias("__rev"))
    )
    w_rank = Window.orderBy(F.desc("__rev"), "o_custkey")
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    share = F.round(
        F.sum("__rev").over(w_cum).cast("double")
        / F.sum("__rev").over(w_all).cast("double"), 6)
    return (
        per_cust.select(
            "o_custkey",
            F.col("__rev").cast("double").alias("revenue"),
            F.row_number().over(w_rank).cast("int").alias("rank"),
            share.alias("cum_share"),
        )
        .select(
            "o_custkey", "revenue", "rank", "cum_share",
            F.when(F.col("cum_share") <= a_cut, "A")
            .when(F.col("cum_share") <= b_cut, "B")
            .otherwise("C").alias("abc_class"),
        )
        .orderBy("rank")
    )


def revenue_grouping_sets(orders: DataFrame, customer: DataFrame,
                          nation: DataFrame) -> DataFrame:
    """Arbitrary GROUPING SETS -- (nation, year), (nation), (year), () --
    in ONE aggregation pass with grouping_id() disambiguating subtotal
    rows from genuine NULL keys. Completes the grouping-family coverage
    next to rollup (revenue_rollup) and cube (volume_cube); unlike those,
    the sets here are not a lattice prefix, which only GROUPING SETS can
    express. Dimension joins broadcast (customer/nation are small);
    Catalyst expands the sets before one partial+final hash agg."""
    joined = (
        orders
        .join(F.broadcast(customer),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.year("o_orderdate").cast("int").alias("o_year"),
            _dec("o_totalprice").alias("__price"),
        )
    )
    return (
        joined.groupingSets(
            [["n_name", "o_year"], ["n_name"], ["o_year"], []],
            "n_name", "o_year")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("__price").cast("double").alias("revenue"),
        )
        .select("gid", "n_name", "o_year", "n_orders", "revenue")
        .orderBy(F.col("gid"),
                 F.col("n_name").asc_nulls_first(),
                 F.col("o_year").asc_nulls_first())
    )


def basket_association_rules(lineitem: DataFrame, part: DataFrame,
                             min_pair_baskets: int = 5) -> DataFrame:
    """Market-basket association rules over order baskets: for every
    UNORDERED brand pair bought together in at least
    ``min_pair_baskets`` orders, the classic trio --
    support = P(a,b), confidence = P(b|a), lift = P(a,b)/(P(a)P(b)) --
    the co-purchase / recommendation primitive.

    Scale shape: baskets collapse to DISTINCT (order, brand) FIRST
    (one hash shuffle on the order key, at most |brands| rows per
    basket), pairs explode via a self-join ON THE ORDER KEY -- cost is
    sum over baskets of (distinct brands choose 2), bounded by basket
    width squared, never |orders|^2 -- and the per-brand counts
    broadcast back onto the tiny pair table. The part dimension is
    broadcast into the fact scan.

    Pairs are canonicalized brand_a < brand_b; confidence is reported
    for the a->b direction (the b->a row is the mirror with the same
    support/lift). All ratios round to 6dp for cross-engine parity."""
    items = (lineitem.join(broadcast(part.select("p_partkey", "p_brand")),
                           lineitem["l_partkey"] == F.col("p_partkey"))
             .select(F.col("l_orderkey").alias("okey"),
                     F.col("p_brand").alias("brand"))
             .distinct())
    n_baskets = items.select("okey").distinct().count()
    brand_n = items.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n"))
    pairs = (items.alias("a").join(items.alias("b"), "okey")
             .where(F.col("a.brand") < F.col("b.brand"))
             .groupBy(F.col("a.brand").alias("brand_a"),
                      F.col("b.brand").alias("brand_b"))
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .where(F.col("n_ab") >= min_pair_baskets))
    return (pairs
            .join(broadcast(brand_n.select(
                F.col("brand").alias("brand_a"),
                F.col("n").alias("n_a"))), "brand_a")
            .join(broadcast(brand_n.select(
                F.col("brand").alias("brand_b"),
                F.col("n").alias("n_b"))), "brand_b")
            .select(
                "brand_a", "brand_b", "n_ab", "n_a", "n_b",
                F.round(F.col("n_ab") / F.lit(float(n_baskets)), 6)
                .alias("support"),
                F.round(F.col("n_ab") / F.col("n_a"), 6)
                .alias("confidence"),
                F.round(F.col("n_ab") * F.lit(float(n_baskets))
                        / (F.col("n_a") * F.col("n_b")), 6)
                .alias("lift"))
            .orderBy("brand_a", "brand_b"))
