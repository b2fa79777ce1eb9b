"""Relational query surface over the TESTDATA star schema.

The reference has no relational operators at all (SURVEY.md §2.3) — this
module is the Spark-harness side: the aggregation/join/window/set-op
repertoire a corpus-metrics layer needs, each expressed declaratively so
Catalyst plans it (broadcast joins for dims, partial aggregation,
TakeOrderedAndProject for top-k), and each with a DuckDB oracle mirror.

Conventions for oracle comparability:
* every computed column is aliased identically in Spark and SQL;
* double aggregates are rounded (sum→2dp, avg/ratio→4dp) to absorb
  accumulation-order drift;
* timestamps are formatted to strings at the boundary;
* every result has a deterministic total order where LIMIT is used.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["RELATIONAL_QUERIES", "RELATIONAL_SQL"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- Q1: pricing summary (TPC-H Q1 shape: scan + filter + hash agg) -------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING = """
select l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                          as sum_qty,
       round(sum(l_extendedprice), 2)                     as sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)  as sum_disc_price,
       round(avg(l_quantity), 4)                          as avg_qty,
       round(avg(l_discount), 4)                          as avg_disc,
       count(*)                                           as count_order
from lineitem
where l_shipdate <= timestamp '1998-09-02'
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus
"""


# --- Q3: shipping priority (3-way join + top-k) -----------------------------

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey",
                 F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                 "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


SQL_SHIPPING = """
select l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') as orderdate,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
from lineitem
join orders   on l_orderkey = o_orderkey
join customer on o_custkey  = c_custkey
where c_mktsegment = 'BUILDING'
group by 1, 2, 3
order by revenue desc, l_orderkey
limit 10
"""


# --- Q5-ish: revenue by region/nation (5-way star join) ---------------------

def q_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
             F.count("*").alias("n_items"))
        .orderBy("r_name", "n_name")
    )


SQL_REGION = """
select r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
       count(*) as n_items
from lineitem
join supplier on l_suppkey   = s_suppkey
join nation   on s_nationkey = n_nationkey
join region   on n_regionkey = r_regionkey
group by r_name, n_name
order by r_name, n_name
"""


# --- window: latest order per customer (dedup-by-key pattern) ---------------

def q_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy("o_custkey")
    )


SQL_LATEST_ORDER = """
select o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') as orderdate,
       round(o_totalprice, 2) as totalprice
from (select *, row_number() over (partition by o_custkey
                                   order by o_orderdate desc, o_orderkey desc) rn
      from orders)
where rn = 1
order by o_custkey
"""


# --- window: running revenue per customer (frame-based window agg) ----------

def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        orders.select(
            "o_custkey", "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"))
        .filter(F.col("o_custkey") < 100)
        .orderBy("o_custkey", "o_orderkey")
    )


SQL_RUNNING = """
select o_custkey, o_orderkey,
       round(sum(o_totalprice) over (partition by o_custkey
                                     order by o_orderdate, o_orderkey
                                     rows between unbounded preceding and current row), 2)
         as running_total
from orders
where o_custkey < 100
order by o_custkey, o_orderkey
"""


# --- rollup: multi-level aggregate ------------------------------------------

def q_rollup_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders", "total")
        .orderBy("status", "priority")
    )


SQL_ROLLUP = """
select coalesce(o_orderstatus, 'ALL')   as status,
       coalesce(o_orderpriority, 'ALL') as priority,
       count(*) as n_orders,
       round(sum(o_totalprice), 2) as total
from orders
group by rollup(o_orderstatus, o_orderpriority)
order by status, priority
"""


def q_cube_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, returnflag): all 2² grouping sets in one
    map-side-combinable aggregation — the grouping-sets sibling of the
    rollup above (Catalyst expands to a single Expand + HashAggregate)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return (
        joined.cube("o_orderstatus", "l_returnflag")
        .agg(F.count("*").alias("n_items"),
             F.round(F.sum("l_extendedprice"), 2).alias("gross"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            "n_items", "gross")
        .orderBy("status", "returnflag")
    )


SQL_CUBE = """
select coalesce(o_orderstatus, 'ALL') as status,
       coalesce(l_returnflag, 'ALL')  as returnflag,
       count(*) as n_items,
       round(sum(l_extendedprice), 2) as gross
from lineitem join orders on l_orderkey = o_orderkey
group by cube(o_orderstatus, l_returnflag)
order by status, returnflag
"""


# --- anti join: customers with no urgent orders (the resume-diff pattern) ---
# (predicate chosen so the result is non-vacuous on the driver testdata:
# every customer has *some* order, ~14% have no 1-URGENT order)

def q_customers_no_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


SQL_NO_URGENT = """
select c_custkey, c_name from customer
where c_custkey not in (select o_custkey from orders
                        where o_orderpriority = '1-URGENT')
order by c_custkey
"""


# --- semi join: parts that shipped ------------------------------------------

def q_parts_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("p_brand")
    )


SQL_PARTS_SHIPPED = """
select p_brand, count(*) as n_parts
from part
where p_partkey in (select l_partkey from lineitem)
group by p_brand
order by p_brand
"""


# --- set op: nations supplying but not buying --------------------------------

def q_supplier_only_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nations with an in-debt supplier but no deeply-in-debt customer —
    # thresholds picked so the set difference is non-empty on the testdata
    sup = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") < -900)
    return (
        sup.select(F.col("s_nationkey").alias("nationkey")).distinct()
        .exceptAll(cust.select(F.col("c_nationkey").alias("nationkey")).distinct())
        .orderBy("nationkey")
    )


SQL_SUPPLIER_ONLY = """
select distinct s_nationkey as nationkey from supplier where s_acctbal < 0
except
select distinct c_nationkey as nationkey from customer where c_acctbal < -900
order by nationkey
"""


# --- events: sessionization via gap windows ----------------------------------

def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic: timezone-independent (TIMESTAMP_NTZ-safe in
    # both engines, unlike epoch casts)
    gap = F.col("ts") - F.lag("ts").over(w)
    new_sess = F.when(gap.isNull() | (gap > F.expr("INTERVAL '1800' SECOND")),
                      1).otherwise(0)
    sess = (
        ev.withColumn("new_sess", new_sess)
        .withColumn("session_no", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    return (
        sess.groupBy("user_id")
        .agg(F.max("session_no").alias("n_sessions"),
             F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("user_id")
    )


SQL_SESSIONS = """
with marked as (
  select user_id, value,
         case when lag(ts) over w is null
                or ts - lag(ts) over w > interval 1800 second
              then 1 else 0 end as new_sess
  from events
  window w as (partition by user_id order by ts, event_id)
),
sess as (
  select user_id, value,
         sum(new_sess) over (partition by user_id
                             rows between unbounded preceding and current row)
           as session_no
  from marked
)
select user_id,
       -- ::bigint — DuckDB's windowed sum() yields HUGEINT; Spark yields BIGINT
       max(session_no)::bigint as n_sessions, count(*) as n_events,
       round(sum(value), 2)::double as total_value
from sess
group by user_id
order by user_id
"""


# --- events: conditional pivot by type ---------------------------------------

def q_event_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase"]
    aggs = [F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
            for t in types]
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(*aggs, F.count("*").alias("n_total"))
        .orderBy("day")
    )


SQL_EVENT_MATRIX = """
select strftime(ts, '%Y-%m-%d') as day,
       -- ::bigint — DuckDB sum(int) yields HUGEINT; Spark's sum(when) yields BIGINT
       sum(case when event_type = 'click'    then 1 else 0 end)::bigint as n_click,
       sum(case when event_type = 'view'     then 1 else 0 end)::bigint as n_view,
       sum(case when event_type = 'purchase' then 1 else 0 end)::bigint as n_purchase,
       count(*) as n_total
from events
group by 1
order by day
"""


# --- Q14-ish: promo revenue share (conditional agg over a join) --------------

def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(F.round(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            * 100.0 / F.sum(rev), 4).alias("promo_pct"),
            F.count("*").alias("n_items"))
    )


SQL_PROMO = """
select round(sum(case when p_type = 'PROMO'
                      then l_extendedprice * (1 - l_discount)
                      else 0.0 end) * 100.0 /
             sum(l_extendedprice * (1 - l_discount)), 4) as promo_pct,
       count(*) as n_items
from lineitem join part on l_partkey = p_partkey
"""


# --- Q17-ish: small-quantity orders vs per-part average (correlated agg) -----

def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems whose quantity is below half their part's
    average quantity — the TPC-H Q17 shape: a per-key aggregate joined
    back to the fact table (Catalyst plans the decorrelated form; the
    per-part avg side is tiny and broadcasts)."""
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = (li.groupBy(F.col("l_partkey").alias("ap"))
               .agg(F.avg("l_quantity").alias("aq")))
    return (
        li.join(F.broadcast(avg_qty), li.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
             F.count("*").alias("n_small"))
    )


SQL_SMALL_QTY = """
select round(sum(l_extendedprice), 2) as revenue,
       count(*) as n_small
from lineitem l
join (select l_partkey as ap, avg(l_quantity) as aq
      from lineitem group by 1) a on l.l_partkey = a.ap
where l.l_quantity < 0.5 * a.aq
"""


# --- Q13 shape: order-count distribution (left outer join + 2-level agg) ----

def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed N orders, including N=0 — the TPC-H
    Q13 shape: LEFT OUTER join (zero-order customers must survive),
    count of the nullable side, then a second aggregation over the
    counts.  Both aggs are map-side combinable; the join key is the
    customer key so one exchange serves join + first agg."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


SQL_ORDER_DIST = """
select c_count, count(*) as custdist
from (select c_custkey, count(o_orderkey) as c_count
      from customer left outer join orders on c_custkey = o_custkey
      group by c_custkey)
group by c_count
order by custdist desc, c_count desc
"""


# --- Q15 shape: top supplier(s) by revenue (agg + correlated max) -----------

def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) achieving the maximum lineitem revenue — the TPC-H
    Q15 shape: an aggregate view joined against its own max.  Revenue is
    rounded BEFORE the max comparison so the equality is stable across
    engines; the 1-row max side broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(F.round(F.sum(F.col("l_extendedprice")
                                  * (1 - F.col("l_discount"))), 2)
                    .alias("total_revenue")))
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    return (sup.join(revenue, sup.s_suppkey == F.col("supplier_no"))
            .join(F.broadcast(max_rev),
                  F.col("total_revenue") == F.col("mr"))
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


SQL_TOP_SUPPLIER = """
with revenue as (
  select l_suppkey as supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) as total_revenue
  from lineitem group by l_suppkey)
select s_suppkey, s_name, total_revenue
from supplier join revenue on s_suppkey = supplier_no
where total_revenue = (select max(total_revenue) from revenue)
order by s_suppkey
"""


# --- Q22 shape: rich customers with no orders (scalar subquery + anti join) -

def q_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose balance exceeds the average positive balance and
    who placed no order in the corpus's final year — the TPC-H Q22
    shape: a scalar aggregate subquery (broadcast 1-row cross join)
    filtering into a LEFT ANTI join.  The anti join shuffles only the
    customer key column.  (Plain "never ordered" is vacuous on this
    dataset — every customer has orders — so the anti side is
    date-restricted to keep the oracle non-trivial.)"""
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01"))
    avg_bal = (cust.filter(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("ab")))
    return (cust.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("ab"))
            .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
            .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
            .orderBy("c_custkey"))


SQL_RICH_IDLE = """
select c_custkey, round(c_acctbal, 2) as acctbal
from customer
where c_acctbal > (select avg(c_acctbal) from customer where c_acctbal > 0)
  and not exists (select 1 from orders
                  where o_custkey = c_custkey
                    and o_orderdate >= timestamp '1998-01-01')
order by c_custkey
"""


# --- corpus stats on documents ------------------------------------------------

def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.round(F.avg("n_chars"), 4).alias("avg_chars"),
             F.min("doc_id").alias("min_id"),
             F.max("doc_id").alias("max_id"))
        .orderBy("lang")
    )


SQL_CORPUS = """
select lang, count(*) as n_docs, round(avg(n_chars), 4) as avg_chars,
       min(doc_id) as min_id, max(doc_id) as max_id
from documents
group by lang
order by lang
"""


# --- Q4 shape: EXISTS with a correlated inequality (left-semi join) --------

def q_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one lineitem shipped >60 days after the order
    date, counted per priority — the TPC-H Q4 shape: a correlated EXISTS
    that Catalyst decorrelates into a LEFT SEMI join carrying the extra
    inequality predicate.  The semi join shuffles only the two key/date
    columns; the count is map-side combinable."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_late"))
            .orderBy("o_orderpriority"))


SQL_LATE_PRIORITY = """
select o_orderpriority, count(*) as n_late
from orders o
where exists (select 1 from lineitem l
              where l.l_orderkey = o.o_orderkey
                and l.l_shipdate > o.o_orderdate + interval 60 day)
group by o_orderpriority
order by o_orderpriority
"""


# --- Q18 shape: HAVING subquery joined back to the facts (top-k) ------------

def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ten largest-value orders whose total quantity exceeds 250 —
    the TPC-H Q18 shape: a grouped HAVING filter re-joined to orders and
    customers, then a top-k.  The having side reduces lineitem to ~0.2%
    of orders before the joins; Spark plans the final order+limit as
    TakeOrderedAndProject (no full sort at 100 TB)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    qty = (li.groupBy("l_orderkey")
           .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
           .filter(F.col("total_qty") > 250.0))
    return (orders.join(qty, orders.o_orderkey == qty.l_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .select("c_name", "o_orderkey", "o_totalprice", "total_qty")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(10))


SQL_BIG_ORDERS = """
with qty as (
  select l_orderkey, round(sum(l_quantity), 2) as total_qty
  from lineitem group by l_orderkey
  having round(sum(l_quantity), 2) > 250.0)
select c_name, o_orderkey, o_totalprice, total_qty
from orders
join qty on o_orderkey = qty.l_orderkey
join customer on o_custkey = c_custkey
order by o_totalprice desc, o_orderkey
limit 10
"""


# --- Q11 shape: scalar aggregate subquery as a selection threshold ----------

def q_hot_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts appearing in >1.5× the average number of lineitems — the
    TPC-H Q11 shape: an aggregate compared against a scalar aggregate of
    the same view.  The 1-row average broadcasts (a cross join with a
    literal-sized side); counts are exact integers so the threshold
    comparison is bit-identical across engines."""
    li = _t(spark, sf_dir, "lineitem")
    cnt = li.groupBy("l_partkey").agg(F.count("*").alias("n_items"))
    avg1 = cnt.agg(F.avg("n_items").alias("avg_items"))
    return (cnt.join(F.broadcast(avg1),
                     F.col("n_items") > 1.5 * F.col("avg_items"))
            .select("l_partkey", "n_items")
            .orderBy(F.col("n_items").desc(), F.col("l_partkey")))


SQL_HOT_PARTS = """
with cnt as (select l_partkey, count(*) as n_items
             from lineitem group by l_partkey)
select l_partkey, n_items
from cnt
where n_items > 1.5 * (select avg(n_items) from cnt)
order by n_items desc, l_partkey
"""


# --- distinct aggregation (Expand-based count-distinct per group) -----------

def q_priority_customer_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers and order count per priority — exercises the
    count-DISTINCT plan (Spark's Expand + two-phase aggregate).  Both
    metrics stay map-side partial-aggregable after the expand."""
    orders = _t(spark, sf_dir, "orders")
    return (orders.groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey").alias("n_customers"),
                 F.count("*").alias("n_orders"))
            .orderBy("o_orderpriority"))


SQL_PRIORITY_BREADTH = """
select o_orderpriority,
       count(distinct o_custkey) as n_customers,
       count(*) as n_orders
from orders
group by o_orderpriority
order by o_orderpriority
"""


RELATIONAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pricing_summary": q_pricing_summary,
    "shipping_priority": q_shipping_priority,
    "region_volume": q_region_volume,
    "latest_order_per_customer": q_latest_order,
    "running_revenue": q_running_revenue,
    "rollup_status": q_rollup_status,
    "cube_status": q_cube_status,
    "customers_no_urgent_orders": q_customers_no_urgent_orders,
    "parts_shipped": q_parts_shipped,
    "supplier_only_nations": q_supplier_only_nations,
    "event_sessions": q_event_sessions,
    "event_type_matrix": q_event_type_matrix,
    "promo_revenue": q_promo_revenue,
    "small_quantity_revenue": q_small_quantity_revenue,
    "order_count_distribution": q_order_count_distribution,
    "top_supplier": q_top_supplier,
    "rich_idle_customers": q_rich_idle_customers,
    "late_order_priority": q_late_order_priority,
    "big_orders": q_big_orders,
    "hot_parts": q_hot_parts,
    "priority_customer_breadth": q_priority_customer_breadth,
    "corpus_stats": q_corpus_stats,
}

RELATIONAL_SQL: dict[str, str] = {
    "pricing_summary": SQL_PRICING,
    "shipping_priority": SQL_SHIPPING,
    "region_volume": SQL_REGION,
    "latest_order_per_customer": SQL_LATEST_ORDER,
    "running_revenue": SQL_RUNNING,
    "rollup_status": SQL_ROLLUP,
    "cube_status": SQL_CUBE,
    "customers_no_urgent_orders": SQL_NO_URGENT,
    "parts_shipped": SQL_PARTS_SHIPPED,
    "supplier_only_nations": SQL_SUPPLIER_ONLY,
    "event_sessions": SQL_SESSIONS,
    "event_type_matrix": SQL_EVENT_MATRIX,
    "promo_revenue": SQL_PROMO,
    "small_quantity_revenue": SQL_SMALL_QTY,
    "order_count_distribution": SQL_ORDER_DIST,
    "top_supplier": SQL_TOP_SUPPLIER,
    "rich_idle_customers": SQL_RICH_IDLE,
    "late_order_priority": SQL_LATE_PRIORITY,
    "big_orders": SQL_BIG_ORDERS,
    "hot_parts": SQL_HOT_PARTS,
    "priority_customer_breadth": SQL_PRIORITY_BREADTH,
    "corpus_stats": SQL_CORPUS,
}
