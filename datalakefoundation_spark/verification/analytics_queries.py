"""Analytics breadth queries (EXTRA surface): the join/subquery shapes the
TPC-H suite exercises that the registry's windows don't yet cover —
correlated scalar subqueries, group-HAVING semi-joins, NOT-IN anti-joins,
nested EXISTS chains — plus an event-funnel analysis. Each is a Spark
formulation with the idiomatic DECORRELATED plan (Catalyst rewrites the
subquery forms into exactly these joins; writing the join makes the scale
shape explicit) and a DuckDB oracle written in the subquery style, so the
pair proves the decorrelation is semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _read(spark, sf_dir, name):
    from datalakefoundation_spark.verification.io import read_table

    return read_table(spark, sf_dir, name)


# --------------------------------------------------- Q17: correlated scalar
def q_small_quantity_lineitems(spark, sf_dir):
    """TPC-H Q17 shape — lineitems with quantity below 60% of their PART's
    mean quantity. The correlated scalar subquery decorrelates into one
    per-part aggregate joined back (broadcast-eligible: one row per part);
    the fact table is scanned once per side, and AQE reuses the exchange.

    Outputs are count + quantity sum: quantities are integer-valued, so
    the double arithmetic is EXACT and order-independent across engines
    (a revenue sum over cent-valued doubles is ulp-order-dependent — the
    one formulation a bit-exact cross-engine gate cannot use)."""
    li = _read(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    per_part = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.6).alias("__thr")
    )
    return (
        li.join(per_part, "l_partkey")
        .where(F.col("l_quantity") < F.col("__thr"))
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.sum("l_quantity").cast("long").alias("sum_small_qty"),
        )
    )


SQL_SMALL_QUANTITY_LINEITEMS = """
SELECT count(*) AS n_small,
       CAST(sum(l_quantity) AS BIGINT) AS sum_small_qty
FROM lineitem l1
WHERE l_quantity < (
  SELECT 0.6 * avg(l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l1.l_partkey
)
"""


# --------------------------------------------------- Q18: HAVING semi-join
def q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape — customers with any order whose total quantity
    exceeds 250: the HAVING subquery becomes an aggregate on the fact
    table followed by semi-join-style inner joins back to orders/customer
    (both sides of the final join are order-count sized)."""
    li = _read(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
    )


SQL_LARGE_VOLUME_CUSTOMERS = """
SELECT c_name, o_custkey AS custkey, o_orderkey AS orderkey,
       o_orderdate AS orderdate, o_totalprice AS totalprice, t.total_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
) t ON t.l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
"""


# --------------------------------------------------- NOT IN anti-join
def q_never_urgent_customers(spark, sf_dir):
    """Customers with at least one order but NO urgent ones: the NOT IN
    subquery is a LEFT ANTI join on the urgent-customer key set — both
    subquery sides reduce to distinct key projections before joining, so
    only one slim column shuffles."""
    orders = _read(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    any_order = orders.select("o_custkey").distinct()
    urgent = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        any_order.join(urgent, "o_custkey", "left_anti")
        .join(cust, any_order.o_custkey == cust.c_custkey)
        .select(F.col("c_custkey").alias("custkey"), "c_name")
    )


SQL_NEVER_URGENT_CUSTOMERS = """
SELECT c_custkey AS custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
  AND c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  )
"""


# --------------------------------------------------- Q20-like EXISTS chain
def q_high_volume_suppliers(spark, sf_dir):
    """Suppliers that shipped any HIGH-VOLUME part (total shipped quantity
    over all suppliers > 400) — the nested EXISTS chain becomes two
    stacked semi-joins: fact -> big-part keys (aggregate, broadcastable)
    -> distinct supplier keys -> supplier dim."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    big_parts = (
        li.groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 400)
        .select("l_partkey")
    )
    supp_keys = (
        li.join(big_parts, "l_partkey").select("l_suppkey").distinct()
    )
    supp = _read(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supp.join(supp_keys, supp.s_suppkey == supp_keys.l_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select(F.col("s_suppkey").alias("suppkey"), "s_name", "n_name")
    )


SQL_HIGH_VOLUME_SUPPLIERS = """
SELECT s_suppkey AS suppkey, s_name, n_name
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s_suppkey
    AND EXISTS (
      SELECT 1 FROM (
        SELECT l_partkey, sum(l_quantity) AS q FROM lineitem GROUP BY l_partkey
      ) b WHERE b.l_partkey = l.l_partkey AND b.q > 400
    )
)
"""


# --------------------------------------------------- event funnel
FUNNEL = ("view", "click", "purchase")


def q_event_funnel(spark, sf_dir):
    """Ordered funnel conversion: per user, did a view happen, then a
    click strictly after the first view, then a purchase strictly after
    that click? Staged conditional-min aggregates: each stage is one
    fact-table pass joined against the (user-count-sized) previous-stage
    table — never a per-user collect_list, so a power user with millions
    of events costs nothing beyond their scan share, and never an
    event-to-event self-join. Output: users reaching each stage."""
    from datalakefoundation_spark.verification.core_queries import read_events

    ev = read_events(spark, sf_dir).select("user_id", "event_type", "ts_ns")
    u0 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == FUNNEL[0], F.col("ts_ns"))).alias("t0")
    )
    u1 = (
        ev.join(u0, "user_id")
        .groupBy("user_id", "t0")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == FUNNEL[1]) & (F.col("ts_ns") > F.col("t0")),
                    F.col("ts_ns"),
                )
            ).alias("t1")
        )
    )
    u2 = (
        ev.join(u1, "user_id")
        .groupBy("user_id", "t0", "t1")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == FUNNEL[2]) & (F.col("ts_ns") > F.col("t1")),
                    F.col("ts_ns"),
                )
            ).alias("t2")
        )
    )
    return u2.agg(
        F.count(F.col("t0")).alias("reached_view"),
        F.count(F.col("t1")).alias("reached_click"),
        F.count(F.col("t2")).alias("reached_purchase"),
    )


SQL_EVENT_FUNNEL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) * 1000 AS ts_ns FROM events
),
u AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts_ns END) AS t0
  FROM ev GROUP BY user_id
),
c AS (
  SELECT u.user_id, u.t0, min(e.ts_ns) AS t1
  FROM u LEFT JOIN ev e
    ON e.user_id = u.user_id AND e.event_type = 'click' AND e.ts_ns > u.t0
  GROUP BY u.user_id, u.t0
),
p AS (
  SELECT c.user_id, c.t0, c.t1, min(e.ts_ns) AS t2
  FROM c LEFT JOIN ev e
    ON e.user_id = c.user_id AND e.event_type = 'purchase' AND e.ts_ns > c.t1
  GROUP BY c.user_id, c.t0, c.t1
)
SELECT count(t0) AS reached_view,
       count(t1) AS reached_click,
       count(t2) AS reached_purchase
FROM p
"""


EXTRA = {
    # rotated OUT in r9 (driver-green r7+r8; anti-join shape stays
    # window-covered by q_delete_inference's left_anti and the other three
    # analytics rows) to free a seat for the never-driver-verified X52/X53
    # streaming front-ends per the steady-state policy:
    "q_never_urgent_customers": (
        q_never_urgent_customers, SQL_NEVER_URGENT_CUSTOMERS
    ),
}


# q_event_funnel rotated IN for r6 (first driver exposure, green); the four
# subquery-shape rows rotated IN for r7 to finish the first-time-verification
# ledger (VERDICT r6 directive #1); q_never_urgent_customers rotated OUT r9.
QUERIES = {
    "q_event_funnel": (q_event_funnel, SQL_EVENT_FUNNEL),
    "q_small_quantity_lineitems": (
        q_small_quantity_lineitems, SQL_SMALL_QUANTITY_LINEITEMS
    ),
    "q_large_volume_customers": (
        q_large_volume_customers, SQL_LARGE_VOLUME_CUSTOMERS
    ),
    "q_high_volume_suppliers": (q_high_volume_suppliers, SQL_HIGH_VOLUME_SUPPLIERS),
}
