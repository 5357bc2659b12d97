"""SQL-oracle-checkable operator twins (SURVEY.md §2 "driver checks").

Every operator shape the engine uses on imagery has a scalar twin here,
exercised on the driver's TPC-H-ish parquet tables and verified against a
DuckDB oracle (``__spark_entry__.queries()`` / ``oracle_sql()``).  Each
entry is a pair: a DataFrame-API implementation (so Catalyst sees a
declarative plan — pushdown/pruning/broadcast are visible in ``explain``)
and the equivalent ANSI SQL string for DuckDB.

Conventions for driver-compare stability:
* every computed column is aliased identically on both sides;
* float aggregates are rounded to 6 decimals on both sides;
* no raw timestamps in outputs (epoch seconds / years instead);
* deterministic tiebreaks on every window/top-k.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table, local_df
from .registry import QUERIES, register  # noqa: F401  (re-export for tests)


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# §2.2 projections / filters / predicates
# ---------------------------------------------------------------------------


@register(
    "filter_in_list",
    """SELECT n_nationkey, n_name, n_regionkey
       FROM nation WHERE n_regionkey IN (0, 2)""",
)
def filter_in_list(spark, sf_dir):
    """P1 group-selection filter: IN-list predicate, pushed to the scan."""
    return (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey").isin(0, 2))
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@register(
    "filter_prefix",
    """SELECT p_partkey, p_type FROM part WHERE p_type NOT LIKE 'ECONOMY%'""",
)
def filter_prefix(spark, sf_dir):
    """P3 prefix pruning (skip-quicklook analogue): NOT LIKE on the scan."""
    return (
        _t(spark, sf_dir, "part")
        .filter(~F.col("p_type").startswith("ECONOMY"))
        .select("p_partkey", "p_type")
    )


@register(
    "map_ops",
    """SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_mod,
              COUNT(*) AS n
       FROM events
       WHERE CAST(json_extract(props, '$.k') AS INTEGER) % 2 = 0
       GROUP BY k_mod ORDER BY k_mod""",
)
def map_ops(spark, sf_dir):
    """P4 attribute-map manipulation: JSON field extract + filter + group."""
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        _t(spark, sf_dir, "events")
        .withColumn("k", k)
        .filter(F.col("k") % 2 == 0)
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"))
        .orderBy("k_mod")
    )


@register(
    "nan_canon",
    """SELECT event_id,
              CASE WHEN isnan(value) THEN 'NaN'
                   ELSE printf('%.4f', value) END AS canon_value
       FROM events WHERE event_id < 100""",
)
def nan_canon(spark, sf_dir):
    """P5 NaN canonicalization: NaN -> 'NaN' string, else fixed-format."""
    v = F.col("value")
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 100)
        .select(
            "event_id",
            F.when(F.isnan(v), F.lit("NaN"))
            .otherwise(F.format_string("%.4f", v))
            .alias("canon_value"),
        )
    )


@register(
    "validity_pred",
    """SELECT l_orderkey, l_linenumber
       FROM lineitem
       WHERE l_quantity IS NOT NULL
         AND l_discount BETWEEN 0.02 AND 0.08
         AND l_returnflag = 'R'
         AND l_extendedprice > 1000""",
)
def validity_pred(spark, sf_dir):
    """P6 band-validity predicate: multi-clause filter with null checks."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").isNotNull()
        & F.col("l_discount").between(0.02, 0.08)
        & (F.col("l_returnflag") == "R")
        & (F.col("l_extendedprice") > 1000)
    ).select("l_orderkey", "l_linenumber")


@register(
    "compliance_counts",
    """SELECT o_orderpriority,
              COUNT(*) AS n_total,
              CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
              CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_large
       FROM orders GROUP BY o_orderpriority""",
)
def compliance_counts(spark, sf_dir):
    """P7 compliance scan: conditional counts per issue class."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.sum(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)).alias("n_large"),
    )


@register(
    "json_pred",
    """SELECT event_id, event_type FROM events
       WHERE CAST(json_extract(props, '$.k') AS INTEGER) >= 90""",
)
def json_pred(spark, sf_dir):
    """P8 nested-attr predicate (product-type detect analogue)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.get_json_object("props", "$.k").cast("int") >= 90)
        .select("event_id", "event_type")
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "broadcast_dim",
    """SELECT r.r_name, COUNT(*) AS n_nations
       FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY r.r_name""",
)
def broadcast_dim(spark, sf_dir):
    """J2 grid-mapping broadcast: tiny dim table broadcast-joined."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_nations"))
    )


@register(
    "inject_join",
    """SELECT o.o_orderkey,
              COALESCE(l.sum_qty, 0.0) AS sum_qty
       FROM orders o
       LEFT JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey) l
         ON o.o_orderkey = l.l_orderkey
       WHERE o.o_orderkey < 500""",
)
def inject_join(spark, sf_dir):
    """J1 band injection: aggregate finer grain, left-join onto coarser, fill."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    agg = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )
    return o.join(agg, o.o_orderkey == agg.l_orderkey, "left").select(
        "o_orderkey", F.coalesce("sum_qty", F.lit(0.0)).alias("sum_qty")
    )


@register(
    "asof_range",
    """SELECT e.event_id, COUNT(*) AS n_parts
       FROM events e JOIN part p
         ON p.p_retailprice BETWEEN 900 + e.value AND 903 + e.value
       WHERE e.event_id < 200
       GROUP BY e.event_id""",
)
def asof_range(spark, sf_dir):
    """J3 GCP bracketing: range (theta) join, value BETWEEN lo AND hi."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    p = _t(spark, sf_dir, "part")
    cond = p.p_retailprice.between(F.lit(900) + e.value, F.lit(903) + e.value)
    return e.join(p, cond).groupBy("event_id").agg(F.count("*").alias("n_parts"))


@register(
    "asof_event_order",
    """SELECT e.event_id,
              CAST(epoch(MAX(o.o_orderdate)) AS BIGINT) AS asof_epoch
       FROM events e JOIN orders o ON o.o_orderdate <= e.ts
       WHERE e.event_id < 50
       GROUP BY e.event_id""",
)
def asof_event_order(spark, sf_dir):
    """J3 as-of lookup: latest order at-or-before each event timestamp."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 50)
    o = _t(spark, sf_dir, "orders")
    return (
        e.join(o, o.o_orderdate <= e.ts)
        .groupBy("event_id")
        .agg(F.unix_timestamp(F.max("o_orderdate")).alias("asof_epoch"))
    )


@register(
    "ref_integrity",
    """SELECT COUNT(*) AS n_orphans FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE o.o_custkey = c.c_custkey)""",
)
def ref_integrity(spark, sf_dir):
    """J4 coordinate referential check: anti-join, empty result = valid."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_orphans"))
    )


@register(
    "union_pivot",
    """SELECT src, nk, COUNT(*) AS n, ROUND(AVG(bal), 6) AS avg_bal
       FROM (
         SELECT 'supplier' AS src, s_nationkey AS nk, s_acctbal AS bal FROM supplier
         UNION ALL
         SELECT 'customer' AS src, c_nationkey AS nk, c_acctbal AS bal FROM customer
       ) u GROUP BY src, nk""",
)
def union_pivot(spark, sf_dir):
    """J5 consolidation regrouping: unionByName of shaped sources + group."""
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"),
        F.col("s_nationkey").alias("nk"),
        F.col("s_acctbal").alias("bal"),
    )
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_acctbal").alias("bal"),
    )
    return (
        s.unionByName(c)
        .groupBy("src", "nk")
        .agg(F.count("*").alias("n"), F.round(F.avg("bal"), 6).alias("avg_bal"))
    )


@register(
    "semi_anti",
    """SELECT 'semi' AS side, COUNT(*) AS n FROM lineitem l
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F')
       UNION ALL
       SELECT 'anti' AS side, COUNT(*) AS n FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F')""",
)
def semi_anti(spark, sf_dir):
    """J6 resume joins: semi = already-valid (skip), anti = to-do."""
    li = _t(spark, sf_dir, "lineitem")
    done = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    semi = li.join(done, li.l_orderkey == done.o_orderkey, "left_semi").agg(
        F.count("*").alias("n")
    ).select(F.lit("semi").alias("side"), "n")
    anti = li.join(done, li.l_orderkey == done.o_orderkey, "left_anti").agg(
        F.count("*").alias("n")
    ).select(F.lit("anti").alias("side"), "n")
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@register(
    "block_avg",
    """SELECT l_orderkey % 32 AS blk,
              ROUND(AVG(l_extendedprice), 6) AS mean_price,
              COUNT(*) AS n
       FROM lineitem GROUP BY blk""",
)
def block_avg(spark, sf_dir):
    """A1 block-average: hash-agg with partial+final avg (map-side combine)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy((F.col("l_orderkey") % 32).alias("blk")).agg(
        F.round(F.avg("l_extendedprice"), 6).alias("mean_price"),
        F.count("*").alias("n"),
    )


@register(
    "cond_avg",
    """SELECT l_returnflag,
              ROUND(COALESCE(AVG(CASE WHEN l_discount <> 0 THEN l_extendedprice END),
                             -1.0), 6) AS mean_disc_price
       FROM lineitem GROUP BY l_returnflag""",
)
def cond_avg(spark, sf_dir):
    """A2 nodata-aware mean: sentinel-excluding average with fallback."""
    li = _t(spark, sf_dir, "lineitem")
    cond = F.when(F.col("l_discount") != 0, F.col("l_extendedprice"))
    return li.groupBy("l_returnflag").agg(
        F.round(F.coalesce(F.avg(cond), F.lit(-1.0)), 6).alias("mean_disc_price")
    )


@register(
    "null_avg",
    """SELECT l_linestatus,
              ROUND(AVG(CASE WHEN l_tax > 0.01 THEN l_tax END), 6) AS mean_tax
       FROM lineitem GROUP BY l_linestatus""",
)
def null_avg(spark, sf_dir):
    """A3 NaN-as-NULL mean: AVG skips NULLs natively."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.avg(F.when(F.col("l_tax") > 0.01, F.col("l_tax"))), 6).alias("mean_tax")
    )


@register(
    "stride_filter",
    """SELECT l_orderkey, l_linenumber FROM lineitem
       WHERE l_orderkey % 7 = 0 AND l_linenumber % 2 = 1""",
)
def stride_filter(spark, sf_dir):
    """A4 strided subsample: modulo filters, no shuffle at all."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_orderkey") % 7 == 0) & (F.col("l_linenumber") % 2 == 1)
    ).select("l_orderkey", "l_linenumber")


@register(
    "center_pick",
    """SELECT blk, picked FROM (
         SELECT l_orderkey % 16 AS blk, l_extendedprice AS picked,
                ROW_NUMBER() OVER (PARTITION BY l_orderkey % 16
                                   ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
         FROM lineitem) t WHERE rn = 1""",
)
def center_pick(spark, sf_dir):
    """A6 representative-pixel pick: rank-1 per block with total-order tiebreak."""
    li = _t(spark, sf_dir, "lineitem").withColumn("blk", F.col("l_orderkey") % 16)
    w = Window.partitionBy("blk").orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("blk", F.col("l_extendedprice").alias("picked"))
    )


@register(
    "bool_or_agg",
    """SELECT o_custkey,
              CAST(MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS INTEGER)
                AS any_finished
       FROM orders GROUP BY o_custkey""",
)
def bool_or_agg(spark, sf_dir):
    """A7 quality-mask OR: any-nonzero-marks-block as MAX of indicator."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("int")
        .alias("any_finished")
    )


@register(
    "clamped_avg",
    """SELECT o_orderpriority,
              ROUND(LEAST(GREATEST(AVG(o_totalprice), 20000.0), 100000.0), 6)
                AS clamped_mean
       FROM orders GROUP BY o_orderpriority""",
)
def clamped_avg(spark, sf_dir):
    """A8 probability clamp: LEAST/GREATEST around the mean."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(
            F.least(F.greatest(F.avg("o_totalprice"), F.lit(20000.0)), F.lit(100000.0)), 6
        ).alias("clamped_mean")
    )


@register(
    "gcp_dedup",
    """SELECT CAST(ROUND(value / 20) AS BIGINT) AS cell,
              ROUND(AVG(CAST(user_id AS DOUBLE)), 6) AS mean_user,
              COUNT(*) AS n
       FROM events GROUP BY cell""",
)
def gcp_dedup(spark, sf_dir):
    """A11 GCP dedup: scale+round key, groupBy mean (duplicate collapse)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.round(F.col("value") / 20).cast("long").alias("cell")
    ).agg(
        F.round(F.avg(F.col("user_id").cast("double")), 6).alias("mean_user"),
        F.count("*").alias("n"),
    )


@register(
    "bbox_agg",
    """SELECT MIN(p_size) AS xmin, MIN(p_retailprice) AS ymin,
              MAX(p_size) AS xmax, MAX(p_retailprice) AS ymax
       FROM part""",
)
def bbox_agg(spark, sf_dir):
    """A12 bbox extent: global min/max aggregation."""
    p = _t(spark, sf_dir, "part")
    return p.agg(
        F.min("p_size").alias("xmin"),
        F.min("p_retailprice").alias("ymin"),
        F.max("p_size").alias("xmax"),
        F.max("p_retailprice").alias("ymax"),
    )


@register(
    "union_bbox",
    """SELECT MIN(x) AS xmin, MAX(x) AS xmax FROM (
         SELECT s_acctbal AS x FROM supplier
         UNION ALL SELECT c_acctbal AS x FROM customer)""",
)
def union_bbox(spark, sf_dir):
    """A13 store-root bbox union: min/max over unioned per-group extents."""
    s = _t(spark, sf_dir, "supplier").select(F.col("s_acctbal").alias("x"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_acctbal").alias("x"))
    return s.unionByName(c).agg(F.min("x").alias("xmin"), F.max("x").alias("xmax"))


@register(
    "summary_counts",
    """SELECT o_orderstatus, COUNT(*) AS n,
              ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 6) AS pct
       FROM orders GROUP BY o_orderstatus""",
)
def summary_counts(spark, sf_dir):
    """A14 summary: group counts + % of total (window over aggregate)."""
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    return counts.withColumn(
        "pct", F.round(F.col("n") * 100.0 / F.sum("n").over(Window.partitionBy()), 6)
    )


@register(
    "two_phase_avg",
    """WITH pre AS (
         SELECT l_orderkey % 16 AS b, l_returnflag,
                SUM(l_extendedprice) AS s, COUNT(*) AS c
         FROM lineitem GROUP BY b, l_returnflag)
       SELECT l_returnflag,
              ROUND(SUM(s) / SUM(c), 6) AS reagg_mean
       FROM pre GROUP BY l_returnflag""",
)
def two_phase_avg(spark, sf_dir):
    """A15 exact cascade: re-aggregating (sum, count) == direct mean."""
    li = _t(spark, sf_dir, "lineitem")
    pre = li.groupBy((F.col("l_orderkey") % 16).alias("b"), "l_returnflag").agg(
        F.sum("l_extendedprice").alias("s"), F.count("*").alias("c")
    )
    return pre.groupBy("l_returnflag").agg(
        F.round(F.sum("s") / F.sum("c"), 6).alias("reagg_mean")
    )


@register(
    "dispatch_case",
    """SELECT p_type,
              ROUND(CASE WHEN p_type = 'PROMO' THEN MAX(p_retailprice)
                         WHEN p_type = 'ECONOMY' THEN MIN(p_retailprice)
                         ELSE AVG(p_retailprice) END, 6) AS dispatched
       FROM part GROUP BY p_type""",
)
def dispatch_case(spark, sf_dir):
    """A10 per-type reduction dispatch: CASE selects the agg per group."""
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_type").agg(
        F.round(
            F.when(F.col("p_type") == "PROMO", F.max("p_retailprice"))
            .when(F.col("p_type") == "ECONOMY", F.min("p_retailprice"))
            .otherwise(F.avg("p_retailprice")),
            6,
        ).alias("dispatched")
    )


# ---------------------------------------------------------------------------
# §2.5 windows / top-k, §2.6 set ops
# ---------------------------------------------------------------------------


@register(
    "topk_window",
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
         SELECT o_orderpriority, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) t WHERE rn <= 3""",
)
def topk_window(spark, sf_dir):
    """kNN-refinement shape: per-group top-k via row_number window."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@register(
    "global_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def global_topk(spark, sf_dir):
    """Global top-k: TakeOrderedAndProject, no full sort."""
    o = _t(spark, sf_dir, "orders")
    return o.orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(10).select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "except_paths",
    """SELECT n_name FROM nation
       EXCEPT
       SELECT n_name FROM nation WHERE n_regionkey = 0""",
)
def except_paths(spark, sf_dir):
    """§2.6 missing-group synthesis: set difference on a path column."""
    n = _t(spark, sf_dir, "nation")
    return n.select("n_name").subtract(
        n.filter(F.col("n_regionkey") == 0).select("n_name")
    )


@register(
    "anti_join_refs",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_unreferenced
       FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def anti_join_refs(spark, sf_dir):
    """P2 grid-mapping exclusion shape: entities NOT referenced by any other.

    The reference projects away CRS variables that other variables point at
    via ``grid_mapping`` attrs (``conversion/utils.py:135-158``); the
    relational shape is an anti-join of the candidate set against the
    reference set — here: customers no order references.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey").distinct()
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count("*").alias("n_unreferenced"))
    )


@register(
    "pyramid_cascade",
    """WITH g AS (
         SELECT event_id // 30 AS y, event_id % 30 AS x, value AS v
         FROM events WHERE event_id < 900)
       SELECT CAST(y // 6 AS BIGINT) AS by2, CAST(x // 6 AS BIGINT) AS bx2,
              ROUND(SUM(v) / COUNT(*), 6) AS mean_v,
              CAST(COUNT(*) AS BIGINT) AS n_px
       FROM g GROUP BY 1, 2""",
)
def pyramid_cascade(spark, sf_dir):
    """A15 cascade exactness: 30x30 -> /2 -> /3 with (sum,count) carry.

    Two cascaded levels with MIXED factors (2 then 3 — the reference's S2
    pyramid mixes /2 and /3 steps, `docs/geozarr-minispec.md` 10980->5490->
    1830 scales 2,6) rebuilt from carried (sum, count) pairs; the DuckDB
    oracle aggregates the base grid directly in ONE step — equality proves
    mean-of-means exactness under the carry (`SURVEY.md §2.4 A15`).
    """
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 900)
    g = e.select(
        (F.col("event_id") / 30).cast("long").alias("y"),
        F.pmod(F.col("event_id"), F.lit(30)).alias("x"),
        F.col("value").alias("v"),
    )
    l1 = g.groupBy(
        (F.col("y") / 2).cast("long").alias("by1"),
        (F.col("x") / 2).cast("long").alias("bx1"),
    ).agg(F.sum("v").alias("s"), F.count("*").alias("c"))
    return l1.groupBy(
        (F.col("by1") / 3).cast("long").alias("by2"),
        (F.col("bx1") / 3).cast("long").alias("bx2"),
    ).agg(
        F.round(F.sum("s") / F.sum("c"), 6).alias("mean_v"),
        F.sum("c").alias("n_px"),
    )


@register(
    "cf_scale_offset",
    """WITH packed AS (
         SELECT l_orderkey, l_linenumber,
                CAST(trunc(l_quantity) AS BIGINT) AS p
         FROM lineitem WHERE l_orderkey < 200),
       dec AS (
         SELECT l_orderkey, l_linenumber, p,
                p * 0.001 + 0.5 AS unpacked
         FROM packed)
       SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
              ROUND(SUM(unpacked), 6) AS sum_unpacked,
              CAST(SUM(CASE WHEN CAST(ROUND((unpacked - 0.5) / 0.001, 0) AS BIGINT) = p
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_exact
       FROM dec""",
)
def cf_scale_offset(spark, sf_dir):
    """F6 CF packing codec: unpacked = packed*sf + ao; re-encode must
    round-trip bit-exactly (`codecs/scale_offset.py:15-27`,
    `tests/test_scale_offset.py:17`)."""
    sf, ao = 0.001, 0.5
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    p = li.select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").cast("long").alias("p")
    )
    dec = p.withColumn("unpacked", F.col("p") * sf + ao)
    enc = dec.withColumn(
        "re_packed", F.round((F.col("unpacked") - ao) / sf, 0).cast("long")
    )
    return enc.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("unpacked"), 6).alias("sum_unpacked"),
        F.sum(F.when(F.col("re_packed") == F.col("p"), 1).otherwise(0)).alias(
            "n_roundtrip_exact"
        ),
    )


@register(
    "epsg_parse",
    """SELECT CAST(string_split('EPSG:' || CAST(32600 + n_nationkey AS VARCHAR), ':')[-1]
                   AS BIGINT) AS code,
              n_name AS name
       FROM nation WHERE n_nationkey < 10""",
)
def epsg_parse(spark, sf_dir):
    """F4 EPSG parsing: 'EPSG:32632' -> 32632 via split + last-element cast
    (`s2_converter.py:26-102`)."""
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 10)
    s = n.select(
        F.concat(F.lit("EPSG:"), (F.lit(32600) + F.col("n_nationkey")).cast("string")).alias("crs"),
        F.col("n_name").alias("name"),
    )
    return s.select(
        F.element_at(F.split("crs", ":"), -1).cast("long").alias("code"), "name"
    )


@register(
    "grouping_rollup",
    """SELECT COALESCE(CAST(l_returnflag AS VARCHAR), 'ALL') AS rf,
              COALESCE(CAST(l_linestatus AS VARCHAR), 'ALL') AS ls,
              CAST(COUNT(*) AS BIGINT) AS n,
              ROUND(SUM(l_quantity), 4) AS sum_qty
       FROM lineitem
       GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def grouping_rollup(spark, sf_dir):
    """Pyramid-as-rollup (SURVEY §2.4 note): the same measure at every
    grain in one pass — GROUP BY ROLLUP over the pyramid-level analogue."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .select(
            F.coalesce(F.col("l_returnflag").cast("string"), F.lit("ALL")).alias("rf"),
            F.coalesce(F.col("l_linestatus").cast("string"), F.lit("ALL")).alias("ls"),
            "n",
            "sum_qty",
        )
    )


@register(
    "grouping_cube",
    """SELECT COALESCE(CAST(o_orderstatus AS VARCHAR), 'ALL') AS st,
              COALESCE(CAST(o_orderpriority AS VARCHAR), 'ALL') AS pri,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM orders WHERE o_orderkey < 2000
       GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
)
def grouping_cube(spark, sf_dir):
    """CUBE over two dims — all grain combinations in one shuffle."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce(F.col("o_orderstatus").cast("string"), F.lit("ALL")).alias("st"),
            F.coalesce(F.col("o_orderpriority").cast("string"), F.lit("ALL")).alias("pri"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# F8: path functions over a manifest table (fs_utils.py:110-181,246-268)
# ---------------------------------------------------------------------------

_PATHS_FIXTURE = [
    "s3://eopf-bucket/scenes/S2A_T33TTG/b02.tif",
    "s3://eopf-bucket//scenes//S2A_T33TTG///b03.tif",
    "s3://other-bucket/",
    "s3://lonely-bucket",
    "/data//tiles///level=0/part.parquet",
    "/data/tiles/",
    "relative/path//x",
]


@register(
    "path_parse",
    """WITH p(path) AS (VALUES """
    + ", ".join(f"('{x}')" for x in _PATHS_FIXTURE)
    + """)
       SELECT path,
              path LIKE 's3://%' AS is_s3,
              CASE WHEN path LIKE 's3://%'
                   THEN regexp_extract(path, '^s3://([^/]*)', 1) END AS bucket,
              CASE WHEN path LIKE 's3://%'
                   THEN regexp_replace(regexp_extract(path, '^s3://[^/]*(/.*)?$', 1), '^/+', '', 'g')
              END AS key,
              CASE WHEN path LIKE 's3://%'
                   THEN 's3://' || array_to_string(
                        list_filter(string_split(substr(path, 6), '/'), x -> x <> ''), '/')
                   ELSE regexp_replace(regexp_replace(path, '/{2,}', '/', 'g'), '(.)/$', '\\1')
              END AS norm
       FROM p ORDER BY path""",
)
def path_parse(spark, sf_dir):
    """F8 path functions as JVM column expressions over a manifest table."""
    from ..functions import paths as P

    p = local_df(spark, [(x,) for x in _PATHS_FIXTURE], "path string")
    c = F.col("path")
    return p.select(
        "path",
        P.col_is_s3(c).alias("is_s3"),
        P.col_bucket(c).alias("bucket"),
        P.col_key(c).alias("key"),
        P.col_normalize(c).alias("norm"),
    ).orderBy("path")
