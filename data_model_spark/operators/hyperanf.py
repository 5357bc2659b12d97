"""HyperANF: per-node neighborhood-function sketches (Boldi et al. 2011).

The neighborhood function N(v, t) — how many nodes are within t hops of
v — is the basis of distance distributions, effective diameter, and
centrality screens.  Exact computation is all-pairs BFS (hopeless at
scale); HyperANF's published trick is one HLL register set per node,
advanced by ``regs_{t+1}(v) = merge(regs_t(v), regs_t(u) for (v,u) in
E)`` — the merge is elementwise MAX, so each round is ONE edge-vs-state
equi-join plus ONE (node, bucket) max-aggregation: bounded-shuffle
rounds exactly like the engine's components/PageRank iterations, with
state O(nodes * m) instead of O(reachable pairs).

Exactness: registers use the ``md5_60`` cross-engine hash and the
CASE-chain rho of `sketches.py`, so every register value is exact
integer across engines; the registered query emits the per-round
integer register fingerprint (n_regs, sum of mj) per node — the full
sketch state pinned by the driver hash, with the cardinality estimate
one shared-literal division away (``sketches.hll_estimate``).  Oracle:
full generative DuckDB SQL with the rounds unrolled (the ``pagerank``
pattern).

Scale shape: per round, edges join the register table on the neighbor
key (shuffle on node id) and a same-key groupBy max — AQE reuses the
hash partitioning; rounds are t (typically ~log diameter).  State is
PACKED: one row per node carrying all m=16 registers as an array
(slot 0 = empty; rho >= 1 for occupied), the layout the published
HyperANF uses — so the per-round join and aggregation move |nodes| +
|edges| rows, not (node, bucket) skinny rows (up to m x more rows
through every exchange as sketches fill; measured ~2x wall on the
1.6M-node probe after packing).  The elementwise-max merge is m
JVM-side ``max(regs[i])`` aggregates.  Production p=8..12 changes only
the array width.  Longer chains would add ``localCheckpoint`` lineage
truncation as `components.py` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import MD5_60_SQL, md5_60
from .pagerank import _EDGES_CTE, _trade_edges
from .registry import register
from .sketches import _rho_sql

P = 4  # 16 registers per node (production: 8..12; constant-only change)
ROUNDS = 2
REST_BITS = 60 - P
REST_MASK = (1 << REST_BITS) - 1


M = 1 << P  # registers per node


def _initial_regs(edges: DataFrame) -> DataFrame:
    """(node, regs) — regs is the m-slot packed register array: the
    node's own bucket holds its rho (>= 1 by construction), every other
    slot holds 0 = empty."""
    nodes = (
        edges.select("src")
        .union(edges.select(F.col("dst").alias("src")))
        .distinct()
        .select(F.col("src").alias("node"))
    )
    h = md5_60(F.col("node").cast("string"))
    hashed = nodes.select(
        "node",
        F.shiftrightunsigned(h, REST_BITS).alias("bucket"),
        h.bitwiseAND(F.lit(REST_MASK)).alias("rest"),
    ).withColumn("rho", F.expr(_rho_sql("rest", REST_BITS)))
    regs = F.array(
        *[
            F.when(F.col("bucket") == b, F.col("rho"))
            .otherwise(F.lit(0))
            .cast("long")
            for b in range(M)
        ]
    )
    return hashed.select("node", regs.alias("regs"))


def _merge_regs() -> F.Column:
    """Elementwise-max merge as m JVM max-aggregates over array slots."""
    return F.array(*[F.max(F.col("regs")[b]) for b in range(M)]).alias("regs")


def _state_fp(regs: DataFrame, t: int) -> DataFrame:
    zero = F.lit(0).cast("long")
    return regs.select(
        "node",
        F.lit(t).cast("long").alias("t"),
        F.aggregate(
            "regs", zero, lambda acc, x: acc + F.when(x > 0, 1).otherwise(0)
        ).alias("n_regs"),
        F.aggregate("regs", zero, lambda acc, x: acc + x).alias("reg_sum"),
    )


def hyperanf_states(edges: DataFrame, rounds: int = ROUNDS) -> DataFrame:
    """(node, t, n_regs, reg_sum) for t = 0..rounds — the integer
    fingerprint of every node's reachability sketch per round."""
    e = edges.select("src", "dst")
    cur = _initial_regs(e)
    out = _state_fp(cur, 0)
    for t in range(1, rounds + 1):
        nb = e.join(cur, e["dst"] == cur["node"]).select(
            e["src"].alias("node"), "regs"
        )
        cur = nb.unionByName(cur).groupBy("node").agg(_merge_regs())
        out = out.unionByName(_state_fp(cur, t))
    return out


def _hyperanf_oracle(rounds: int = ROUNDS) -> str:
    h = MD5_60_SQL.format(col="CAST(node AS VARCHAR)")
    rho = _rho_sql("rest", REST_BITS)
    parts = [
        f"""nodes AS (SELECT DISTINCT src AS node FROM edges
           UNION SELECT DISTINCT dst FROM edges),
hashed AS (SELECT node, ({h}) >> {REST_BITS} AS bucket,
                  ({h}) & {REST_MASK} AS rest FROM nodes),
r0 AS (SELECT node, bucket, {rho} AS mj FROM hashed)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"""r{t} AS (
  SELECT node, bucket, MAX(mj) AS mj FROM (
    SELECT e.src AS node, r.bucket, r.mj
    FROM edges e JOIN r{t - 1} r ON r.node = e.dst
    UNION ALL
    SELECT node, bucket, mj FROM r{t - 1}) u
  GROUP BY node, bucket)"""
        )
    selects = [
        f"""SELECT node, CAST({t} AS BIGINT) AS t,
       CAST(COUNT(*) AS BIGINT) AS n_regs,
       CAST(SUM(mj) AS BIGINT) AS reg_sum
FROM r{t} GROUP BY node"""
        for t in range(rounds + 1)
    ]
    return (
        "WITH "
        + _EDGES_CTE
        + ",\n"
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
    )


@register("hyperanf_reach", _hyperanf_oracle())
def hyperanf_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node HyperANF sketch fingerprints for hops 0..2 over the
    symmetric customer<->supplier trade graph."""
    return hyperanf_states(_trade_edges(spark, sf_dir))
