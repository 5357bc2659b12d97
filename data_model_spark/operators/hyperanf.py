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
BIT-PACKED (r6): all m=16 six-bit registers ride in two int64 words
(w0 = buckets 0..9, w1 = 10..15), so the |edges| join-output rows — the
round's heavy shuffle — carry 16 bytes of state instead of a 16-element
long array (~10x fewer state bytes through every exchange; the r5 array
layout was itself ~2x better than skinny (node, bucket) rows on the
1.6M-node probe, and the r5 scaling-weak verdict flagged this stage as
shuffle-bandwidth-bound).  The elementwise-max merge is m JVM-side
``max(field)`` aggregates repacked by disjoint-field sum; register
values are identical integers, so the fingerprints are unchanged.
Production p=8..12 changes only the word layout.  The edge list is
localCheckpointed once (it feeds the node set and every round's join).
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


#: registers bit-packed into two int64 words, 6 bits per register (rho of
#: a 56-bit rest is <= 57 < 64): word 0 holds buckets 0..9, word 1 holds
#: 10..15.  vs the previous 16-element long array this cuts the per-row
#: state from ~16x8 bytes + array framing to 16 bytes — and the HEAVY
#: rows of each round are the |edges| join outputs carrying the state
#: (VERDICT r5 #4: the scaling-weak stage was shuffle-bandwidth-bound).
_W0_SLOTS = 10
_FBITS = 6
_FMASK = (1 << _FBITS) - 1


def _field(b: int) -> F.Column:
    """Register b extracted from the packed (w0, w1) state."""
    if b < _W0_SLOTS:
        return F.expr(f"shiftrightunsigned(w0, {b * _FBITS}) & {_FMASK}")
    return F.expr(f"shiftrightunsigned(w1, {(b - _W0_SLOTS) * _FBITS}) & {_FMASK}")


def _initial_regs(edges: DataFrame) -> DataFrame:
    """(node, w0, w1) — the node's own bucket holds its rho (>= 1 by
    construction), every other register is 0 = empty."""
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
    return hashed.select(
        "node",
        F.expr(
            f"CASE WHEN bucket < {_W0_SLOTS} "
            f"THEN shiftleft(CAST(rho AS BIGINT), CAST(bucket * {_FBITS} AS INT)) "
            "ELSE CAST(0 AS BIGINT) END"
        ).alias("w0"),
        F.expr(
            f"CASE WHEN bucket >= {_W0_SLOTS} "
            f"THEN shiftleft(CAST(rho AS BIGINT), CAST((bucket - {_W0_SLOTS}) * {_FBITS} AS INT)) "
            "ELSE CAST(0 AS BIGINT) END"
        ).alias("w1"),
    )


def _merge_regs() -> list:
    """Elementwise-max merge: per-register max aggregates repacked into
    the two words (fields are disjoint, so the repack is a plain sum)."""
    w0 = None
    w1 = None
    for b in range(M):
        mx = F.max(_field(b))
        if b < _W0_SLOTS:
            term = F.shiftleft(mx, b * _FBITS)
            w0 = term if w0 is None else w0 + term
        else:
            term = F.shiftleft(mx, (b - _W0_SLOTS) * _FBITS)
            w1 = term if w1 is None else w1 + term
    return [w0.alias("w0"), w1.alias("w1")]


def _state_fp(regs: DataFrame, t: int) -> DataFrame:
    n_regs = None
    reg_sum = None
    for b in range(M):
        f = _field(b)
        occ = F.when(f > 0, 1).otherwise(0)
        n_regs = occ if n_regs is None else n_regs + occ
        reg_sum = f if reg_sum is None else reg_sum + f
    return regs.select(
        "node",
        F.lit(t).cast("long").alias("t"),
        n_regs.cast("long").alias("n_regs"),
        reg_sum.cast("long").alias("reg_sum"),
    )


def hyperanf_states(edges: DataFrame, rounds: int = ROUNDS) -> DataFrame:
    """(node, t, n_regs, reg_sum) for t = 0..rounds — the integer
    fingerprint of every node's reachability sketch per round."""
    # materialize the (possibly expensive) edge derivation once: it feeds
    # the node set and every round's join
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    cur = _initial_regs(e)
    out = _state_fp(cur, 0)
    for t in range(1, rounds + 1):
        nb = e.join(cur, e["dst"] == cur["node"]).select(
            e["src"].alias("node"), "w0", "w1"
        )
        cur = nb.unionByName(cur).groupBy("node").agg(*_merge_regs())
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
