"""Connected-components duplicate clustering + canonical document selection.

The dedup family (``operators/dedup.py``) produces near-duplicate PAIRS;
a training-data pipeline needs the transitive closure of those pairs —
duplicate CLUSTERS — and then one keep decision per cluster.  Reference
parity: the reference has no graph operator (its dedup analogue is the
idempotent skip-if-valid write, ``conversion/geozarr.py:974-1183``); this
module is part of the LLM-data-pipeline surface the engine adds on top.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) expressed as
DataFrame joins/aggregations:

* both operations reduce to ``groupBy(node).min(neighbor)`` + an equi-join
  back to the edge list — there is NO ``collect_list`` of neighborhoods, so
  a celebrity node with 10^8 neighbors never materializes its adjacency in
  one task (its rows spread across shuffle partitions like any other key);
* converges in O(log^2 n) rounds (observed: 3-5 on near-dup graphs, whose
  components are dense and shallow);
* each round ends in ``localCheckpoint`` to truncate lineage — without it
  the plan doubles per iteration and Catalyst analysis time explodes;
* convergence is detected by a (count, xxhash64-sum) signature of the edge
  set: one tiny aggregation action per round (the same O(iterations)
  driver-metadata-action budget as the resume loop), not a full exceptAll.

At 10^12-row scale the edge list is the near-dup pair output — orders of
magnitude smaller than the corpus — and every round is two shuffles on
``node`` keys, AQE-coalesced.  On a real cluster prefer
``spark.sparkContext.setCheckpointDir`` + ``checkpoint`` over
``localCheckpoint`` if executor loss matters mid-computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .dedup import jaccard_pairs
from .registry import register

#: optional (tag, round, seconds, size) callback — set ONLY by
#: scripts/graph_scaling_bench.py to record per-round timings; never
#: active in production paths
ROUND_HOOK = None


def _swap(e: DataFrame) -> DataFrame:
    return e.select(F.col("v").alias("u"), F.col("u").alias("v"))


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's neighborhood minimum.

    For each node u with neighborhood N(u): m = min(N(u) ∪ {u}); emit
    (v, m) for all v ∈ N(u) with v > u.  Min-join formulation: the min is
    a hash aggregation, the emit is an equi-join of the symmetric edge
    list with the per-node min table.
    """
    s = e.union(_swap(e))
    mn = s.groupBy("u").agg(F.min("v").alias("mnv"))
    mn = mn.select("u", F.least("mnv", F.col("u")).alias("m"))
    return (
        s.join(mn, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Attach every smaller neighbor of u (and u itself) to their minimum.

    Input/output edges are oriented u > v.  For each node u with small
    neighbors N<(u): m = min(N<(u)); emit (v, m) for v ∈ N<(u) plus (u, m).
    """
    mn = e.groupBy("u").agg(F.min("v").alias("m"))
    return (
        e.join(mn, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mn.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


import os as _os

#: edge-count ceiling for the single-task union-find fast path.  Size-based
#: (not core-count-based), so the choice is scale-adaptive: a graph this
#: small finishes in one narrow task in ~0.1 s, where the distributed
#: large/small-star rounds pay O(log^2 n) shuffle floors; any larger graph
#: takes the distributed path unchanged.
CC_SMALL_EDGES = int(_os.environ.get("DMS_CC_SMALL_EDGES", str(1 << 20)))


def _cc_single_task(e: DataFrame) -> DataFrame:
    """(node, comp=min reachable id) via one-task union-find — the exact
    output ``connected_components`` produces, for graphs small enough that
    multi-round shuffles are pure overhead.  Runs executor-side (coalesced
    mapInPandas), never on the driver."""
    import pandas as pd

    def uf(batches):
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            # .tolist() hands the loop plain Python ints — dict ops on
            # np.int64 scalars are ~3x slower
            for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
                ru, rv = find(u), find(v)
                if ru != rv:
                    # union by min so the final root IS the component min
                    if ru < rv:
                        parent[rv] = ru
                    else:
                        parent[ru] = rv
        nodes = list(parent.keys())
        # roots not in parent map to themselves; collect every seen node
        seen = set(nodes)
        for n in nodes:
            seen.add(find(n))
        out_nodes = sorted(seen)
        yield pd.DataFrame(
            {"node": out_nodes, "comp": [find(n) for n in out_nodes]}
        )

    return e.coalesce(1).mapInPandas(uf, "node long, comp long")


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, comp) for every node in ``edges``; comp = min node id reachable.

    Nodes with no edge (singletons) do not appear — callers treat absence
    as "own component" (see ``canonical_docs``).  Raises after ``max_iter``
    rounds without a fixed point (the algorithm's bound is O(log^2 n), so
    25 covers any realistic graph; a non-convergence here means the edge
    extraction upstream is pathological).

    Scale-adaptive: below ``CC_SMALL_EDGES`` distinct edges the transitive
    closure runs as a single-task union-find (same canonical min labels,
    one narrow stage instead of O(log^2) shuffle rounds); at scale the
    distributed large/small-star path runs unchanged.
    """
    raw = (
        edges.select(
            F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .localCheckpoint(eager=True)
    )
    n_raw = raw.count()
    if n_raw == 0:
        return raw.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    if ROUND_HOOK is None and n_raw <= CC_SMALL_EDGES:
        # union-find absorbs duplicate edges, so the fast path skips the
        # distinct shuffle entirely (n_raw >= distinct count keeps the
        # threshold conservative)
        return _cc_single_task(raw)
    e = raw.distinct().localCheckpoint(eager=True)

    def signature(df: DataFrame) -> tuple[int, int]:
        # sum in decimal(38,0): exact, and immune to ANSI int64 overflow
        # (xxhash64 terms are full-range signed longs)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    sig = signature(e)
    import time as _time

    for _round in range(max_iter):
        _t0 = _time.perf_counter()
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig2 = signature(e2)
        if ROUND_HOOK is not None:  # scaling-bench instrumentation only
            ROUND_HOOK("cc", _round, _time.perf_counter() - _t0, sig2[0])
        e = e2
        if sig2 == sig:
            break
        sig = sig2
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # At the fixed point the graph is a union of stars with the component
    # minimum at the center: comp(u) = min(neighbors(u) ∪ {u}).
    s = e.union(_swap(e))
    return (
        s.groupBy("u")
        .agg(F.min("v").alias("mnv"))
        .select(
            F.col("u").alias("node"), F.least("mnv", F.col("u")).alias("comp")
        )
    )


def canonical_docs(
    docs: DataFrame, comps: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document keep decision: keep the cluster minimum, drop the rest.

    ``comps`` is the (node, comp) output of ``connected_components``;
    documents absent from it are singletons and are kept.  Output adds
    ``kept_as`` (the id a dropped doc deduplicates to — itself when kept)
    and boolean ``keep``.  The comps side grows with the corpus dup rate
    (30-60% of a web corpus can be in a dup cluster), so the join is NOT
    hint-forced: AQE broadcasts it when it measures small and falls back
    to shuffle when it doesn't — a forced broadcast would OOM at scale.
    """
    c = comps.select(F.col("node").alias(id_col), "comp")
    return (
        docs.join(c, id_col, "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("kept_as"),
            (F.col("comp").isNull() | (F.col("comp") == F.col(id_col))).alias(
                "keep"
            ),
        )
    )


# ---------------------------------------------------------------------------
# registered queries — edges from exact n-gram Jaccard at 0.3 over the full
# documents table, clusters via the recursive transitive closure in DuckDB
# ---------------------------------------------------------------------------

_COMPONENT_CTES = """toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS ws FROM documents),
sh AS (
  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ws)-2),
        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingles
  FROM toks WHERE len(ws) >= 3),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        (len(a.shingles) + len(b.shingles)
         - len(list_intersect(a.shingles, b.shingles))) >= 0.3),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(u, lbl) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.u),
comps AS (
  SELECT u AS doc_id, MIN(lbl) AS comp FROM reach GROUP BY u)"""


@register(
    "dedup_components",
    f"WITH RECURSIVE {_COMPONENT_CTES}\nSELECT doc_id, comp FROM comps",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: transitive closure of Jaccard>=0.3 pairs."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, 0.3, n=3)
    comps = connected_components(pairs)
    return comps.select(F.col("node").alias("doc_id"), "comp")


@register(
    "dedup_canonical",
    f"""WITH RECURSIVE {_COMPONENT_CTES}
SELECT d.doc_id,
       COALESCE(c.comp, d.doc_id) AS kept_as,
       (c.comp IS NULL OR c.comp = d.doc_id) AS keep
FROM documents d LEFT JOIN comps c USING (doc_id)""",
)
def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One keep decision per document: cluster minimum kept, rest dropped."""
    docs = load_table(spark, sf_dir, "documents")
    comps = connected_components(jaccard_pairs(docs, 0.3, n=3))
    return canonical_docs(docs, comps)
