"""Distributed minimum spanning forest (Borůvka rounds).

MST is the backbone of single-linkage clustering, HDBSCAN, network
design, and trajectory simplification at corpus scale.  Borůvka's
algorithm is THE distributed-friendly MST: every round each component
picks its minimum-weight outgoing edge (one combinable min-aggregation),
the picked edges merge components (star contraction), and the component
count at least halves — O(log n) rounds, every step a bounded shuffle,
no sorting and no sequential union-find.

Implementation over engine parts:

* edge annotation: the working edge set carries its endpoints' current
  component labels inline; relabeling is two equi-joins against the
  (small, halving) comp-rename table, and intra-component edges are
  dropped for good each round, so every join input only shrinks;
* per-component minimum: ``min(struct(w, a, b))`` — the struct ordering
  makes the pick deterministic, and UNIQUE weights (see below) make the
  WHOLE forest independent of partitioning and round grouping, the same
  argument as the classic "distinct weights => unique MST" theorem;
* contraction: ``components.connected_components`` (large-star /
  small-star with localCheckpoint lineage truncation) on the cumulative
  forest edge set — O(log^2) total shuffle rounds, each bounded.

Weights are exact int64 and UNIQUE by construction: the fixture encodes
``w = d2 * 2^36 + id_a * 2^18 + id_b`` over the geostats radius graph
(d2 < 2^18 at the 500 m lag cap, ids < 2^18 at the tested scales —
asserted), so ties are impossible and the forest is canonical.

Oracle: driver-side Kruskal replay over the same deterministically
derived edge list, emitted as VALUES — unique weights guarantee the two
algorithms produce the identical edge SET, which is exactly the property
the hash compare certifies.  (Kruskal's sequential sort is fine on the
oracle side; the ENGINE never sorts globally.)

Reference context: the reference has no graph layer; this completes the
engine's graph suite (components, pagerank, sssp, k-core, LPA,
triangles) with the minimum-forest primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import fixture_range, load_table
from .components import connected_components
from .registry import register


def boruvka_msf(edges: DataFrame, max_rounds: int = 20) -> DataFrame:
    """(id_a, id_b, w) minimum-spanning-forest edges.

    ``edges``: (id_a, id_b, w) with id_a < id_b and UNIQUE int64 weights
    (caller's contract; duplicated weights would make the forest depend
    on partitioning).  Returns the canonical forest.
    """
    # the working edge set carries its endpoints' CURRENT component labels
    # inline (ca, cb) — relabeling rewrites the (shrinking) edge set
    # directly instead of maintaining a separate node->comp table, so each
    # round is two label joins on a set that only loses rows.
    e = (
        edges.selectExpr(
            "id_a", "id_b", "w", "id_a AS ca", "id_b AS cb"
        ).localCheckpoint(eager=True)
    )
    # scale-adaptive: a graph small enough for one task runs Kruskal
    # executor-side (unique weights => the identical canonical forest the
    # Borůvka rounds produce) instead of paying O(log n) shuffle rounds;
    # same threshold discipline as components.CC_SMALL_EDGES, and the
    # distributed path runs unchanged when the scaling-bench hook is live.
    from . import components as _cmp

    if _cmp.ROUND_HOOK is None and e.count() <= _cmp.CC_SMALL_EDGES:
        return _kruskal_single_task(e)
    forest_parts: list[DataFrame] = []
    for _ in range(max_rounds):
        # each component's minimum outgoing edge, from either side
        cand = e.select(
            F.col("ca").alias("comp"), "w", "id_a", "id_b", "ca", "cb"
        ).unionByName(
            e.select(F.col("cb").alias("comp"), "w", "id_a", "id_b", "ca", "cb")
        )
        picked = (
            cand.groupBy("comp")
            .agg(F.min(F.struct("w", "id_a", "id_b", "ca", "cb")).alias("m"))
            .select("m.id_a", "m.id_b", "m.w", "m.ca", "m.cb")
            .distinct()  # two components may pick the same edge
            .localCheckpoint(eager=True)
        )
        n_picked = picked.count()
        if n_picked == 0:
            break
        # an edge picked this round joins two distinct comps; its endpoints
        # share a comp forever after, so it can never be re-picked — the
        # cumulative forest needs no distinct and no materialization here
        forest_parts.append(picked.select("id_a", "id_b", "w"))
        # contraction runs on the COMP-level graph (<= 1 edge per
        # component), not the whole cumulative forest — the per-round
        # CC input shrinks with the component count
        relabel = connected_components(
            picked.select("ca", "cb"), "ca", "cb"
        ).withColumnRenamed("comp", "new_comp")
        from .components import CC_SMALL_EDGES

        if n_picked <= CC_SMALL_EDGES:
            # known-small rename table: broadcast both relabel joins so the
            # (much larger) working edge set is never shuffled for them
            relabel = F.broadcast(relabel)
        e = (
            e.join(
                relabel.withColumnRenamed("node", "ca"), "ca", "left"
            )
            .withColumn("ca", F.coalesce("new_comp", "ca"))
            .drop("new_comp")
            .join(relabel.withColumnRenamed("node", "cb"), "cb", "left")
            .withColumn("cb", F.coalesce("new_comp", "cb"))
            .drop("new_comp")
            .where("ca != cb")  # drop intra-component edges for good
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError("boruvka_msf did not converge")
    if not forest_parts:
        return e.select("id_a", "id_b", "w").limit(0)
    out = forest_parts[0]
    for part in forest_parts[1:]:
        out = out.unionByName(part)
    return out


def _kruskal_single_task(e: DataFrame) -> DataFrame:
    """One-task Kruskal over (id_a, id_b, w) — the exact forest edge set
    the Borůvka rounds compute (unique weights make the MSF unique)."""
    import numpy as np
    import pandas as pd

    def kern(batches):
        ea, eb, ew = [], [], []
        for pdf in batches:
            ea.append(pdf["id_a"].to_numpy(dtype=np.int64))
            eb.append(pdf["id_b"].to_numpy(dtype=np.int64))
            ew.append(pdf["w"].to_numpy(dtype=np.int64))
        if not ea:
            yield pd.DataFrame({"id_a": [], "id_b": [], "w": []}).astype("int64")
            return
        a = np.concatenate(ea)
        b = np.concatenate(eb)
        w = np.concatenate(ew)
        order = np.argsort(w, kind="stable")
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        oa, ob, ow = [], [], []
        for i in order.tolist():
            u, v = int(a[i]), int(b[i])
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
                oa.append(u)
                ob.append(v)
                ow.append(int(w[i]))
        yield pd.DataFrame({"id_a": oa, "id_b": ob, "w": ow}).astype("int64")

    return e.select("id_a", "id_b", "w").coalesce(1).mapInPandas(
        kern, "id_a long, id_b long, w long"
    )


N_PTS = 1500  # fixed fixture: point count (sf-independent, like the
#               image _fp fixtures, so the Kruskal replay is valid at
#               any driver scale)
R_MST = 220  # radius graph lag cap, meters (sparser than the variogram
#              cap so the forest has many nontrivial components)


def range_points(spark: SparkSession, n: int = N_PTS) -> DataFrame:
    """The geostats field over ``range(1, n+1)`` keys instead of the
    customer table — identical arithmetic, scale-independent."""
    return fixture_range(spark, 1, n + 1).selectExpr(
        "id AS point_id",
        "id * 37 % 2000 AS px",
        "id * 91 % 2000 AS py",
        "(id * 37 % 2000 + id * 91 % 2000) DIV 10 + id * 53 % 41 AS z",
    )


def radius_graph_edges(points: DataFrame, r_max: int) -> DataFrame:
    """Unique-weight edge list over the geostats radius graph:
    w = d2 * 2^36 + id_a * 2^18 + id_b (exact, collision-free while
    d2 < 2^18 and ids < 2^18 — asserted by the WHERE guard)."""
    from .geostats import _pairs

    return (
        _pairs(points, r_max)
        .where(f"d2 < {1 << 18} AND id_a < {1 << 18} AND id_b < {1 << 18}")
        .selectExpr(
            "id_a",
            "id_b",
            f"d2 * {1 << 36} + id_a * {1 << 18} + id_b AS w",
        )
    )


def _kruskal(edges):
    """Oracle-side reference: Kruskal with path-compressed union-find."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, a, b in sorted((w, a, b) for a, b, w in edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return out


def fixture_edges(n: int = N_PTS, r_max: int = R_MST):
    """Driver-side NumPy replay of the fixture edge list (exact ints)."""
    import numpy as np

    ids = np.arange(1, n + 1, dtype=np.int64)
    px, py = ids * 37 % 2000, ids * 91 % 2000
    out = []
    for i in range(n):
        d2 = (px[i + 1 :] - px[i]) ** 2 + (py[i + 1 :] - py[i]) ** 2
        sel = (d2 > 0) & (d2 <= r_max * r_max)
        for j, d in zip(ids[i + 1 :][sel], d2[sel]):
            out.append((int(ids[i]), int(j), int(d) * (1 << 36)
                        + int(ids[i]) * (1 << 18) + int(j)))
    return out


def _mst_oracle() -> str:
    from .mosaic_fp import _values_sql

    rows = _kruskal(fixture_edges())
    return _values_sql(
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("w", "BIGINT")], rows
    )


@register("mst_edges", _mst_oracle)
def mst_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest of the 220 m radius graph over the fixed
    1500-point field — Borůvka rounds, canonical under unique weights;
    the oracle replays Kruskal, certifying the identical edge set."""
    return boruvka_msf(radius_graph_edges(range_points(spark), R_MST))
