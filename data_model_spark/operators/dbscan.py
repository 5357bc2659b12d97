"""Density-based spatial clustering (DBSCAN) composed from engine parts.

DBSCAN (Ester et al., KDD'96) over the distributed radius self-join
(spatial.radius_join) and the large-star/small-star connected components
(components.connected_components):

* degree = exact neighbor count within eps (one cell-keyed shuffle);
* core points have degree+1 >= min_pts;
* clusters = connected components of the core-core epsilon graph, labeled
  by minimum reachable point id;
* border points (non-core within eps of a core) join the MINIMUM cluster
  label among their core neighbors — the classic DBSCAN border ambiguity
  resolved deterministically so the result is plan- and
  parallelism-independent;
* everything else is noise (cluster -1).

Every stage is a bounded shuffle or an iterative star-contraction round —
no all-pairs anywhere; the oracle replays degrees, the core rule, a
min-label transitive closure (WITH RECURSIVE), and the border rule on the
same haversine distances.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .components import connected_components
from .registry import register
from .spatial import radius_join

#: epsilon-edge-count ceiling for the single-task labeling fast path.
#: Size-based (not core-count-based): below it the degree/core/CC/border
#: stages are pure scheduling overhead; above it the distributed path runs
#: unchanged.  The candidate radius join itself always stays distributed.
DBSCAN_SMALL_EDGES = int(_os.environ.get("DMS_DBSCAN_SMALL_EDGES", str(1 << 21)))


def _labels_single_task(edges: DataFrame, min_pts: int) -> DataFrame:
    """(node, cluster, role) for every CORE or BORDER node of the epsilon
    graph — one coalesced mapInPandas task replaying exactly the
    degree -> core -> min-id CC -> border-min rules (all integer/min
    semantics, so the replay is plan-independent).  Noise nodes are the
    caller's left-join fallback, as in the distributed path."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        a_parts, b_parts = [], []
        for pdf in batches:
            a_parts.append(pdf["id_a"].to_numpy(dtype=np.int64, copy=False))
            b_parts.append(pdf["id_b"].to_numpy(dtype=np.int64, copy=False))
        empty = pd.DataFrame(
            {"node": pd.Series(dtype="int64"),
             "cluster": pd.Series(dtype="int64"),
             "role": pd.Series(dtype="object")}
        )
        if not a_parts:
            yield empty
            return
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        nodes = np.unique(np.concatenate([a, b]))  # sorted: min index=min id
        ai = np.searchsorted(nodes, a)
        bi = np.searchsorted(nodes, b)
        n = len(nodes)
        deg = np.zeros(n, dtype=np.int64)
        np.add.at(deg, ai, 1)
        np.add.at(deg, bi, 1)
        core = deg + 1 >= min_pts

        # min-id connected components of the core-core subgraph
        comp = np.arange(n, dtype=np.int64)  # index space; ids are sorted
        cc = core[ai] & core[bi]
        cu, cv = ai[cc], bi[cc]
        while True:  # converges in O(log diameter) passes
            prev = comp.copy()
            np.minimum.at(comp, cu, comp[cv])
            np.minimum.at(comp, cv, comp[cu])
            while True:
                nxt = comp[comp]
                if np.array_equal(nxt, comp):
                    break
                comp = nxt
            if np.array_equal(prev, comp):
                break
        cluster = np.where(core, nodes[comp], -1)  # singleton core: own id

        # border: non-core with >= 1 core neighbor -> min core cluster
        sent = np.iinfo(np.int64).max
        blab = np.full(n, sent, dtype=np.int64)
        m = core[bi] & ~core[ai]
        np.minimum.at(blab, ai[m], cluster[bi[m]])
        m = core[ai] & ~core[bi]
        np.minimum.at(blab, bi[m], cluster[ai[m]])
        border = ~core & (blab != sent)

        keep = core | border
        out = pd.DataFrame(
            {
                "node": nodes[keep],
                "cluster": np.where(core, cluster, blab)[keep],
                "role": np.where(core, "core", "border")[keep],
            }
        )
        yield out if len(out) else empty

    return edges.coalesce(1).mapInPandas(
        kernel, "node long, cluster long, role string"
    )


def dbscan(
    points: DataFrame,
    eps_m: float,
    min_pts: int,
    res: int,
    lat_max: float,
    lon="lon",
    lat="lat",
    id_col="point_id",
) -> DataFrame:
    """(point_id, cluster, role) for every input point.

    role: 'core' | 'border' | 'noise'; cluster is the min point id of the
    cluster's core set, -1 for noise.
    """
    from ..cache import track
    from . import components as _cmp

    edges = radius_join(points, eps_m, res, lat_max, lon, lat, id_col).select(
        "id_a", "id_b"
    )
    if _cmp.ROUND_HOOK is None:
        # materialize the candidate refine ONCE (the real distributed work);
        # the count decides fast vs distributed labeling, and both reuse it
        edges = edges.localCheckpoint(eager=True)
        if edges.count() <= DBSCAN_SMALL_EDGES:
            lbl = _labels_single_task(edges, min_pts)
            ids = points.select(F.col(id_col).alias("pid"))
            return ids.join(lbl, ids["pid"] == lbl["node"], "left").select(
                F.col("pid").alias(id_col),
                F.coalesce("cluster", F.lit(-1)).alias("cluster"),
                F.coalesce("role", F.lit("noise")).alias("role"),
            )
    else:
        edges = track(edges)

    both = edges.select(F.col("id_a").alias("node"), F.col("id_b").alias("nbr")).unionByName(
        edges.select(F.col("id_b").alias("node"), F.col("id_a").alias("nbr"))
    )
    deg = both.groupBy("node").agg(F.count("*").alias("deg"))
    core = track(
        deg.filter(F.col("deg") + 1 >= min_pts).select(F.col("node").alias("cid"))
    )

    # cluster the core-core epsilon graph; singleton cores keep their own id
    core_edges = (
        edges.join(core.withColumnRenamed("cid", "id_a"), "id_a", "left_semi")
        .join(core.withColumnRenamed("cid", "id_b"), "id_b", "left_semi")
    )
    comps = connected_components(core_edges, "id_a", "id_b")
    core_lbl = (
        core.join(comps, core["cid"] == comps["node"], "left")
        .select(F.col("cid"), F.coalesce("comp", "cid").alias("cluster"))
    )

    # border: non-core with at least one core neighbor -> min core label
    border = (
        both.join(core.withColumnRenamed("cid", "node"), "node", "left_anti")
        .join(core_lbl.withColumnRenamed("cid", "nbr"), "nbr")
        .groupBy("node")
        .agg(F.min("cluster").alias("cluster"))
    )

    ids = points.select(F.col(id_col).alias("pid"))
    out = (
        ids.join(core_lbl, ids["pid"] == core_lbl["cid"], "left")
        .select("pid", F.col("cluster").alias("core_cluster"))
        .join(border.withColumnRenamed("node", "pid2"), F.col("pid") == F.col("pid2"), "left")
        .select(
            F.col("pid").alias(id_col),
            F.coalesce("core_cluster", "cluster", F.lit(-1)).alias("cluster"),
            F.when(F.col("core_cluster").isNotNull(), F.lit("core"))
            .when(F.col("cluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# registered queries: planted-blob points from customer keys
# ---------------------------------------------------------------------------

# 70% of customers fall in a 12x11 grid of dense blobs (+-0.002 deg jitter,
# blob diameter < 540 m, blob spacing > 11 km); 10% are "satellites" pinned
# 0.0055 deg (~611 m) north of their blob's center so only the
# jitter-favored tail of the blob is within eps — few neighbors, at least
# one of them core => border points; the rest scatter uniformly (noise).
# eps=600 m / min_pts=5 makes each blob a clique, blobs never bridge, and
# sf0.01 exercises all three roles (1119 core / 11 border / 370 noise).
_PTS_CTE = """
pts AS (
  SELECT c_custkey AS point_id,
         CASE WHEN c_custkey % 10 < 7
              THEN 10.05 + (c_custkey % 12) * 0.15
                   + ((c_custkey * 37 % 2001) - 1000) / 1000.0 * 0.002
              WHEN c_custkey % 10 = 7
              THEN 10.05 + (c_custkey % 12) * 0.15
              ELSE 10.0 + (c_custkey * 37 % 2000) / 1000.0 END AS lon,
         CASE WHEN c_custkey % 10 < 7
              THEN 46.05 + (c_custkey * 53 % 11) * 0.15
                   + ((c_custkey * 91 % 2001) - 1000) / 1000.0 * 0.002
              WHEN c_custkey % 10 = 7
              THEN 46.05 + (c_custkey * 53 % 11) * 0.15 + 0.0055
              ELSE 46.0 + (c_custkey * 91 % 2000) / 1000.0 END AS lat
  FROM customer)"""

_EPS_M, _MIN_PTS, _RES, _LAT_MAX = 600.0, 5, 14, 48.0

_DIST = """ROUND(2 * 6371008.8 * asin(sqrt(
           least(1.0, pow(sin(radians(b.lat - a.lat) / 2), 2)
             + cos(radians(a.lat)) * cos(radians(b.lat))
             * pow(sin(radians(b.lon - a.lon) / 2), 2)))), 3)"""

_PAIRS_CTE = f"""
pairs AS (
  SELECT a.point_id AS id_a, b.point_id AS id_b, {_DIST} AS dist_m
  FROM pts a JOIN pts b ON a.point_id < b.point_id),
hits AS (SELECT id_a, id_b, dist_m FROM pairs WHERE dist_m <= {_EPS_M!r})"""


def _blob_points(spark, sf_dir) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    clustered = F.pmod("k", F.lit(10)) < 7
    satellite = F.pmod("k", F.lit(10)) == 7
    jlon = (F.pmod(F.col("k") * 37, F.lit(2001)) - 1000) / F.lit(1000.0) * F.lit(0.002)
    jlat = (F.pmod(F.col("k") * 91, F.lit(2001)) - 1000) / F.lit(1000.0) * F.lit(0.002)
    blob_lon = F.lit(10.05) + F.pmod("k", F.lit(12)) * F.lit(0.15)
    blob_lat = F.lit(46.05) + F.pmod(F.col("k") * 53, F.lit(11)) * F.lit(0.15)
    lon = (
        F.when(clustered, blob_lon + jlon)
        .when(satellite, blob_lon)
        .otherwise(F.lit(10.0) + F.pmod(F.col("k") * 37, F.lit(2000)) / F.lit(1000.0))
    )
    lat = (
        F.when(clustered, blob_lat + jlat)
        .when(satellite, blob_lat + F.lit(0.0055))
        .otherwise(F.lit(46.0) + F.pmod(F.col("k") * 91, F.lit(2000)) / F.lit(1000.0))
    )
    return cust.select(F.col("k").alias("point_id"), lon.alias("lon"), lat.alias("lat"))


@register(
    "radius_pairs",
    f"WITH {_PTS_CTE[1:]},{_PAIRS_CTE[1:]}\nSELECT id_a, id_b, dist_m FROM hits",
)
def radius_pairs(spark, sf_dir):
    """Exact epsilon-neighborhood pairs over the planted-blob points; the
    oracle is the all-pairs distance filter (completeness of the 3x3 cell
    candidate join is the property under test)."""
    return radius_join(
        _blob_points(spark, sf_dir), _EPS_M, res=_RES, lat_max=_LAT_MAX
    )


_DBSCAN_ORACLE = f"""
WITH RECURSIVE {_PTS_CTE[1:]},{_PAIRS_CTE[1:]},
nbrs AS (
  SELECT id_a AS node, id_b AS nbr FROM hits
  UNION ALL SELECT id_b, id_a FROM hits),
deg AS (SELECT node, COUNT(*) AS deg FROM nbrs GROUP BY node),
core AS (SELECT node FROM deg WHERE deg + 1 >= {_MIN_PTS}),
cedges AS (
  SELECT n.node AS u, n.nbr AS v FROM nbrs n
  WHERE n.node IN (SELECT node FROM core) AND n.nbr IN (SELECT node FROM core)),
reach(u, lbl) AS (
  SELECT node, node FROM core
  UNION
  SELECT e.u, r.lbl FROM cedges e JOIN reach r ON e.v = r.u),
core_lbl AS (SELECT u AS node, MIN(lbl) AS cluster FROM reach GROUP BY u),
border AS (
  SELECT n.node, MIN(cl.cluster) AS cluster
  FROM nbrs n JOIN core_lbl cl ON cl.node = n.nbr
  WHERE n.node NOT IN (SELECT node FROM core)
  GROUP BY n.node)
SELECT p.point_id,
       CAST(COALESCE(cl.cluster, b.cluster, -1) AS BIGINT) AS cluster,
       CASE WHEN cl.node IS NOT NULL THEN 'core'
            WHEN b.node IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role
FROM pts p
LEFT JOIN core_lbl cl ON cl.node = p.point_id
LEFT JOIN border b ON b.node = p.point_id"""


@register("dbscan_clusters", _DBSCAN_ORACLE)
def dbscan_clusters(spark, sf_dir):
    """DBSCAN(eps=600 m, min_pts=4) over the planted-blob points."""
    return dbscan(
        _blob_points(spark, sf_dir), _EPS_M, _MIN_PTS, res=_RES, lat_max=_LAT_MAX
    )


# the heatmap shares the planted-blob fixture: dense blobs + sparse scatter
# make a non-trivial smoothed surface
def _heatmap_oracle(res: int = 10) -> str:
    n = 1 << res
    weights = {
        (dx, dy): (4 if dx == dy == 0 else (2 if dx == 0 or dy == 0 else 1))
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    }
    spread = "\n  UNION ALL\n".join(
        f"""  SELECT (CAST({res} AS BIGINT) << 56)
           | (CAST(y + {dy} AS BIGINT) << 28)
           | CAST((x + {dx} + {n}) % {n} AS BIGINT) AS cell_t, n * {w} AS wn
  FROM counts WHERE y + {dy} >= 0 AND y + {dy} < {n}"""
        for (dx, dy), w in weights.items()
    )
    return f"""
WITH {_PTS_CTE[1:]},
idx AS (
  SELECT least(greatest(CAST(floor((lon + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1}) AS x,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1}) AS y
  FROM pts),
counts AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n FROM idx GROUP BY x, y),
packed AS (
  SELECT (CAST({res} AS BIGINT) << 56) | (y << 28) | x AS cell, n FROM counts),
spread AS (
{spread}),
heat AS (SELECT cell_t AS cell, SUM(wn) AS heat FROM spread GROUP BY cell_t)
SELECT h.cell, CAST(h.heat AS BIGINT) AS heat,
       CAST(COALESCE(p.n, 0) AS BIGINT) AS n_own
FROM heat h LEFT JOIN packed p USING (cell)"""


@register("cell_heatmap", _heatmap_oracle(10))
def cell_heatmap_query(spark, sf_dir):
    """3x3 integer-kernel (4/2/1) density surface over the planted-blob
    points at res 10; the oracle replays cell packing, the ring spread,
    and both aggregations — integer heat, hash-exact."""
    from .spatial import cell_heatmap

    return cell_heatmap(_blob_points(spark, sf_dir), res=10)
