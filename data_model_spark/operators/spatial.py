"""Spatial join engine: cell covers, point-in-polygon, kNN (north rule).

Join strategies (BASELINE.json ``north_star``):

* **broadcast PIP** — small polygon set: broadcast the polygons, assign
  points inside a single ``mapInPandas`` pass (vectorized ray casting, a
  (batch x polygons) bool matrix per Arrow batch).  No shuffle at all.
* **cell-partitioned join** — large polygon set: polygons explode to their
  cell covers (superset), points key by containing cell, equi-join on the
  int64 cell id, then exact PIP refinement *inside* the join's pandas stage.
  One shuffle, keyed by cell — the spatial analogue of the chunk-aligned
  partitioning the reference uses for zarr chunks.
* **salted variant** — hot cells (coastline megacities, satellite track
  crossovers) get split: build side replicated k ways, probe side salted by
  a point-hash; output identical to the unsalted join by construction.
* **kNN** — candidate generation by k-ring expansion around the query cell,
  exact distance refinement, per-query top-k window with deterministic
  tiebreaks.  ``grow`` re-runs under-filled queries with doubled rings
  until k candidates exist (sparse-region safety net); the brute-force
  twin validates recall in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions import cells, crs, geometry

# polygons carried as flat coordinate arrays [x0,y0,x1,y1,...] (Arrow-friendly)
POLY_SCHEMA = T.StructType(
    [
        T.StructField("poly_id", T.StringType(), False),
        T.StructField("ring", T.ArrayType(T.DoubleType()), False),
    ]
)


def _ring_to_np(ring) -> np.ndarray:
    a = np.asarray(ring, dtype=np.float64)
    return a.reshape(-1, 2)


def polygons_df(spark, polys: dict[str, np.ndarray]) -> DataFrame:
    from ..sources.tables import local_df

    rows = [(pid, [float(v) for v in np.asarray(r).ravel()]) for pid, r in polys.items()]
    return local_df(spark, rows, POLY_SCHEMA)


# ---------------------------------------------------------------------------
# cell keying
# ---------------------------------------------------------------------------


def with_point_cell(points: DataFrame, res: int, lon="lon", lat="lat") -> DataFrame:
    """Add the containing cell id per point (vectorized pandas UDF)."""

    @F.pandas_udf(T.LongType())
    def cell_udf(lo: pd.Series, la: pd.Series) -> pd.Series:
        return pd.Series(cells.cell_of(lo.to_numpy(), la.to_numpy(), res))

    return points.withColumn("cell", cell_udf(F.col(lon), F.col(lat)))


def polygon_cover_df(polys: DataFrame, res: int) -> DataFrame:
    """Explode each polygon to its exact cell cover: (poly_id, ring, cell)."""
    out_schema = T.StructType(
        list(POLY_SCHEMA.fields) + [T.StructField("cell", T.LongType(), False)]
    )

    def cover(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                ring = row.ring
                cc = cells.polygon_cover(_ring_to_np(ring), res, exact=True)
                recs.extend(
                    {"poly_id": row.poly_id, "ring": ring, "cell": int(c)} for c in cc
                )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema.fields}
            )

    return polys.mapInPandas(cover, out_schema)


# ---------------------------------------------------------------------------
# point-in-polygon joins
# ---------------------------------------------------------------------------


def pip_join_broadcast(points: DataFrame, polys: dict[str, np.ndarray],
                       lon="lon", lat="lat", id_col="point_id") -> DataFrame:
    """Broadcast PIP: tiny polygon set, zero-shuffle assignment pass."""
    items = sorted(polys.items())
    pids = [p for p, _ in items]
    rings = [np.asarray(r, dtype=np.float64) for _, r in items]
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("poly_id", T.StringType(), False),
        ]
    )

    def assign(batches):
        for pdf in batches:
            px = pdf[lon].to_numpy()
            py = pdf[lat].to_numpy()
            matrix = geometry.points_in_polygons(px, py, rings)
            rows, cols = np.nonzero(matrix)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[rows],
                    "poly_id": np.array(pids, dtype=object)[cols],
                }
            )

    return points.mapInPandas(assign, out_schema)


def _pip_refine(joined: DataFrame, lon: str, lat: str) -> DataFrame:
    """Exact PIP filter over (point, candidate polygon) rows, batched."""

    @F.pandas_udf(T.BooleanType())
    def inside(
        lo: pd.Series, la: pd.Series, ring: pd.Series, pid: pd.Series
    ) -> pd.Series:
        px = lo.to_numpy()
        py = la.to_numpy()
        out = np.zeros(len(px), dtype=bool)
        # group rows by the compact poly_id key (serializing each row's
        # ring array to group would re-materialize every polygon per row)
        for _, idx in pd.Series(range(len(px))).groupby(pid.values):
            ii = idx.to_numpy()
            poly = _ring_to_np(ring.iloc[ii[0]])
            out[ii] = geometry.points_in_polygon(px[ii], py[ii], poly)
        return pd.Series(out)

    return joined.filter(
        inside(F.col(lon), F.col(lat), F.col("ring"), F.col("poly_id"))
    )


def pip_join_cells(
    points: DataFrame,
    polys: DataFrame,
    res: int,
    lon="lon",
    lat="lat",
    salt: int | None = None,
    broadcast_covers: bool | None = None,
    broadcast_limit: int = 200_000,
) -> DataFrame:
    """Cell-keyed PIP join: cover-explode, equi-join on cell, exact refine.

    ``salt`` splits hot cells: the polygon (build) side is replicated
    ``salt`` ways and the point (probe) side picks one replica by point
    hash — the join output is provably identical to the unsalted join
    (each point meets each covering polygon exactly once).

    ``broadcast_covers``: None = auto — broadcast only when a bounded probe
    (scans at most ``broadcast_limit + 1`` cover rows) finds the exploded
    cover table small enough; a large polygon set at fine resolution falls
    back to the planner's shuffle join instead of an executor-OOM-sized
    forced broadcast.
    """
    covers = polygon_cover_df(polys, res)
    pts = with_point_cell(points, res, lon, lat)
    if salt is None:
        if broadcast_covers is None:
            # the auto-gate's bounded count would otherwise re-run the
            # pandas-UDF cover explosion a second time for the join itself —
            # persist (session cache registry: cache.unpersist_tracked
            # releases it) so the most expensive stage executes once
            from ..cache import track

            covers = track(covers)
            broadcast_covers = (
                covers.limit(broadcast_limit + 1).count() <= broadcast_limit
            )
        # build side = polygon covers (normally the small side vs the point
        # corpus); without the hint Spark may broadcast the *points* when
        # their stats happen to be smaller — backwards at 10^12 points
        joined = pts.join(
            F.broadcast(covers) if broadcast_covers else covers, "cell"
        )
    else:
        # skew path: replicate the build side `salt` ways, probe picks one
        # replica by point hash — forces the shuffled sort-merge plan the
        # hint names, so hot cells split across `salt` reducers
        salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("salt")
        covers_s = covers.select("*", salts)
        pts_s = pts.withColumn(
            "salt", F.pmod(F.xxhash64(lon, lat), F.lit(salt)).cast("int")
        )
        joined = pts_s.join(covers_s.hint("merge"), ["cell", "salt"]).drop("salt")
    return _pip_refine(joined, lon, lat).drop("ring", "cell")


# ---------------------------------------------------------------------------
# kNN
# ---------------------------------------------------------------------------


@F.pandas_udf(T.DoubleType())
def _dist_udf(
    lo1: pd.Series, la1: pd.Series, lo2: pd.Series, la2: pd.Series
) -> pd.Series:
    """Haversine meters — ONE definition shared by the ringed path and its
    brute-force twin, so the equality the twin exists to prove can't drift
    through copy-paste edits (rounding, formula)."""
    return pd.Series(
        crs.haversine_m(
            lo1.to_numpy(), la1.to_numpy(), lo2.to_numpy(), la2.to_numpy()
        )
    )


def _rank_topk(cand: DataFrame, k, lon, lat, point_id, query_id) -> DataFrame:
    """Exact-distance scoring + deterministic per-query top-k (shared tail)."""
    scored = cand.withColumn(
        "dist_m",
        F.round(_dist_udf(F.col(lon), F.col(lat), F.col("q_lon"), F.col("q_lat")), 3),
    )
    w = Window.partitionBy(query_id).orderBy("dist_m", point_id)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, point_id, "dist_m", "rank")
    )


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    res: int,
    ring: int = 1,
    lon="lon",
    lat="lat",
    point_id="point_id",
    query_id="query_id",
    grow: int = 0,
) -> DataFrame:
    """kNN via k-ring candidate generation + exact haversine refinement.

    Queries explode to their k-ring cells (broadcast — query sets are small
    relative to the point corpus), join points on cell, rank by exact
    distance.  ``ring`` must be sized so every query finds its true top-k;
    ``grow`` > 0 re-runs with a doubled ring, up to ``grow`` times, every
    query that is not PROVABLY satisfied: having k in-ring candidates is
    not enough (a closer point can sit one cell outside the ring), so a
    query only counts as done when its k-th candidate distance is within
    the ring's guaranteed covered radius — ``ring`` full cells in the
    weaker axis (longitude shrinks by cos(lat); near the poles the
    guarantee collapses and such queries keep growing until ``grow`` is
    exhausted).  Each growth step is one small driver round-trip over the
    (broadcast-sized) query set and never touches proven queries.
    """
    q_cells = with_point_cell(queries, res, lon, lat)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def ring_udf(cell: pd.Series) -> pd.Series:
        return cell.map(lambda c: [int(x) for x in cells.k_ring(int(c), ring)])

    q_ring = (
        q_cells.withColumn("ring_cells", ring_udf("cell"))
        .select(
            F.col(query_id),
            F.col(lon).alias("q_lon"),
            F.col(lat).alias("q_lat"),
            F.explode("ring_cells").alias("cell"),
        )
    )
    pts = with_point_cell(points, res, lon, lat)
    cand = pts.join(F.broadcast(q_ring), "cell")
    out = _rank_topk(cand, k, lon, lat, point_id, query_id)
    if grow > 0:
        import math

        from ..cache import track

        # the proof pass below runs the ranking job for its stats and the
        # final result reads it again (semi-join + union) — persist so the
        # candidate join + window computes once, not per consumer
        out = track(out)

        # guaranteed covered radius of the explored ring, per query: any
        # point OUTSIDE the ring is >= `ring` full cells away in some axis;
        # lat cells are 180/2^res deg (exact meters); the longitude bound is
        # computed with the SAME haversine form as _dist_udf —
        # 2*R*asin(cos(worst_lat)*sin(dlon/2)) — not a planar arc, which
        # overestimates the true minimum by ~sin^2(lat)*dlon^2/24 and could
        # wrongly prove a query whose k-th hit lands in that sliver
        m_per_deg = 111194.9  # pi * 6371008.8 / 180, matches _dist_udf's R
        r_earth = 6371008.8
        cell_h = 180.0 / (1 << res)
        cell_w = 360.0 / (1 << res)
        stats = out.groupBy(query_id).agg(
            F.count("*").alias("n"), F.max("dist_m").alias("kth")
        )
        q_lat = queries.select(query_id, F.col(lat).alias("_qlat"))
        # the proof predicate lives IN the plan (VERDICT r4 #6): per-query
        # stats never leave the executors, so grow is safe for arbitrary
        # query sets — the only driver decision is the scalar "any query
        # left?" existence check that controls the Python recursion
        sin_half_dlon = math.sin(math.radians(ring * cell_w) / 2.0)
        worst_lat = F.least(
            F.lit(89.9), F.abs(F.col("_qlat")) + F.lit((ring + 1) * cell_h)
        )
        lon_m = (
            F.lit(2.0 * r_earth)
            * F.asin(
                F.least(
                    F.lit(1.0), F.cos(F.radians(worst_lat)) * F.lit(sin_half_dlon)
                )
            )
        )
        guaranteed_m = F.least(F.lit(ring * cell_h * m_per_deg), lon_m)
        proven_df = track(
            stats.join(F.broadcast(q_lat), query_id)
            .filter((F.col("n") >= k) & (F.col("kth") < guaranteed_m - F.lit(1e-3)))
            .select(query_id)
        )
        short = queries.join(F.broadcast(proven_df), query_id, "left_anti")
        if short.limit(1).count():
            grown = knn_join(
                points, short, k, res, ring * 2, lon, lat, point_id, query_id,
                grow=grow - 1,
            )
            out = out.join(
                F.broadcast(proven_df), query_id, "left_semi"
            ).unionByName(grown)
    return out


# ---------------------------------------------------------------------------
# radius (distance) self-join
# ---------------------------------------------------------------------------


def radius_join(
    points: DataFrame,
    radius_m: float,
    res: int,
    lat_max: float,
    lon="lon",
    lat="lat",
    id_col="point_id",
) -> DataFrame:
    """All unordered point pairs within ``radius_m`` meters (exact).

    The DBSCAN/near-duplicate-GPS building block: points key by their
    containing cell, the probe side explodes to its 3x3 cell neighborhood
    (``k_ring(1)``), candidates come from ONE equi-join on the int64 cell
    id, and the exact haversine refine keeps pairs within the radius.

    Completeness requires the grid at ``res`` to be at least ``radius_m``
    wide in BOTH axes at the data's worst latitude — then two points
    within the radius are at most one cell apart in each axis, and the
    3x3 ring finds them.  ``lat_max`` is the caller's bound on |latitude|
    (longitude cells shrink by cos(lat)); the function refuses a grid too
    fine for the radius instead of silently dropping pairs.

    Each unordered pair is emitted exactly once: only the lower-id side
    explodes into the neighborhood, and the higher-id side's single
    containing cell matches exactly one ring cell.

    Scale shape: the 9x probe explosion happens map-side before the one
    cell-keyed shuffle; AQE skew-join splitting handles hot cells (a
    megacity cell at 10^12 points can also pre-split by covering at
    res+1).
    """
    import math

    m_per_deg = 111194.9
    cell_h_m = 180.0 / (1 << res) * m_per_deg
    cell_w_m = 360.0 / (1 << res) * m_per_deg * math.cos(math.radians(lat_max))
    if min(cell_h_m, cell_w_m) < radius_m:
        raise ValueError(
            f"res={res} cells are {cell_w_m:.0f}x{cell_h_m:.0f} m at lat "
            f"{lat_max} — smaller than radius {radius_m} m; pairs one ring "
            f"apart would be missed (use a coarser res)"
        )
    if res < 2:
        raise ValueError("radius_join needs res >= 2 (ring cells distinct)")

    from ..sources.tables import widen

    # widened source: from a single-row-group file the scan is ONE
    # partition, which would serialize the broadcast-probe haversine
    # refine onto one core (no-op for already-wide sources)
    pts = with_point_cell(widen(points), res, lon, lat).select(
        F.col(id_col), F.col(lon), F.col(lat), "cell"
    )

    # 3x3 ring JVM-side (pure bit arithmetic on the packed cell id —
    # whole-stage codegen, no Python in the explode): lon wraps mod n,
    # lat clamps.  res >= 2 guarantees the 9 candidates are distinct, so
    # no per-row dedup is needed (matches cells.k_ring semantics).
    n = 1 << res
    cx = F.col("cell").bitwiseAND(F.lit(cells._XY_MASK))
    cy = F.shiftright("cell", cells._Y_SHIFT).bitwiseAND(F.lit(cells._XY_MASK))
    ring = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ny = cy + F.lit(dy)
            nc = (
                F.lit(res << cells._RES_SHIFT)
                .bitwiseOR(F.shiftleft(ny.cast("long"), cells._Y_SHIFT))
                .bitwiseOR(F.pmod(cx + F.lit(dx), F.lit(n)).cast("long"))
            )
            ring.append(F.when((ny >= 0) & (ny < n), nc))
    probe = pts.select(
        F.col(id_col).alias("id_a"),
        F.col(lon).alias("lon_a"),
        F.col(lat).alias("lat_a"),
        F.explode(F.array(*ring)).alias("cell"),
    ).filter(F.col("cell").isNotNull())
    build = pts.select(
        F.col(id_col).alias("id_b"),
        F.col(lon).alias("lon_b"),
        F.col(lat).alias("lat_b"),
        "cell",
    )
    cand = probe.join(build, "cell").filter(F.col("id_a") < F.col("id_b"))
    # JVM-side bounding-box prefilter before the Arrow refine: a pair
    # within radius_m satisfies |dlat| <= r/m_per_deg exactly (meridian
    # arc) and wrap-aware |dlon| <= r/(m_per_deg*cos(lat_max)); the 1%
    # slack dwarfs the sin-vs-arc curvature deficit and the 0.5 mm the
    # 3-decimal rounding of the refine can forgive, so the box is a
    # strict superset of the haversine ball — candidates drop before the
    # Python boundary, survivors are refined exactly as before.
    dlat_max = radius_m / m_per_deg * 1.01
    dlon_max = radius_m / (m_per_deg * math.cos(math.radians(lat_max))) * 1.01
    dlon_raw = F.abs(F.col("lon_a") - F.col("lon_b"))
    dlon_eff = F.least(dlon_raw, F.lit(360.0) - dlon_raw)
    cand = cand.filter(
        (F.abs(F.col("lat_a") - F.col("lat_b")) <= F.lit(dlat_max))
        & (dlon_eff <= F.lit(dlon_max))
    )
    dist = F.round(_dist_udf("lon_a", "lat_a", "lon_b", "lat_b"), 3)
    return (
        cand.withColumn("dist_m", dist)
        .filter(F.col("dist_m") <= radius_m)
        .select("id_a", "id_b", "dist_m")
    )


# ---------------------------------------------------------------------------
# polygon-polygon overlay join
# ---------------------------------------------------------------------------


def polygon_overlay_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    res: int,
    broadcast_a: bool | None = None,
    broadcast_limit: int = 200_000,
) -> DataFrame:
    """All (a, b) pairs whose polygons intersect: cover join + exact refine.

    Completes the vector side of the raster<->vector surface (reference
    models footprint/zone relations via shapely STRtree-style queries,
    e.g. tests around scene-footprint geometry): both sides explode to
    their EXACT cell covers (``cells.polygon_cover(exact=True)``) at
    ``res``, candidates come from one equi-join on the int64 cell id, and
    each candidate pair is refined with the exact
    ``geometry.polygons_intersect`` kernel (vertex containment both ways +
    proper edge crossing, even-odd half-open rule).

    Completeness: if A intersects B, some point of the intersection lies in
    a cell c; c intersects both polygons, so c appears in BOTH exact covers
    and the pair survives the equi-join — the cover join is a superset of
    the answer at every resolution, ``res`` only tunes candidate tightness
    vs cover size.

    Scale shape: one shuffle on cell for the candidate join (or zero when
    the bounded probe finds side A's cover small enough to broadcast), one
    pair-key dedup that also deduplicates refine work across shared cells,
    then a vectorized Arrow refine stage. Both inputs can be arbitrarily
    large; per-cell fan-out is bounded by polygon density per cell, and a
    hot city-cell can be pre-split by covering at ``res+1``.
    """
    cov_a = polygon_cover_df(polys_a, res).select(
        F.col("poly_id").alias("a_id"), F.col("ring").alias("ring_a"), "cell"
    )
    cov_b = polygon_cover_df(polys_b, res).select(
        F.col("poly_id").alias("b_id"), F.col("ring").alias("ring_b"), "cell"
    )
    if broadcast_a is None:
        from ..cache import track

        cov_a = track(cov_a)
        broadcast_a = cov_a.limit(broadcast_limit + 1).count() <= broadcast_limit
    cand = cov_b.join(F.broadcast(cov_a) if broadcast_a else cov_a, "cell")
    # one refine per PAIR, not per shared cell: pairs overlapping many cells
    # would otherwise re-run the exact kernel once per cell
    pairs = cand.groupBy("a_id", "b_id").agg(
        F.first("ring_a").alias("ring_a"), F.first("ring_b").alias("ring_b")
    )

    @F.pandas_udf(T.BooleanType())
    def hits(ra: pd.Series, rb: pd.Series) -> pd.Series:
        out = np.zeros(len(ra), dtype=bool)
        for i, (ring_a, ring_b) in enumerate(zip(ra, rb)):
            out[i] = geometry.polygons_intersect(
                _ring_to_np(ring_a), _ring_to_np(ring_b)
            )
        return pd.Series(out)

    return pairs.filter(hits("ring_a", "ring_b")).select("a_id", "b_id")


# ---------------------------------------------------------------------------
# cell-set algebra: compaction, boundary extraction
# ---------------------------------------------------------------------------

_XY_MASK = (1 << 28) - 1


def _pack_cell(res: int, x, y):
    """JVM-side (res, x, y) -> int64 cell id, mirroring cells.cell_id."""
    return (
        F.shiftleft(F.lit(res).cast("long"), 56)
        .bitwiseOR(F.shiftleft(y.cast("long"), 28))
        .bitwiseOR(x.cast("long"))
    )


def compact_cover_df(
    covers: DataFrame,
    res: int,
    min_res: int,
    id_col: str = "poly_id",
    cell_col: str = "cell",
) -> DataFrame:
    """Hierarchical cell-cover compaction (H3 ``compact``), pure DataFrame ops.

    Per (id, parent) group, a complete sibling quad (all 4 children present)
    collapses to the parent; repeat from ``res`` down to ``min_res``.  The
    compacted cover is the minimal mixed-resolution representation of the
    same area — at 10^12-footprint scale it shrinks exploded cover tables
    (and any broadcast built from them) by the interior/perimeter ratio
    before the cover ever reaches a join.

    Plan shape: one hash aggregation + one left-anti join per level, keyed
    by (id, parent) — partial aggregation applies, no UDFs, no collect.
    Level count is ``res - min_res`` (single digits in practice), so the
    fixed-depth plan stays compile-time bounded.  Input cells must be
    unique per id and all at ``res`` (as produced by ``polygon_cover_df``).
    """
    if not 0 <= min_res <= res:
        raise ValueError(f"min_res must be in [0, {res}]")
    cur = covers.select(id_col, cell_col)
    outs: list[DataFrame] = []
    for r in range(res, min_res, -1):
        x = F.col(cell_col).bitwiseAND(F.lit(_XY_MASK))
        y = F.shiftright(F.col(cell_col), 28).bitwiseAND(F.lit(_XY_MASK))
        with_par = cur.withColumn(
            "_par", _pack_cell(r - 1, F.shiftright(x, 1), F.shiftright(y, 1))
        )
        promoted = (
            with_par.groupBy(id_col, "_par")
            .count()
            .filter(F.col("count") == 4)
            .select(id_col, F.col("_par").alias(cell_col))
        )
        keep = with_par.join(
            promoted.select(id_col, F.col(cell_col).alias("_par")),
            [id_col, "_par"],
            "left_anti",
        ).select(id_col, cell_col)
        outs.append(keep)
        cur = promoted
    outs.append(cur)
    out = outs[0]
    for part in outs[1:]:
        out = out.unionByName(part)
    return out


def mask_boundary_cells(
    mask: DataFrame, res: int, cell_col: str = "cell"
) -> DataFrame:
    """Rook-neighborhood boundary of a cell mask (raster -> vector edge step).

    A cell is boundary iff any of its 4 edge neighbors is absent from the
    mask (longitude wraps mod ``2^res``; off-grid latitude counts as
    absent).  This is the vectorization primitive for "outline the valid
    extent of a raster mask" — the marching step of raster->vector
    materialization on the cell grid.

    Plan shape: explode 4 neighbor keys (narrow), one self equi-join on
    the int64 cell key, one aggregation, one left-anti join — all JVM
    expressions, no UDFs.  At scale the self-join co-partitions with the
    mask's own cell partitioning, so no extra shuffle beyond the join key.
    Returns (cell, x, y).
    """
    n = 1 << res
    m = (
        mask.select(F.col(cell_col).alias("cell"))
        .distinct()
        .withColumn("x", F.col("cell").bitwiseAND(F.lit(_XY_MASK)))
        .withColumn("y", F.shiftright("cell", 28).bitwiseAND(F.lit(_XY_MASK)))
    )
    nbrs = m.select(
        "cell",
        F.explode(
            F.array(
                F.struct(
                    F.pmod(F.col("x") + 1, F.lit(n)).alias("nx"),
                    F.col("y").alias("ny"),
                ),
                F.struct(
                    F.pmod(F.col("x") - 1 + n, F.lit(n)).alias("nx"),
                    F.col("y").alias("ny"),
                ),
                F.struct(F.col("x").alias("nx"), (F.col("y") + 1).alias("ny")),
                F.struct(F.col("x").alias("nx"), (F.col("y") - 1).alias("ny")),
            )
        ).alias("nb"),
    ).withColumn(
        "nbr_cell",
        F.when(
            (F.col("nb.ny") >= 0) & (F.col("nb.ny") < n),
            _pack_cell(res, F.col("nb.nx"), F.col("nb.ny")),
        ),
    )
    present = nbrs.join(
        m.select(F.col("cell").alias("nbr_cell"), F.lit(1).alias("_hit")),
        "nbr_cell",
        "left",
    )
    interior = (
        present.groupBy("cell")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).alias("_n"))
        .filter(F.col("_n") == 4)
        .select("cell")
    )
    return m.join(interior, "cell", "left_anti").select("cell", "x", "y")


def segment_cover_cells(
    segments: DataFrame,
    res: int,
    x0="lon0",
    y0="lat0",
    x1="lon1",
    y1="lat1",
) -> DataFrame:
    """Conservative line rasterization: cells crossed by each segment.

    Vector->raster for linear features (trajectories, coastlines, swath
    edges).  A cell's closed unit square intersects the closed segment iff
    (a) it overlaps the segment's bbox and (b) the segment's supporting
    line straddles the square — for an axis-aligned box vs a convex
    segment this pair of conditions is exact, so the cover is the true
    supercover, not a sampled approximation.

    Pure JVM column arithmetic: grid-space endpoints, a two-level
    ``sequence`` explode over the bbox's cell columns/rows, then the
    4-corner cross-product straddle filter.  No UDFs, no shuffle — the
    explode is narrow, so at 10^9-segment scale this runs map-side and the
    only shuffle is whatever aggregation the caller adds downstream.
    Short segments (the common trajectory case) expand to O(1) candidate
    cells; cost is output-proportional, never grid-proportional.

    Input columns are lon/lat degrees; appends (cell, cell_x, cell_y) one
    row per (segment, covered cell).
    """
    n = 1 << res
    gx0 = (F.col(x0) + 180.0) / 360.0 * n
    gy0 = (F.col(y0) + 90.0) / 180.0 * n
    gx1 = (F.col(x1) + 180.0) / 360.0 * n
    gy1 = (F.col(y1) + 90.0) / 180.0 * n
    g = (
        segments.withColumn("_gx0", gx0)
        .withColumn("_gy0", gy0)
        .withColumn("_gx1", gx1)
        .withColumn("_gy1", gy1)
    )
    cand = g.withColumn(
        "cell_x",
        F.explode(
            F.sequence(
                F.floor(F.least("_gx0", "_gx1")),
                F.floor(F.greatest("_gx0", "_gx1")),
            )
        ),
    ).withColumn(
        "cell_y",
        F.explode(
            F.sequence(
                F.floor(F.least("_gy0", "_gy1")),
                F.floor(F.greatest("_gy0", "_gy1")),
            )
        ),
    )
    # signed area of (p0->p1, p0->corner): the segment's line meets the
    # closed square iff the 4 corner signs are not all strictly one-sided
    a = F.col("_gx1") - F.col("_gx0")
    b = F.col("_gy1") - F.col("_gy0")

    def cross(cx, cy):
        return a * (cy - F.col("_gy0")) - b * (cx - F.col("_gx0"))

    cx0, cy0 = F.col("cell_x").cast("double"), F.col("cell_y").cast("double")
    c00 = cross(cx0, cy0)
    c10 = cross(cx0 + 1.0, cy0)
    c01 = cross(cx0, cy0 + 1.0)
    c11 = cross(cx0 + 1.0, cy0 + 1.0)
    hit = (F.least(c00, c10, c01, c11) <= 0) & (F.greatest(c00, c10, c01, c11) >= 0)
    return (
        cand.filter(hit)
        .withColumn("cell", _pack_cell(res, F.col("cell_x"), F.col("cell_y")))
        .drop("_gx0", "_gy0", "_gx1", "_gy1")
    )


def knn_bruteforce(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    lon="lon",
    lat="lat",
    point_id="point_id",
    query_id="query_id",
) -> DataFrame:
    """Exact kNN oracle: broadcast cross join + window top-k."""
    q = queries.select(
        F.col(query_id), F.col(lon).alias("q_lon"), F.col(lat).alias("q_lat")
    )
    cand = points.crossJoin(F.broadcast(q))
    return _rank_topk(cand, k, lon, lat, point_id, query_id)


# ---------------------------------------------------------------------------
# cell heatmap (kernel-smoothed density surface)
# ---------------------------------------------------------------------------


def cell_heatmap(
    points: DataFrame,
    res: int,
    w_center: int = 4,
    w_edge: int = 2,
    w_corner: int = 1,
    lon="lon",
    lat="lat",
) -> DataFrame:
    """Kernel-smoothed point density per cell: (cell, heat, n_own).

    The raster face of point density (KDE with a 3x3 integer kernel —
    center/edge/corner weights): heat(c) = sum over the 3x3 ring of
    weight * count(neighbor).  Integer weights keep the surface exact and
    plan-independent.

    Scale shape: ONE count aggregation over the raw points (map-side
    combinable; the explode below touches cell COUNTS, not points), then
    a 9x JVM ring explode of the count table and a second cell-keyed sum
    — both shuffles carry only distinct-cell rows.  Same wrap/clamp ring
    as radius_join (lon wraps mod n, lat clamps; res >= 2).
    """
    if res < 2:
        raise ValueError("cell_heatmap needs res >= 2")
    counts = (
        with_point_cell(points, res, lon, lat)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
    )
    n = 1 << res
    cx = F.col("cell").bitwiseAND(F.lit(cells._XY_MASK))
    cy = F.shiftright("cell", cells._Y_SHIFT).bitwiseAND(F.lit(cells._XY_MASK))
    terms = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            w = w_center if dx == dy == 0 else (w_edge if dx == 0 or dy == 0 else w_corner)
            ny = cy + F.lit(dy)
            nc = (
                F.lit(res << cells._RES_SHIFT)
                .bitwiseOR(F.shiftleft(ny.cast("long"), cells._Y_SHIFT))
                .bitwiseOR(F.pmod(cx + F.lit(dx), F.lit(n)).cast("long"))
            )
            own = F.col("n") if dx == dy == 0 else F.lit(0)
            terms.append(
                F.when(
                    (ny >= 0) & (ny < n),
                    F.struct(
                        nc.alias("tc"),
                        (F.col("n") * w).alias("wn"),
                        own.alias("own"),
                    ),
                )
            )
    # n_own rides the center term of the spread, so ONE aggregation yields
    # both outputs — no join back to (and no recomputation of) counts
    spread = counts.select(
        "cell", "n", F.explode(F.array(*terms)).alias("t")
    ).filter(F.col("t").isNotNull())
    return spread.groupBy(F.col("t.tc").alias("cell")).agg(
        F.sum("t.wn").alias("heat"), F.sum("t.own").alias("n_own")
    )
