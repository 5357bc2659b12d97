"""Hexagonal cell index: axial coordinates, cube rounding, k-rings.

The hexagonal sibling of the engine's square cells (`spatial.py`),
geohash strings (`geohash.py`) and Web-Mercator tiles
(`webmercator.py`) — the lattice H3/S2-style catalogs key on.  Hexes
have two properties squares lack: all 6 neighbors are equidistant
(no diagonal-vs-edge asymmetry in ring expansion), and the k-ring of
radius k is exactly ``1 + 3k(k+1)`` cells, which makes
k-ring-candidate kNN/radius joins tighter than the square 8-ring.

Encoding is the classic pointy-top axial mapping:
``qf = (x·√3/3 − y/3)/s``, ``rf = (2y/3)/s``, then *cube rounding*
(round q, r, s = −q−r to nearest ints; re-derive the coordinate with
the largest rounding error from the other two, restoring q+r+s = 0).
Rounding uses ``floor(v + 0.5)`` — not engine-native round() — so
Spark and DuckDB agree bit-for-bit (both are IEEE-754 doubles over
the identical literal constants; no HALF_UP/HALF_EVEN divergence).

Spark-first shape: the encoder is pure JVM column arithmetic (no
UDF); bucket counts are a map-side-combinable groupBy; the k-ring
join explodes a *literal* 37-offset array on the small query side and
equi-joins on (hq, hr) — the H3 `k_ring → join` candidate pattern.
Oracles are GENERATIVE DuckDB SQL over the identical expressions, so
agreement is exact by construction.  Unlike H3's aperture-7 parent
approximation, rollup here re-encodes source coordinates at the
coarser pitch — exact containment, no hierarchy error, one extra
map-only pass at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register

# constants emitted identically (via repr) into Spark literals and
# oracle SQL — same doubles, same ops order, bit-identical results
C_Q = 0.5773502691896258  # sqrt(3)/3
C_13 = 0.3333333333333333  # 1/3
C_23 = 0.6666666666666666  # 2/3
X0, Y0 = 11.0, 47.0  # recenter the 2x2-deg test box to keep |x| small
SIZE = 0.01  # hex circumradius in degrees (~40k cells over the box)
KRING = 3  # ring radius for the candidate join: 1+3*3*4 = 37 cells
PACK = 1 << 21  # packed cell id = hq * PACK + hr (collision-free for
#                 |hr| < 2^20 — lattice coords here stay under 2^13)


def hex_cols(lon: Column, lat: Column, size: float = SIZE) -> tuple[Column, Column]:
    """Axial (q, r) hex cell of (lon, lat) as pure JVM column arithmetic."""
    x, y = lon - F.lit(X0), lat - F.lit(Y0)
    qf = (x * F.lit(C_Q) - y * F.lit(C_13)) / F.lit(size)
    rf = (y * F.lit(C_23)) / F.lit(size)
    sf = -qf - rf
    # Spark floor(double) -> long, so qr/rr/sr are exact integers
    qr, rr, sr = (F.floor(v + F.lit(0.5)) for v in (qf, rf, sf))
    dq, dr, ds = (F.abs(i - f) for i, f in ((qr, qf), (rr, rf), (sr, sf)))
    fix_q = (dq > dr) & (dq > ds)
    q = F.when(fix_q, -rr - sr).otherwise(qr)
    r = F.when((~fix_q) & (dr > ds), -qr - sr).otherwise(rr)
    return q.cast("long"), r.cast("long")


def with_hex_cells(
    df: DataFrame,
    lon: Column,
    lat: Column,
    size: float = SIZE,
    q_col: str = "hq",
    r_col: str = "hr",
) -> DataFrame:
    """Staged hex encoding: (q, r) appended as ``q_col``/``r_col``.

    Same arithmetic as ``hex_cols``, built through intermediate
    projections (CollapseProject does not re-inline non-cheap
    expressions referenced more than once, SPARK-36718) so the join
    stage probes plain long attributes.

    History of a real performance hunt: with Spark's default
    ``spark.sql.codegen.hugeMethodLimit`` (65535), a broadcast join
    whose probe key is the inline ``hex_cols`` expression generated a
    whole-stage method over HotSpot's ~8000-bytecode JIT ceiling — the
    stage ran as INTERPRETED bytecode, 15x slower than volcano, while
    the same expression under an aggregation stayed under the ceiling
    and codegen'd fine.  The engine-level fix is in ``session.py``
    (hugeMethodLimit=8000: fall back exactly when HotSpot would refuse
    to JIT), after which the INLINE form is the fastest again (2.5 s vs
    5.9 s staged on a 16M-row probe) and the operators use it.  This
    helper remains for sessions that cannot carry the config.

    A second, distinct cliff hides behind the same symptom: giant
    single-invocation generator tasks (spark.range makes exactly one
    slice per core) can strand HotSpot in tier-3 OSR code after a deopt
    — see the ``spark.default.parallelism`` note in ``session.py`` for
    the measurements and the task-size fix.
    """
    t = "__hex_"
    qf = ((lon - F.lit(X0)) * F.lit(C_Q) - (lat - F.lit(Y0)) * F.lit(C_13)) / F.lit(size)
    rf = ((lat - F.lit(Y0)) * F.lit(C_23)) / F.lit(size)
    out = df.withColumn(t + "qf", qf).withColumn(t + "rf", rf)
    out = out.withColumn(t + "sf", -F.col(t + "qf") - F.col(t + "rf"))
    for c in ("qf", "rf", "sf"):
        out = out.withColumn(t + c[0] + "r", F.floor(F.col(t + c) + F.lit(0.5)))
    for c in ("qf", "rf", "sf"):
        out = out.withColumn(
            t + "d" + c[0], F.abs(F.col(t + c[0] + "r") - F.col(t + c))
        )
    fix_q = (F.col(t + "dq") > F.col(t + "dr")) & (F.col(t + "dq") > F.col(t + "ds"))
    out = out.withColumn(t + "fix", fix_q)
    out = out.withColumn(
        q_col,
        F.when(F.col(t + "fix"), -F.col(t + "rr") - F.col(t + "sr"))
        .otherwise(F.col(t + "qr"))
        .cast("long"),
    ).withColumn(
        r_col,
        F.when(
            (~F.col(t + "fix")) & (F.col(t + "dr") > F.col(t + "ds")),
            -F.col(t + "qr") - F.col(t + "sr"),
        )
        .otherwise(F.col(t + "rr"))
        .cast("long"),
    )
    return out.drop(*[c for c in out.columns if c.startswith(t)])


def _hex_sql_cte(src: str, size: float = SIZE, keep: str = "point_id") -> str:
    """CTE chain computing the identical encoder in DuckDB SQL.

    ``src`` must expose ``lon``/``lat`` plus the ``keep`` columns; the
    final CTE ``hex_{tag}`` exposes ``keep`` + (hq, hr).
    """
    tag = str(size).replace(".", "_").replace("-", "m")
    return f"""
ax_{tag} AS (
  SELECT {keep},
         ((lon - {X0!r}) * {C_Q!r} - (lat - {Y0!r}) * {C_13!r}) / {size!r} AS qf,
         ((lat - {Y0!r}) * {C_23!r}) / {size!r} AS rf
  FROM {src}),
rnd_{tag} AS (
  SELECT {keep}, qf, rf, -qf - rf AS sf,
         CAST(floor(qf + 0.5) AS BIGINT) AS qr,
         CAST(floor(rf + 0.5) AS BIGINT) AS rr,
         CAST(floor(-qf - rf + 0.5) AS BIGINT) AS sr
  FROM ax_{tag}),
hex_{tag} AS (
  SELECT {keep},
         CASE WHEN abs(qr - qf) > abs(rr - rf) AND abs(qr - qf) > abs(sr - sf)
              THEN -rr - sr ELSE qr END AS hq,
         CASE WHEN NOT (abs(qr - qf) > abs(rr - rf) AND abs(qr - qf) > abs(sr - sf))
                   AND abs(rr - rf) > abs(sr - sf)
              THEN -qr - sr ELSE rr END AS hr
  FROM rnd_{tag})"""


_PTS_SQL = """pts AS (
  SELECT c_custkey AS point_id,
         10.0 + (c_custkey * 37 % 2000) / 1000.0 AS lon,
         46.0 + (c_custkey * 91 % 2000) / 1000.0 AS lat
  FROM customer)"""


_ENCODE_ORACLE = f"""
WITH {_PTS_SQL},
{_hex_sql_cte('pts')}
SELECT point_id, hq, hr FROM hex_0_01
"""


@register("hex_encode", _ENCODE_ORACLE)
def hex_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Axial hex cell of every customer point — pure-JVM cube rounding,
    generative SQL oracle (identical doubles, exact agreement)."""
    from .spatial_queries import _points

    pts = _points(spark, sf_dir)
    q, r = hex_cols(F.col("lon"), F.col("lat"))
    return pts.select("point_id", q.alias("hq"), r.alias("hr"))


_BUCKETS_ORACLE = f"""
WITH {_PTS_SQL},
{_hex_sql_cte('pts')}
SELECT hq, hr, CAST(COUNT(*) AS BIGINT) AS n
FROM hex_0_01 GROUP BY hq, hr
"""


@register("hex_buckets", _BUCKETS_ORACLE)
def hex_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point counts per hex cell — map-side-combinable groupBy on the
    integer lattice key (the hex-partition histogram a balancer reads)."""
    from .spatial_queries import _points

    pts = _points(spark, sf_dir)
    q, r = hex_cols(F.col("lon"), F.col("lat"))
    return (
        pts.select(q.alias("hq"), r.alias("hr"))
        .groupBy("hq", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def kring_offsets(k: int) -> list[tuple[int, int]]:
    """All axial offsets with hex distance <= k (1 + 3k(k+1) of them)."""
    return [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(-k, k + 1)
        if max(abs(dq), abs(dr), abs(dq + dr)) <= k
    ]


_QRY_SQL = """qrs AS (
  SELECT s_suppkey AS query_id,
         10.0 + (s_suppkey * 53 % 2000) / 1000.0 AS lon,
         46.0 + (s_suppkey * 29 % 2000) / 1000.0 AS lat
  FROM supplier WHERE s_suppkey % 5 = 0)"""


_KRING_ORACLE = f"""
WITH {_PTS_SQL},
{_QRY_SQL},
{_hex_sql_cte('pts')},
{_hex_sql_cte('qrs', keep='query_id').replace('ax_0_01', 'qax_0_01').replace('rnd_0_01', 'qrnd_0_01').replace('hex_0_01', 'qhex_0_01')}
SELECT q.query_id, p.point_id,
       CAST((abs(q.hq - p.hq) + abs(q.hr - p.hr)
             + abs((q.hq + q.hr) - (p.hq + p.hr))) / 2 AS BIGINT) AS ring
FROM qhex_0_01 q JOIN hex_0_01 p
  ON (abs(q.hq - p.hq) + abs(q.hr - p.hr)
      + abs((q.hq + q.hr) - (p.hq + p.hr))) / 2 <= {KRING}
"""


@register("hex_kring_join", _KRING_ORACLE)
def hex_kring_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ring candidate join: explode the literal 37-offset ring on the
    small query side, equi-join on (hq, hr) — the H3 ``k_ring`` kNN
    candidate pattern.  The oracle joins on hex distance directly
    (integer-exact); the ring explode is provably the same predicate
    because ``kring_offsets`` enumerates exactly hexdist <= k."""
    from ..sources.tables import load_table
    from .spatial_queries import _points

    pts = _points(spark, sf_dir)
    pq, pr = hex_cols(F.col("lon"), F.col("lat"))
    pts = pts.select("point_id", pq.alias("hq"), pr.alias("hr"))

    sup = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_suppkey") % 5 == 0
    )
    qlon = F.lit(10.0) + F.pmod(F.col("s_suppkey") * 53, F.lit(2000)) / 1000.0
    qlat = F.lit(46.0) + F.pmod(F.col("s_suppkey") * 29, F.lit(2000)) / 1000.0
    qq, qr = hex_cols(qlon, qlat)
    qrs = sup.select(
        F.col("s_suppkey").alias("query_id"), qq.alias("qhq"), qr.alias("qhr")
    )
    # single PACKED int64 cell key (the square-cell `_pack_cell`
    # precedent): measured 6x faster than the two-column (hq, hr) key —
    # the packed join stage stays under the JIT method ceiling and
    # whole-stage codegen survives; ring distance rides along as a
    # LITERAL per offset, so the probe side carries no hex arithmetic
    offs = F.array(
        *[
            F.struct(
                F.lit(dq).alias("dq"),
                F.lit(dr).alias("dr"),
                F.lit((abs(dq) + abs(dr) + abs(dq + dr)) // 2).alias("ring"),
            )
            for dq, dr in kring_offsets(KRING)
        ]
    )
    cand = qrs.select(
        "query_id", F.explode(offs).alias("o"), "qhq", "qhr"
    ).select(
        "query_id",
        (
            (F.col("qhq") + F.col("o.dq")) * F.lit(PACK)
            + (F.col("qhr") + F.col("o.dr"))
        ).alias("cell"),
        F.col("o.ring").cast("long").alias("ring"),
    )
    pts_cell = pts.select(
        "point_id", (F.col("hq") * F.lit(PACK) + F.col("hr")).alias("cell")
    )
    return pts_cell.join(F.broadcast(cand), ["cell"]).select(
        "query_id", "point_id", "ring"
    )


ROLLUP_SIZE = 0.03  # parent pitch: 3x the leaf circumradius

_ROLLUP_ORACLE = f"""
WITH {_PTS_SQL},
{_hex_sql_cte('pts')},
{_hex_sql_cte('pts', size=ROLLUP_SIZE)}
SELECT c.hq AS phq, c.hr AS phr,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(COUNT(DISTINCT f.hq * 1000000 + f.hr) AS BIGINT) AS n_children
FROM hex_0_01 f JOIN hex_0_03 c USING (point_id)
GROUP BY c.hq, c.hr
"""


@register("hex_rollup", _ROLLUP_ORACLE)
def hex_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse-pitch rollup: per parent hex, point count and distinct
    leaf-cell count.  Exact (re-encode at 3x pitch from the source
    coordinates) — no aperture-7 hierarchy approximation; both
    encodings are one map-only pass fused by codegen."""
    from .spatial_queries import _points

    pts = _points(spark, sf_dir)
    fq, fr = hex_cols(F.col("lon"), F.col("lat"))
    cq, cr = hex_cols(F.col("lon"), F.col("lat"), size=ROLLUP_SIZE)
    enc = pts.select(
        fq.alias("fhq"), fr.alias("fhr"), cq.alias("phq"), cr.alias("phr")
    )
    return enc.groupBy("phq", "phr").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.countDistinct(
            F.col("fhq") * F.lit(1000000) + F.col("fhr")
        ).alias("n_children"),
    )
