"""SemDeDup: semantic deduplication via k-means cells + within-cell cosine.

The SemDeDup recipe (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540) prunes a
training corpus by embedding similarity WITHOUT an all-pairs join: cluster
the embeddings with k-means, compare pairs only inside each cluster, and
keep one representative per group of semantic duplicates.  The reference
repo has no curation surface; this is part of the LLM-data-pipeline layer
(SURVEY.md "deduplication" / "similarity search"), composed entirely from
already-verified engine parts:

* cells come from the integer-exact Lloyd k-means (``ivf_kmeans_assign``)
  — bit-reproducible cross-engine, so the pair candidate set is
  deterministic;
* within-cell pairs join on the cell key (one cell-keyed shuffle; the
  quadratic blow-up is bounded by the cell size, which is the k-means
  operator's job to control — the published recipe sizes k so cells hold
  ~corpus/k items, e.g. k=50k on 600M LAION embeddings; here k=8 on 500);
* an edge is a pair whose cosine similarity, ROUNDED to 6 decimals on
  both engines (the ``emb_neardup_pairs`` idiom), reaches the threshold;
* duplicate groups are the connected components of the edge graph
  (large-star/small-star, ``components.connected_components``), and the
  kept representative is the minimum vec_id of each component — a
  deterministic stand-in for the paper's "farthest from centroid" pick
  (which is float-order-sensitive and so not oracle-checkable);
* every vector gets a verdict row ``(vec_id, cell, keep)``; isolated
  vectors (no duplicate) are kept.

Scale shape: one broadcast-assign pass (k-row centroid table), one
cell-keyed self-join, the O(log diameter) star-contraction rounds, and a
final left join — no stage touches more than the within-cell pair list.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import track
from ..sources.tables import load_table
from .components import connected_components
from .ivf_kmeans import ivf_kmeans_assign, _kmeans_oracle
from .registry import register
from .similarity import cosine_expr

THRESHOLD = 0.35

#: corpus-row ceiling for the single-task pair/CC/verdict tail.  Worst
#: case pair work is n^2/(2k), so the default keeps the one-task replay
#: in the low hundreds of thousands of pairs; above it the distributed
#: cell-keyed join + star-contraction path runs unchanged.
SEMDEDUP_SMALL_N = int(_os.environ.get("DMS_SEMDEDUP_SMALL_N", str(1 << 11)))


def _verdicts_single_task(with_emb: DataFrame, threshold: float) -> DataFrame:
    """(vec_id, cell, keep) in ONE task: within-cell pairs scored with the
    EXACT left-to-right cosine fold ``cosine_expr`` computes, Spark
    ``F.round`` replayed as HALF_UP on the double's shortest decimal
    repr, then min-id union-find — bit-identical to the join + CC path."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    def kernel(batches):
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            yield pd.DataFrame(
                {"vec_id": pd.Series(dtype="int64"),
                 "cell": pd.Series(dtype="int32"),
                 "keep": pd.Series(dtype="bool")}
            )
            return
        pdf = pd.concat(frames, ignore_index=True)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        cells_v = pdf["cell"].to_numpy()
        E = np.stack(pdf["e"].to_numpy()).astype(np.float64, copy=False)
        ia_all, ib_all = [], []
        for c in np.unique(cells_v):
            idx = np.flatnonzero(cells_v == c)
            if len(idx) < 2:
                continue
            # enumerate unordered pairs with id_a < id_b
            order = idx[np.argsort(ids[idx], kind="stable")]
            iu, ju = np.triu_indices(len(order), k=1)
            ia_all.append(order[iu])
            ib_all.append(order[ju])
        comp = {}
        if ia_all:
            ia = np.concatenate(ia_all)
            ib = np.concatenate(ib_all)
            A, B = E[ia], E[ib]
            dot = np.zeros(len(ia))
            na = np.zeros(len(ia))
            nb = np.zeros(len(ia))
            for i in range(E.shape[1]):  # exact cosine_expr fold order
                x, y = A[:, i], B[:, i]
                dot = dot + x * y
                na = na + x * x
                nb = nb + y * y
            cos = dot / (np.sqrt(na) * np.sqrt(nb))
            # round-HALF_UP@6 >= t  <=>  value >= t - 5e-7 (decimal), so
            # decide vectorized away from that boundary and replay the
            # exact Decimal(repr(x)) quantize only inside a 2e-9 band
            q = Decimal(1).scaleb(-6)
            bnd = float(Decimal(str(threshold)) - Decimal("5e-7"))
            keep_edge = cos >= bnd
            band = np.flatnonzero(np.abs(cos - bnd) < 2e-9)
            for j in band:
                keep_edge[j] = (
                    float(Decimal(repr(float(cos[j]))).quantize(q, ROUND_HALF_UP))
                    >= threshold
                )
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:
                    parent[x], x = r, parent[x]
                return r

            for u, v in zip(
                ids[ia[keep_edge]].tolist(), ids[ib[keep_edge]].tolist()
            ):
                ru, rv = find(u), find(v)
                if ru != rv:
                    if ru < rv:
                        parent[rv] = ru
                    else:
                        parent[ru] = rv
            comp = {n: find(n) for n in parent}
        keep = np.array(
            [comp.get(int(i), int(i)) == int(i) for i in ids], dtype=bool
        )
        yield pd.DataFrame(
            {"vec_id": pdf["vec_id"], "cell": pdf["cell"], "keep": keep}
        )

    return with_emb.coalesce(1).mapInPandas(
        kernel, "vec_id long, cell int, keep boolean"
    )


def semdedup(
    emb: DataFrame,
    threshold: float = THRESHOLD,
    sample_max_id: int = 256,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector keep verdicts: ``(vec_id, cell, keep)``.

    ``keep`` is false iff the vector sits in a within-cell cosine>=threshold
    duplicate component and is not that component's minimum id.
    """
    # persisted: the assignment plan feeds both sides of the pair self-join
    # AND the final verdict join — un-persisted it would compute three times
    cells = track(ivf_kmeans_assign(emb, sample_max_id, k, iters, dim))
    with_emb = cells.join(
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("e")),
        "vec_id",
    )

    from . import components as _cmp

    if _cmp.ROUND_HOOK is None:
        we = with_emb.localCheckpoint(eager=True)
        if we.count() <= SEMDEDUP_SMALL_N:
            return _verdicts_single_task(we, threshold)
        with_emb = we

    a = with_emb.select(
        "cell", F.col("vec_id").alias("id_a"), F.col("e").alias("emb_a")
    )
    b = with_emb.select(
        "cell", F.col("vec_id").alias("id_b"), F.col("e").alias("emb_b")
    )
    # no persist: connected_components' first move is .distinct()
    # .localCheckpoint(eager=True), so edges has exactly one consumer and a
    # cache would hold executor memory without ever being re-read
    edges = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(cosine_expr("emb_a", "emb_b"), 6) >= threshold)
        .select("id_a", "id_b")
    )
    comps = connected_components(edges, "id_a", "id_b")
    return cells.join(
        comps, cells["vec_id"] == comps["node"], "left"
    ).select(
        "vec_id",
        "cell",
        (F.col("comp").isNull() | (F.col("comp") == F.col("vec_id"))).alias(
            "keep"
        ),
    )


# ---------------------------------------------------------------------------
# oracle: kmeans CTEs + pair edges + WITH RECURSIVE min-label closure
# ---------------------------------------------------------------------------


def _semdedup_oracle(threshold: float = THRESHOLD) -> str:
    base = _kmeans_oracle()
    tail = "\nSELECT vec_id, cell FROM final"
    assert base.startswith("WITH ") and base.endswith(tail)
    ctes = base[len("WITH ") : -len(tail)]
    return f"""WITH RECURSIVE {ctes},
cells AS (SELECT vec_id, cell FROM final),
emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
edges AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN emb ea ON ea.vec_id = a.vec_id
  JOIN emb eb ON eb.vec_id = b.vec_id
  WHERE ROUND(list_cosine_similarity(ea.e, eb.e), 6) >= {threshold}),
nbrs AS (
  SELECT id_a AS u, id_b AS v FROM edges
  UNION ALL SELECT id_b, id_a FROM edges),
reach(u, lbl) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM nbrs)
  UNION
  SELECT n.u, r.lbl FROM nbrs n JOIN reach r ON n.v = r.u),
comp AS (SELECT u AS node, MIN(lbl) AS comp FROM reach GROUP BY u)
SELECT c.vec_id, c.cell,
       (p.node IS NULL OR p.comp = c.vec_id) AS keep
FROM cells c LEFT JOIN comp p ON p.node = c.vec_id"""


@register("semdedup_keep", _semdedup_oracle)
def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup verdicts over the embeddings table (k=8 cells, cos>=0.35)."""
    return semdedup(load_table(spark, sf_dir, "embeddings"))
