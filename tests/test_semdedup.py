"""SemDeDup: Spark verdicts vs a NumPy union-find replay of the same rule."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.operators import semdedup as sd
from data_model_spark.operators.ivf_kmeans import ivf_kmeans_assign
from data_model_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def ref_verdicts(ids, emb, cells, threshold):
    """Replay: within-cell cosine>=threshold edges -> union-find -> min-id keep."""
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    norm = np.linalg.norm(emb, axis=1)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if cells[ids[i]] != cells[ids[j]]:
                continue
            # HALF_UP to the 6th decimal, matching Spark F.round and DuckDB
            # ROUND — Python round() is half-to-even and could disagree on
            # an exact midpoint at the threshold
            cos = math.floor(
                float(emb[i] @ emb[j] / (norm[i] * norm[j])) * 1e6 + 0.5
            ) / 1e6
            if cos >= threshold:
                ra, rb = find(int(ids[i])), find(int(ids[j]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp_min = {}
    for i in ids:
        comp_min.setdefault(find(int(i)), int(i))
        comp_min[find(int(i))] = min(comp_min[find(int(i))], int(i))
    # keep iff min of its component (isolated vectors are their own comp)
    return {int(i): comp_min[find(int(i))] == int(i) for i in ids}


def planted_df(spark, n_clusters=3, dup_groups=2, dim=4):
    """Deterministic vectors: distinct direction per cluster, plus planted
    near-identical duplicates inside clusters."""
    rng = np.random.default_rng(42)
    base = rng.normal(0, 1, size=(n_clusters, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for m in range(12):
            v = base[c] + rng.normal(0, 0.05, dim)
            rows.append((vid, [float(x) for x in v / np.linalg.norm(v)]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, rows


def test_matches_numpy_union_find_replay(spark):
    df, rows = planted_df(spark)
    out = sd.semdedup(
        df, threshold=0.9, sample_max_id=36, k=3, iters=2, dim=4
    )
    got = {r["vec_id"]: r["keep"] for r in out.collect()}
    cells = {
        r["vec_id"]: r["cell"]
        for r in ivf_kmeans_assign(
            df, sample_max_id=36, k=3, iters=2, dim=4
        ).collect()
    }
    ids = np.array([r[0] for r in rows])
    emb = np.array([r[1] for r in rows], dtype=np.float64)
    want = ref_verdicts(ids, emb, cells, threshold=0.9)
    assert got == want
    # the planted clusters are tight: most vectors are semantic dups, so
    # the verdict set must actually prune (and keep at least one per cell)
    assert 1 <= sum(got.values()) < len(rows)


def test_one_keeper_per_component_on_testdata(spark):
    emb_df = load_table(spark, SF_DIR, "embeddings")
    out = sd.semdedup(emb_df).collect()
    assert len(out) == emb_df.count()  # a verdict for every vector
    keep = {r["vec_id"] for r in out if r["keep"]}
    # recompute the duplicate components directly and check the invariant:
    # exactly the minimum id of each component is kept
    rows = emb_df.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    emb = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cells = {
        r["vec_id"]: r["cell"] for r in ivf_kmeans_assign(emb_df).collect()
    }
    want = ref_verdicts(ids, emb, cells, sd.THRESHOLD)
    assert keep == {i for i, k in want.items() if k}
    assert 0 < len(keep) < len(out)  # non-trivial at this SF


def test_kept_set_min_dominates(spark):
    """Every dropped vector shares a component with a smaller kept id —
    i.e. keep flags encode min-id-per-component, not an arbitrary subset."""
    df, _ = planted_df(spark)
    out = sd.semdedup(df, threshold=0.9, sample_max_id=36, k=3, iters=2, dim=4)
    dropped_min = (
        out.filter(~F.col("keep"))
        .agg(F.min("vec_id").alias("m"))
        .collect()[0]["m"]
    )
    kept_min = (
        out.filter(F.col("keep")).agg(F.min("vec_id").alias("m")).collect()[0]["m"]
    )
    # vec_id 0 is the global minimum: it can never be dropped
    assert kept_min == 0
    assert dropped_min is None or dropped_min > 0


def test_single_task_tail_matches_distributed(spark, sf_dir, monkeypatch):
    from data_model_spark.operators import semdedup as smod
    from data_model_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    fast = sorted(map(tuple, smod.semdedup(emb).collect()))
    monkeypatch.setattr(smod, "SEMDEDUP_SMALL_N", 0)  # force distributed
    slow = sorted(map(tuple, smod.semdedup(emb).collect()))
    assert fast == slow and len(fast) > 0
