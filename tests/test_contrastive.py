"""Contrastive ops: Spark results vs exact NumPy replays of the same rules."""

import math

import numpy as np
import pyarrow.parquet as pq

from data_model_spark.operators.contrastive import hard_negatives, quantized_recall

SF_DIR = "/root/testdata/sf0.001"


def _round6(x: float) -> float:
    # HALF_UP at the 6th decimal, matching Spark F.round / DuckDB ROUND
    # (Python round() is half-to-even; same convention as test_semdedup)
    return math.floor(x * 1e6 + 0.5) / 1e6


def _load():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    lab = np.array(t["label"].to_pylist(), dtype=np.int64)
    return ids, emb, lab


def _cos6(a: np.ndarray, b: np.ndarray) -> float:
    return _round6(float(a @ b) / (float(np.linalg.norm(a)) * float(np.linalg.norm(b))))


def ref_quantized_ranks(ids, emb, n_queries=200, k=5):
    """Replay: half-unit HALF-UP lattice queries, rank by conditional count."""
    out = {}
    qmask = ids < n_queries
    for qi in np.where(qmask)[0]:
        qv = np.floor(emb[qi] * 2.0 + 0.5) / 2.0
        if float(qv @ qv) <= 0:
            continue
        tc = _cos6(emb[qi], qv)
        rank = 1
        for ci in range(len(ids)):
            c = _cos6(emb[ci], qv)
            if c > tc or (c == tc and ids[ci] < ids[qi]):
                rank += 1
        out[int(ids[qi])] = (tc, rank, 1 if rank <= k else 0)
    return out


def test_quantized_recall_matches_replay(spark):
    ids, emb, _ = _load()
    expected = ref_quantized_ranks(ids, emb)
    rows = quantized_recall(spark, SF_DIR).collect()
    got = {
        r["query_id"]: (r["true_cos"], r["true_rank"], r["hit_at_5"]) for r in rows
    }
    assert set(got) == set(expected)
    for qid, (tc, rank, hit) in expected.items():
        gtc, grank, ghit = got[qid]
        assert abs(gtc - tc) < 5e-7, (qid, gtc, tc)
        assert grank == rank, (qid, grank, rank)
        assert ghit == hit
    # the metric is non-vacuous: the half-unit lattice is coarse enough
    # that some true pairs drop out of rank 1
    assert any(rank > 1 for _, rank, _ in expected.values())


def ref_hard_negatives(ids, emb, lab, n_anchors=50, k=3):
    out = []
    for ai in np.where(ids < n_anchors)[0]:
        cands = [
            (-_cos6(emb[ci], emb[ai]), int(ids[ci]))
            for ci in range(len(ids))
            if lab[ci] != lab[ai]
        ]
        cands.sort()
        for rank, (negcos, nid) in enumerate(cands[:k], start=1):
            out.append((int(ids[ai]), nid, -negcos, rank))
    return sorted(out)


def test_hard_negatives_matches_replay(spark):
    ids, emb, lab = _load()
    expected = ref_hard_negatives(ids, emb, lab)
    rows = hard_negatives(spark, SF_DIR).collect()
    got = sorted(
        (r["anchor_id"], r["neg_id"], r["cosine"], r["neg_rank"]) for r in rows
    )
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g[0] == e[0] and g[1] == e[1] and g[3] == e[3], (g, e)
        assert abs(g[2] - e[2]) < 5e-7, (g, e)


def test_quantized_recall_plan_has_no_sort_or_window(spark):
    """The rank comes from a conditional aggregation, not a per-query sort."""
    plan = quantized_recall(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Sort " not in plan.replace("SortAggregate", "HashAggregate")


def test_hard_negatives_plan_pushes_topk(spark):
    """rank<=k over the window must run as WindowGroupLimit (partial top-k)."""
    plan = hard_negatives(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
