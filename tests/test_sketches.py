"""Sketch operators vs hashlib/NumPy references + mergeability laws."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.operators import sketches


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_cms(keys, depth, width):
    table = np.zeros((depth, width), dtype=np.int64)
    for k in keys:
        for i in range(depth):
            table[i, _md5_60(f"{i}:{k}") % width] += 1
    return table


def _ref_hll_registers(keys, p):
    rest_bits = 60 - p
    regs = {}
    for k in keys:
        h = _md5_60(k)
        bucket, rest = h >> rest_bits, h & ((1 << rest_bits) - 1)
        rho = rest_bits + 1 if rest == 0 else rest_bits - rest.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


KEYS_A = [f"w{i % 37}" for i in range(400)] + ["hot"] * 60
KEYS_B = [f"w{i % 53}" for i in range(300)] + ["hot"] * 40


def test_cms_sketch_matches_reference(spark):
    got = {
        (r.row_i, r.bucket): r.cnt
        for r in sketches.cms_sketch(_keys_df(spark, KEYS_A), depth=4, width=64).collect()
    }
    ref = _ref_cms(KEYS_A, 4, 64)
    want = {
        (i, b): int(ref[i, b]) for i in range(4) for b in range(64) if ref[i, b]
    }
    assert got == want


def test_cms_estimates_never_undercount_and_min_rule(spark):
    rows = sketches.cms_estimates(_keys_df(spark, KEYS_A), depth=4, width=64).collect()
    ref = _ref_cms(KEYS_A, 4, 64)
    exact = {}
    for k in KEYS_A:
        exact[k] = exact.get(k, 0) + 1
    assert {r.key for r in rows} == set(exact)
    for r in rows:
        assert r.exact == exact[r.key]
        want_est = min(ref[i, _md5_60(f"{i}:{r.key}") % 64] for i in range(4))
        assert r.est == want_est
        assert r.est >= r.exact  # count-min never undercounts
    # the tiny width forces real collisions — the property is load-bearing
    assert any(r.est > r.exact for r in rows)


def test_cms_merge_is_elementwise_sum(spark):
    sa = sketches.cms_sketch(_keys_df(spark, KEYS_A), depth=4, width=64)
    sb = sketches.cms_sketch(_keys_df(spark, KEYS_B), depth=4, width=64)
    merged = (
        sa.unionByName(sb)
        .groupBy("row_i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    union = sketches.cms_sketch(_keys_df(spark, KEYS_A + KEYS_B), depth=4, width=64)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in union.collect()}


def test_hll_registers_match_reference(spark):
    got = {
        r.bucket: r.mj
        for r in sketches.hll_registers(_keys_df(spark, KEYS_A), p=4).collect()
    }
    assert got == _ref_hll_registers(KEYS_A, 4)


def test_hll_merge_is_elementwise_max(spark):
    ra = sketches.hll_registers(_keys_df(spark, KEYS_A), p=4)
    rb = sketches.hll_registers(_keys_df(spark, KEYS_B), p=4)
    merged = (
        ra.unionByName(rb).groupBy("bucket").agg(F.max("mj").alias("mj"))
    )
    union = sketches.hll_registers(_keys_df(spark, KEYS_A + KEYS_B), p=4)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in union.collect()}


@pytest.mark.parametrize("n,p", [(5000, 8), (200, 8)])
def test_hll_estimate_accuracy(spark, n, p):
    """Raw-regime and linear-counting-regime estimates within 3 sigma."""
    keys = [f"k{i}" for i in range(n)]
    row = sketches.hll_estimate(_keys_df(spark, keys), p=p).collect()[0]
    m = 1 << p
    sigma = 1.04 / math.sqrt(m)
    assert abs(row.est - n) / n < 3 * sigma
    if n <= m:
        assert row.n_zero > 0  # linear-counting branch actually exercised
