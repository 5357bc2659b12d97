"""HyperANF: pure-Python sketch replay on a known graph."""

import hashlib

from data_model_spark.operators.hyperanf import (
    P,
    REST_BITS,
    REST_MASK,
    hyperanf_states,
)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rho(rest: int) -> int:
    if rest == 0:
        return REST_BITS + 1
    return REST_BITS - rest.bit_length() + 1


def _hll_of(nodes) -> dict[int, int]:
    regs: dict[int, int] = {}
    for n in nodes:
        h = _md5_60(str(n))
        b, rest = h >> REST_BITS, h & REST_MASK
        regs[b] = max(regs.get(b, 0), _rho(rest))
    return regs


def _edges_df(spark, pairs):
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, ["src", "dst"])


def test_matches_exact_reachability_replay(spark):
    # path 1-2-3-4 plus isolated-ish 5-6: the sketch state after t
    # rounds must equal the HLL of the EXACT <=t-hop neighborhood
    pairs = [(1, 2), (2, 3), (3, 4), (5, 6)]
    out = hyperanf_states(_edges_df(spark, pairs), rounds=2).collect()
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    reach = {v: {v} for v in adj}
    expected = {}
    for t in range(3):
        for v in adj:
            regs = _hll_of(reach[v])
            expected[(v, t)] = (len(regs), sum(regs.values()))
        reach = {
            v: r | set().union(*(reach[u] for u in adj[v])) for v, r in reach.items()
        }
    got = {(r.node, r.t): (r.n_regs, r.reg_sum) for r in out}
    assert got == expected


def test_state_monotone(spark):
    pairs = [(i, i + 1) for i in range(1, 8)]
    out = hyperanf_states(_edges_df(spark, pairs), rounds=2).collect()
    by_node = {}
    for r in out:
        by_node.setdefault(r.node, {})[r.t] = (r.n_regs, r.reg_sum)
    for states in by_node.values():
        for t in (1, 2):
            assert states[t][0] >= states[t - 1][0]
            assert states[t][1] >= states[t - 1][1]


def test_register_count_bounded(spark):
    out = hyperanf_states(_edges_df(spark, [(1, 2), (2, 3)]), rounds=1).collect()
    assert all(r.n_regs <= (1 << P) for r in out)
