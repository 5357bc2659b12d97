"""OD flows: conservation + replay over the block-walk fixture."""

from data_model_spark.operators.od_flows import CELL, od_flows
from data_model_spark.operators.trajectory import _traj_fixture


def test_flows_match_sequential_replay(spark):
    out = {
        (r.o_cx, r.o_cy, r.d_cx, r.d_cy): r.flow
        for r in od_flows(_traj_fixture(spark)).collect()
    }
    assert out and all(v > 0 for v in out.values())
    # sequential replay via the shared NumPy fixture walks
    from collections import Counter

    from data_model_spark.operators.trajectory import _fixture_walks_np

    want = Counter()
    for _, _, x, y in _fixture_walks_np():
        cx, cy = x // CELL, y // CELL  # numpy floordiv == FLOOR(x/32.0)
        for i in range(len(cx) - 1):
            o, d = (cx[i], cy[i]), (cx[i + 1], cy[i + 1])
            if o != d:
                want[(*o, *d)] += 1
    assert out == {k: v for k, v in want.items()}
    # every moving track contributes: transitions sum across users
    assert sum(out.values()) == sum(want.values()) > 0
