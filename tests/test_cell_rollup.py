"""Cell rollup: mass conservation + parent-child exactness per level."""

from data_model_spark.operators.cell_rollup import cell_rollup_counts
from data_model_spark.operators.layout import GRID_BITS, grid_points
from data_model_spark.sources.tables import load_table


def test_rollup_conserves_mass_and_nests(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    out = cell_rollup_counts(grid_points(cust)).toPandas()
    n = cust.count()
    levels = sorted(out.level.unique())
    assert levels == list(range(0, GRID_BITS + 1))
    for lvl in levels:
        g = out[out.level == lvl]
        assert g.n_points.sum() == n  # every level carries the full mass
    root = out[out.level == 0]
    assert len(root) == 1 and root.n_points.iloc[0] == n
    # parent count == sum of its (up to 4) children, checked exhaustively
    for lvl in range(GRID_BITS, 0, -1):
        child = out[out.level == lvl]
        parent = {
            (r.cx, r.cy): r.n_points
            for r in out[out.level == lvl - 1].itertuples()
        }
        acc = {}
        for r in child.itertuples():
            key = (r.cx // 2, r.cy // 2)
            acc[key] = acc.get(key, 0) + r.n_points
        assert acc == parent, lvl
