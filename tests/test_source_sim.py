"""Source similarity: direct set-arithmetic equality + symmetry bounds."""

from data_model_spark.operators.source_sim import source_similarity
from data_model_spark.sources.tables import load_table


def test_matches_direct_set_computation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = {
        (r.source_a, r.source_b): (r.inter, r.na, r.nb, r.jaccard)
        for r in source_similarity(docs).collect()
    }
    assert out
    # direct per-source shingle sets
    sets = {}
    for r in docs.select("source", "text").collect():
        ws = r.text.strip().split()
        sets.setdefault(r.source, set()).update(
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        )
    srcs = sorted(sets)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            inter = len(sets[sa] & sets[sb])
            if inter == 0:
                assert (sa, sb) not in out
                continue
            got = out[(sa, sb)]
            assert got[0] == inter and got[1] == len(sets[sa])
            assert got[2] == len(sets[sb])
            j = inter / (len(sets[sa]) + len(sets[sb]) - inter)
            assert abs(got[3] - round(j, 6)) < 1e-9
