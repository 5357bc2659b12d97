#!/usr/bin/env bash
# North-rule two-parallelism protocol for the round-5 closing waves
# (hex/S2 lattice, Theil-Sen/seasonal/bursts series, HyperANF, EDT/
# Hough/Brovey kernels): interleaved local[2] / local[8] pairs
# (physical-core regime), median of ROUNDS rounds, plus one local[32]
# context run.  Writes raw JSONL to BENCH/newwave_scaling.jsonl.
set -euo pipefail
cd "$(dirname "$0")/.."
ROUNDS="${SPARK_GRAFT_SCALE_ROUNDS:-3}"
OUT=BENCH/newwave_scaling.jsonl
: > "$OUT"
for round in $(seq 1 "$ROUNDS"); do
  for cores in 2 8; do
    echo "== round $round local[$cores] ==" >&2
    python scripts/newwave_scaling.py "$cores" "$round" 2>/dev/null | tail -1 >> "$OUT"
    rm -rf "/dev/shm/spark-local-nw-${cores}"
  done
done
python scripts/newwave_scaling.py 32 ctx 2>/dev/null | tail -1 >> "$OUT"
rm -rf /dev/shm/spark-local-nw-32
python - "$OUT" <<'PY'
import json, statistics, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
by = {}
for r in rows:
    by.setdefault(r["cores"], []).append(r["total_s"])
t2, t8 = statistics.median(by[2]), statistics.median(by[8])
pairs = sorted(set(r["round"] for r in rows if r["round"] != "ctx"))
per_round = []
for p in pairs:
    a = next(r["total_s"] for r in rows if r["round"] == p and r["cores"] == 2)
    b = next(r["total_s"] for r in rows if r["round"] == p and r["cores"] == 8)
    per_round.append(round(a / (4 * b), 3))
per_op = {}
for op in rows[0]["timings"]:
    a = statistics.median([r["timings"][op] for r in rows if r["cores"] == 2])
    b = statistics.median([r["timings"][op] for r in rows if r["cores"] == 8])
    per_op[op] = round(a / (4 * b), 3)
print(json.dumps({
    "median_t2": t2, "median_t8": t8,
    "efficiency_2_to_8": round(t2 / (4 * t8), 3),
    "per_round_efficiency": per_round,
    "per_op_efficiency": per_op,
    "t32_ctx": by.get(32, [None])[0],
}))
PY
