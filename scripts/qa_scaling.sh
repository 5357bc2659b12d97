#!/usr/bin/env bash
# North-rule two-parallelism protocol for the wave 31-33 QA/resample
# family (Harris, seam QA, bicubic overzoom, pyramid audit, majority):
# interleaved local[2]/local[8] pairs with a machine_ceiling.py probe
# before each round (window-matched normalization, the flagship
# protocol), one local[32] context run.  Raw JSONL to
# BENCH/qa_scaling.jsonl + BENCH/qa_ceiling.jsonl.
set -euo pipefail
cd "$(dirname "$0")/.."
ROUNDS="${SPARK_GRAFT_SCALE_ROUNDS:-2}"
OUT=BENCH/qa_scaling.jsonl
CEIL=BENCH/qa_ceiling.jsonl
: > "$OUT"
: > "$CEIL"
for round in $(seq 1 "$ROUNDS"); do
  echo "== ceiling probe round $round ==" >&2
  python scripts/machine_ceiling.py \
    | python -c "import json,sys; d=json.load(sys.stdin); d['round']='$round'; print(json.dumps(d))" \
    | tee -a "$CEIL" >&2
  for cores in 2 8; do
    echo "== round $round local[$cores] ==" >&2
    python scripts/qa_scaling.py "$cores" "$round" 2>/dev/null | tail -1 >> "$OUT"
    rm -rf "/dev/shm/spark-local-qa-${cores}"
  done
done
python scripts/qa_scaling.py 32 ctx 2>/dev/null | tail -1 >> "$OUT"
rm -rf /dev/shm/spark-local-qa-32
python - "$OUT" "$CEIL" <<'PY'
import json, statistics, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
ceils = {c["round"]: c for c in (json.loads(l) for l in open(sys.argv[2]))}
by = {}
for r in rows:
    by.setdefault(r["cores"], []).append(r["total_s"])
t2, t8 = statistics.median(by[2]), statistics.median(by[8])
pairs = sorted(set(r["round"] for r in rows if r["round"] != "ctx"))
per_round, per_round_norm = [], []
for p in pairs:
    a = next(r["total_s"] for r in rows if r["round"] == p and r["cores"] == 2)
    b = next(r["total_s"] for r in rows if r["round"] == p and r["cores"] == 8)
    eff = a / (4 * b)
    per_round.append(round(eff, 3))
    ceil = ceils.get(p, {}).get("eff_2_8")
    per_round_norm.append(round(eff / ceil, 3) if ceil else None)
per_op = {}
for op in rows[0]["timings"]:
    a = statistics.median([r["timings"][op] for r in rows if r["cores"] == 2])
    b = statistics.median([r["timings"][op] for r in rows if r["cores"] == 8])
    per_op[op] = round(a / (4 * b), 3)
med_ceil = statistics.median([c["eff_2_8"] for c in ceils.values()]) if ceils else None
eff = t2 / (4 * t8)
print(json.dumps({
    "median_t2": t2, "median_t8": t8,
    "efficiency_2_to_8": round(eff, 3),
    "median_hw_ceiling_2_8": med_ceil,
    "efficiency_normalized": round(eff / med_ceil, 3) if med_ceil else None,
    "per_round_efficiency": per_round,
    "per_round_normalized": per_round_norm,
    "per_op_efficiency": per_op,
    "t32_ctx": by.get(32, [None])[0],
}))
PY
