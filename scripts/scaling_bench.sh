#!/usr/bin/env bash
# Scaling-evidence protocol (BASELINE.json north rule, sandbox variant):
# run the SAME flagship job at N and 4N cores on identical input and report
# throughput at both plus efficiency = T_N / (4 * T_4N) into BENCH/BASELINE.md.
#
# Core-count choice: this VM exposes 32 vCPUs over 16 physical cores (SMT).
# A pure-CPU multiprocessing probe (scripts/machine_ceiling.py) shows the
# HARDWARE itself only delivers ~3x from 8->32 workers (0.75 efficiency),
# while 2->8 delivers ~3.8-4.3x — so the N=2 / 4N=8 pair runs in the
# physical-core regime where a 4x resource ratio actually exists, exactly
# the condition a real N -> 4N executor comparison has. The 8->32 pair is
# also run and reported with the measured hardware ceiling for context.
#
# Noise control: the sandbox host's memory bandwidth swings 3-5x on minute
# timescales (hypervisor neighbors; zero CPU steal, pure-compute probes
# stable). The headline pair runs ROUNDS times interleaved (2,8, 2,8, ...)
# so both configs see the same conditions; the report uses MEDIAN totals.
set -euo pipefail
cd "$(dirname "$0")/.."

N_IMAGES="${SPARK_GRAFT_SCALE_IMAGES:-4096}"
ROUNDS="${SPARK_GRAFT_SCALE_ROUNDS:-5}"
mkdir -p BENCH

echo "== machine ceiling probe ==" >&2
CEILING_JSON=$(python scripts/machine_ceiling.py)
echo "$CEILING_JSON" >&2

RUNS_FILE=$(mktemp)
# headline pair 2 vs 8, interleaved ROUNDS times (the sandbox host's memory
# bandwidth swings 3-5x on minute timescales from hypervisor neighbors —
# zero CPU steal, pure-compute probes stable — so medians over several
# interleaved rounds are the only honest wall-clock estimator here)
for round in $(seq 1 "$ROUNDS"); do
  for cores in 2 8; do
    echo "== round $round local[$cores] ==" >&2
    SPARK_GRAFT_SCALE_IMAGES="$N_IMAGES" python scripts/scaling_bench.py "$cores" 2>/dev/null | tail -1 >> "$RUNS_FILE"
    rm -rf "/dev/shm/spark-local-${cores}"
  done
done
# SMT-regime context runs (fewer rounds: reported with the hardware ceiling)
for round in 1 2; do
  echo "== context round $round local[32] ==" >&2
  SPARK_GRAFT_SCALE_IMAGES="$N_IMAGES" python scripts/scaling_bench.py 32 2>/dev/null | tail -1 >> "$RUNS_FILE"
  rm -rf "/dev/shm/spark-local-32"
done

python - "$RUNS_FILE" "$CEILING_JSON" <<'EOF'
import json, statistics, sys

runs = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
ceil = json.loads(sys.argv[2])

by_cores = {}
for r in runs:
    by_cores.setdefault(r["cores"], []).append(r)

def median_run(rs):
    """Run with the median total (representative whole row)."""
    rs = sorted(rs, key=lambda r: r["total_s"])
    return rs[len(rs) // 2]

med = {c: median_run(rs) for c, rs in by_cores.items()}
tot = {c: [r["total_s"] for r in rs] for c, rs in by_cores.items()}

def eff(lo, hi):
    return round(med[lo]["total_s"] / (4 * med[hi]["total_s"]), 3)

e_2_8 = eff(2, 8)
e_8_32 = eff(8, 32)

r2, r8, r32 = med[2], med[8], med[32]
lines = []
lines.append("# BENCH/BASELINE.md — scaling evidence (north rule protocol)\n")
lines.append("Job: flagship pipeline — synthesize image+caption rows (encode),")
lines.append("decode + PSNR>=40dB validation, multiscale tile cut, tile merge")
lines.append("(hash shuffle on (level, tile_x, tile_y)), explicit")
lines.append("repartitionByRange(level, tile_y, tile_x) + partitioned parquet write.")
lines.append(f"Identical input per run: {r2['n_images']} images,")
lines.append(f"{r2['n_tile_fragments']} tile fragments, {r2['n_merged_tiles']} merged tiles;")
lines.append("fixed 128 input partitions / 64 shuffle partitions; shuffle+output on")
lines.append("tmpfs (the sandbox's virtio disk varies 20-600 MB/s between runs and is")
lines.append("not what the protocol measures). Each core count ran "
             f"{len(tot[2])}x interleaved;")
lines.append("tables show the median-total run; all totals listed at the bottom.\n")
lines.append("## Headline: N=2 vs 4N=8 cores (physical-core regime)\n")
lines.append("| cores | total_s (median) | tiles/sec | rows/sec | images/sec |")
lines.append("|---|---|---|---|---|")
for r in (r2, r8):
    lines.append(f"| local[{r['cores']}] | {r['total_s']} | {r['tiles_per_sec']} | {r['rows_per_sec']} | {r['images_per_sec']} |")
lines.append("")
lines.append(f"**Scaling efficiency T_N/(4*T_4N) = {e_2_8}** (target >= 0.8: "
             + ("**PASS**" if e_2_8 >= 0.8 else "FAIL") + ")\n")
lines.append("## Context: 8 vs 32 cores (SMT regime — hardware ceiling applies)\n")
lines.append("| cores | total_s (median) | tiles/sec | rows/sec |")
lines.append("|---|---|---|---|")
for r in (r8, r32):
    lines.append(f"| local[{r['cores']}] | {r['total_s']} | {r['tiles_per_sec']} | {r['rows_per_sec']} |")
lines.append("")
lines.append(f"Efficiency 8->32 = {e_8_32}. The VM exposes 32 vCPUs on 16 physical")
lines.append("cores: a pure-CPU multiprocessing probe (no Spark, embarrassingly")
lines.append(f"parallel NumPy) measures {ceil['speedup_8_32']}x from 8->32 workers")
lines.append(f"(hardware efficiency {ceil['eff_8_32']}) vs {ceil['speedup_2_8']}x from 2->8")
lines.append(f"(hardware efficiency {ceil['eff_2_8']}); 4x resources do not physically")
lines.append("exist between 8 and 32 vCPUs here, which is why the N/4N comparison is")
lines.append("made in the physical-core regime above.\n")
lines.append("## Per-phase wall seconds (median runs)\n")
lines.append("| phase | local[2] | local[8] | local[32] | 2->8 speedup |")
lines.append("|---|---|---|---|---|")
for k in ("t_generate_s", "t_validate_s", "t_merge_s", "t_write_s"):
    sp = round(r2[k] / r8[k], 2)
    lines.append(f"| {k[2:-2]} | {r2[k]} | {r8[k]} | {r32[k]} | {sp}x |")
lines.append("")
lines.append("## All run totals (seconds)\n")
for c in (2, 8, 32):
    lines.append(f"- local[{c}]: " + ", ".join(str(t) for t in tot[c])
                 + f" (median {statistics.median(tot[c])})")
lines.append("")
lines.append("Raw JSON lines (median runs):\n")
for r in (r2, r8, r32):
    lines.append("    " + json.dumps(r))
lines.append("    machine_ceiling: " + json.dumps(ceil))
lines.append("")

open("BENCH/BASELINE.md", "w").write("\n".join(lines))
open("BENCH/scaling_raw.json", "w").write(json.dumps(
    {"all_runs": runs, "machine_ceiling": ceil,
     "efficiency_2_8": e_2_8, "efficiency_8_32": e_8_32}))
print(f"efficiency 2->8 = {e_2_8}; 8->32 = {e_8_32}; wrote BENCH/BASELINE.md")
EOF
