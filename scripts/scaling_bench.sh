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
ROUNDS="${SPARK_GRAFT_SCALE_ROUNDS:-3}"
mkdir -p BENCH

RUNS_FILE=$(mktemp)
CEIL_FILE=$(mktemp)
# headline pair 2 vs 8, interleaved ROUNDS times (the sandbox host's memory
# bandwidth swings 3-5x on minute timescales from hypervisor neighbors —
# zero CPU steal, pure-compute probes stable — so medians over several
# interleaved rounds are the only honest wall-clock estimator here).
# A hardware-ceiling probe runs BEFORE EACH ROUND so every paired job
# ratio can be normalized against what the box itself could scale in
# that same window (scaling_report.py per-round normalization).
for round in $(seq 1 "$ROUNDS"); do
  echo "== ceiling probe round $round ==" >&2
  python scripts/machine_ceiling.py \
    | python -c "import json,sys; d=json.load(sys.stdin); d['round']='$round'; print(json.dumps(d))" \
    | tee -a "$CEIL_FILE" >&2
  for cores in 2 8; do
    echo "== round $round local[$cores] ==" >&2
    SPARK_GRAFT_SCALE_IMAGES="$N_IMAGES" python scripts/scaling_bench.py "$cores" "$round" 2>/dev/null | tail -1 >> "$RUNS_FILE"
    rm -rf "/dev/shm/spark-local-${cores}"
  done
done
# SMT-regime context runs (fewer rounds: reported with the hardware ceiling)
for round in 1 2; do
  echo "== context round $round local[32] ==" >&2
  SPARK_GRAFT_SCALE_IMAGES="$N_IMAGES" python scripts/scaling_bench.py 32 "ctx$round" 2>/dev/null | tail -1 >> "$RUNS_FILE"
  rm -rf "/dev/shm/spark-local-32"
done

python scripts/scaling_report.py "$RUNS_FILE" "$CEIL_FILE"
