#!/bin/sh
# One-shot TPU artifact refresh (run when the axon tunnel is up):
#   sh tools/tpu_roundup.sh
# Produces BENCH-style JSON on stdout and PROFILE_r03.json in the repo root.
set -e
cd "$(dirname "$0")/.."
echo "== devices =="
timeout 60 python -c "import jax; print(jax.devices())"
echo "== bench =="
timeout 1800 python bench.py | tee /tmp/bench_last.json
echo "== profile phases (512 worlds) =="
timeout 1200 python tools/profile_phases.py --worlds 512 --rows 10 --json \
    > PROFILE_r03.json
tail -c 400 PROFILE_r03.json
