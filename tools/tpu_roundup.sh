#!/bin/sh
# One-shot TPU artifact refresh (run when the axon tunnel is up):
#   sh tools/tpu_roundup.sh
# Produces BENCH-style JSON on stdout and PROFILE_r03.json in the repo root.
#
# NOTE: this host is a single-core VM — do not run the test suite or any
# other CPU-heavy job concurrently, or TPU program tracing starves.
set -e
cd "$(dirname "$0")/.."
echo "== devices =="
timeout 60 python -c "import jax; print(jax.devices())"
echo "== bench =="
timeout 1800 python bench.py > /tmp/bench_last.json   # no pipe: fail loudly
cat /tmp/bench_last.json
echo "== profile phases (512 worlds) =="
timeout 1200 python tools/profile_phases.py --worlds 512 --rows 10 --json \
    > PROFILE_r05.json
tail -c 400 PROFILE_r05.json
