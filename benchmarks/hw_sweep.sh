#!/bin/bash
# Full hardware measurement sweep — run when the TPU tunnel is up and
# NOTHING else python is running (1-core host + exclusive tunnel session:
# concurrent jobs corrupt timings and starve each other's claims).
#
# Order matters: hardware kernel-correctness first, then the bench matrix
# (writes BENCH_NOTES.md's headline table incl. the scene_0 occlusion A/B
# row), then the MFU report, then the driver headline.
#
# Probe first: a down tunnel hangs every step inside PJRT init.
set -e
cd "$(dirname "$0")/.."

echo "== probe =="
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down — aborting sweep"; exit 1; }

echo "== TPU kernel suite =="
RTT_SLOW=1 RTT_TPU=1 timeout 3500 python -m pytest tests/test_megakernel.py -q

echo "== bench matrix (writes BENCH_NOTES.md headline table) =="
timeout 3500 python benchmarks/run_all.py --write

echo "== MFU / roofline report (+ one jax.profiler capture) =="
timeout 2400 python benchmarks/mfu.py --profile /tmp/xprof_r3

echo "== driver headline =="
timeout 2400 python bench.py

echo "== tile-shape sweep (fwd/bwd shared shapes) =="
timeout 3500 python benchmarks/tile_sweep.py --quick || true

echo "== interactive film-pass sky-cache gain =="
timeout 1200 python benchmarks/film_pass.py || true

echo "sweep complete — update BENCH_NOTES round-3 pendings, README table,"
echo "BASELINE.md achieved rows; then commit."
