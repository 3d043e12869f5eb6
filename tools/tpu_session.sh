#!/bin/bash
# Sequential TPU work queue for when the tunnel is up (ONE client at a time —
# concurrent TPU processes deadlock the tunneled chip):
#   1. fresh full bench (autotuned derivative path; cylinder ratio + MFU)
#   2. Allen-Cahn PirateNet 300-epoch accuracy run with per-epoch best-model
#      tracking
#   3. quick MFU sweep over the jet-segment tuning knobs
# Logs under /tmp/tpu_session/.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_session

echo "[tpu_session] 1/3 full bench $(date)"
timeout 2400 python bench.py > /tmp/tpu_session/bench.json 2> /tmp/tpu_session/bench.err
tail -1 /tmp/tpu_session/bench.json

echo "[tpu_session] 2/3 allen_cahn piratenet accuracy $(date)"
# Fresh-seed 300-epoch run for the seed-variance evidence behind the
# flagship pin (best-of-seeds so far: 7.69e-5 @ epoch 278, 2026-08-19,
# seed 42 — artifacts/ac_piratenet_e58/metric.json holds the provenance;
# the reference pins 1.2e-5). The derivative path is chosen by the
# measured autotuner (solver/autotune.py); the staged Pallas backward is
# exercised on hardware whenever it wins the timing. ~11 s/epoch on one
# v5e incl. per-epoch eval.
# NOTE: never run a second TPU client (bench, probe, sweep) while this is
# live — two clients on the tunneled chip deadlock each other.
( cd examples && PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 9000 python allen_cahn_piratenet.py mode=train \
    TRAIN.matmul_precision=highest \
    TRAIN.eval_freq=1 \
    seed=$((RANDOM % 1000)) \
    output_dir=/tmp/tpu_session/ac_piratenet \
    > /tmp/tpu_session/allen_cahn_piratenet.log 2>&1 )
tail -3 /tmp/tpu_session/allen_cahn_piratenet.log

echo "[tpu_session] 3/3 quick MFU sweep $(date)"
timeout 5400 python tools/mfu_sweep.py --quick --steps 400 \
    > /tmp/tpu_session/mfu_sweep.log 2>&1
tail -12 /tmp/tpu_session/mfu_sweep.log
echo "[tpu_session] done $(date)"
