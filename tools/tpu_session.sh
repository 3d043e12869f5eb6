#!/bin/bash
# Sequential TPU work queue for when the tunnel is up (ONE client at a time —
# concurrent TPU processes deadlock the tunneled chip):
#   1. fresh full bench (cylinder ratio + piratenet MFU, driver-capturable)
#   2. Allen-Cahn PirateNet 300-epoch accuracy run with best-model tracking
#   3. quick MFU sweep over the jet-segment knobs
# Logs under /tmp/tpu_session/.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_session

echo "[tpu_session] 1/3 full bench $(date)"
timeout 2400 python bench.py > /tmp/tpu_session/bench.json 2> /tmp/tpu_session/bench.err
tail -1 /tmp/tpu_session/bench.json

echo "[tpu_session] 2/3 allen_cahn piratenet accuracy $(date)"
# resume from the epoch-58 checkpoint persisted in-repo (a 2026-08-18 run
# reached epoch 59 at eval L2Rel 2.2e-3 before a chip-sharing hang; full
# recipe is 300 epochs x 1000 iters at ~11 s/epoch on one v5e).
# NOTE: never run a second TPU client (bench, probe, sweep) while this is
# live — two clients on the tunneled chip deadlock each other.
( cd examples && PSCI_JET_PALLAS=0 PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 7200 python allen_cahn_piratenet.py mode=train \
    TRAIN.matmul_precision=high \
    TRAIN.checkpoint_path=/root/repo/artifacts/ac_piratenet_e58 \
    output_dir=/tmp/tpu_session/ac_piratenet \
    > /tmp/tpu_session/allen_cahn_piratenet.log 2>&1 )
tail -3 /tmp/tpu_session/allen_cahn_piratenet.log

echo "[tpu_session] 3/3 quick MFU sweep $(date)"
timeout 5400 python tools/mfu_sweep.py --quick --steps 400 \
    > /tmp/tpu_session/mfu_sweep.log 2>&1
tail -12 /tmp/tpu_session/mfu_sweep.log
echo "[tpu_session] done $(date)"
