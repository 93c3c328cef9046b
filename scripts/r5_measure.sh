#!/bin/bash
# Round-5 publication measurement batch (sequential: ONE dev chip).
# Logs to /tmp/r5_logs/; curated into RESULTS.md.
set -u
mkdir -p /tmp/r5_logs
cd /root/repo

echo "=== stage 1: BP5 cycle sweep 7-40, auto backend, bf16-stream ==="
timeout 7000 python -m deal_and_ceed_on_gpu_tpu.drivers.bp5 \
  --cycle-min 7 --cycle-max 40 --iterations 200 --repetitions 3 \
  --backend auto --stream-dtype bfloat16 \
  > /tmp/r5_logs/sweep_bf16.log 2>&1
echo "stage 1 rc=$?"

echo "=== stage 2: BP1-BP6 at p=5, pallas kernels ==="
for bp in bp1 bp2 bp3 bp4 bp5 bp6; do
  timeout 1200 python -m deal_and_ceed_on_gpu_tpu.drivers.bp \
    --bp $bp --p-min 5 --p-max 5 --target-dofs 4000000 \
    --repetitions 3 --backend pallas \
    > /tmp/r5_logs/${bp}_p5.log 2>&1
  echo "stage 2 $bp rc=$?"
done

echo "=== stage 3: adaptive on silicon (ball-refined, rounds 2 3 4) ==="
timeout 4000 python scripts/bench_adaptive_tpu.py 2 3 4 \
  > /tmp/r5_logs/adaptive_tpu.log 2>&1
echo "stage 3 rc=$?"

echo "=== batch done ==="
