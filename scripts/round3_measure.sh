#!/bin/sh
# Round-3 measurement pass — run on a LIVE TPU chip (one TPU process at
# a time; each step is its own process).  Produces the reproducible
# artifacts VERDICT r2 #2 requires: every number BASELINE.md/PERF.md
# cites must exist in bench_results/.
#
#   sh scripts/round3_measure.sh 2>&1 | tee bench_results/round3_measure.log
set -x
cd /root/repo
mkdir -p bench_results

# 0. End-to-end verify drive (kernel parity vs scipy on pubmed,
#    K in {128, 512}, max-reduce, bf16).
python scripts/verify_drive.py

# 1. Model epochs (round-2 targets: GAT <= 12 ms, SAGE-pool <= 2.5 ms).
python -m gespmm_tpu.bench.gcn_bench  --dataset pubmed --n-epochs 100 --log-every 0 | tee bench_results/gcn_epoch.json
python -m gespmm_tpu.bench.sage_bench --dataset pubmed --n-epochs 100 --aggregator-type mean --log-every 0 | tee bench_results/sage_mean_epoch.json
python -m gespmm_tpu.bench.sage_bench --dataset pubmed --n-epochs 100 --aggregator-type pool --log-every 0 | tee bench_results/sage_pool_epoch.json
python -m gespmm_tpu.bench.sage_bench --dataset pubmed --n-epochs 100 --aggregator-type lstm --log-every 0 | tee bench_results/sage_lstm_epoch.json
python -m gespmm_tpu.bench.gat_bench  --dataset pubmed --n-epochs 100 --log-every 0 | tee bench_results/gat_epoch.json
# Stock-JAX A/B baselines (the gcn_pyg.py-style comparison, all models).
python -m gespmm_tpu.bench.gcn_bench  --dataset pubmed --n-epochs 100 --impl bcoo --log-every 0 | tee bench_results/gcn_epoch_bcoo.json
python -m gespmm_tpu.bench.sage_bench --dataset pubmed --n-epochs 100 --aggregator-type mean --impl stock --log-every 0 | tee bench_results/sage_mean_epoch_stock.json
python -m gespmm_tpu.bench.sage_bench --dataset pubmed --n-epochs 100 --aggregator-type pool --impl stock --log-every 0 | tee bench_results/sage_pool_epoch_stock.json
python -m gespmm_tpu.bench.gat_bench  --dataset pubmed --n-epochs 100 --impl stock --log-every 0 | tee bench_results/gat_epoch_stock.json

# 2. GAT cost decomposition (where does the epoch go) — checked-in
#    profile table per VERDICT r2 #4.
python scripts/gat_probe3.py | tee bench_results/gat_profile.md

# 3. SDDMM sweep.
python -m gespmm_tpu.bench.spmm_bench \
  --graphs cora citeseer pubmed rmat14 rmat16 \
  --k 32 64 128 --sddmm --validate \
  --csv bench_results/sddmm_sweep.csv \
  > bench_results/sddmm_sweep.jsonl \
  2> bench_results/spmm_sweep_errors.log

# 4. Full SpMM sweep incl. rmat18/rmat20, roofline columns, f64 golden.
#    stdout JSON lines ARE the jsonl artifact (regenerated same run as
#    the CSV — VERDICT r2 "stale jsonl" finding).
python -m gespmm_tpu.bench.spmm_bench \
  --graphs cora citeseer pubmed rmat14 rmat16 rmat18 rmat20 \
  --k 32 128 512 --validate --roofline \
  --methods xla tiled tiled-hilo bcoo \
  --csv bench_results/spmm_sweep.csv \
  > bench_results/spmm_sweep.jsonl \
  2>> bench_results/spmm_sweep_errors.log

# 5. Compiled-kernel gate.
GESPMM_RUN_TPU_GATE=1 python -m pytest tests/test_tpu_compiled.py -q

# 6. Headline.
python bench.py | tee bench_results/headline.json
