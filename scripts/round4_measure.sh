#!/bin/sh
# Round-4 measurement pass — run on a LIVE TPU chip (one TPU process at
# a time; each step is its own process).  Regenerates every artifact the
# round-4 docs cite (VERDICT r3 #9: every number in README/PERF/BASELINE
# must trace to a file in bench_results/ produced by THIS script).
#
#   sh scripts/round4_measure.sh 2>&1 | tee bench_results/round4_measure.log
set -x
cd /root/repo
mkdir -p bench_results

# 0. End-to-end verify drive (kernel parity vs scipy on pubmed).
python scripts/verify_drive.py

# 1. Model epochs + stock A/B (same-seed accuracy parity).
python -m gespmm_tpu.bench.gcn_bench  --dataset pubmed --n-epochs 100 --log-every 0 | tee bench_results/gcn_epoch.json
python -m gespmm_tpu.bench.sage_bench --dataset pubmed --n-epochs 100 --aggregator-type mean --log-every 0 | tee bench_results/sage_mean_epoch.json
python -m gespmm_tpu.bench.sage_bench --dataset pubmed --n-epochs 100 --aggregator-type pool --log-every 0 | tee bench_results/sage_pool_epoch.json
python -m gespmm_tpu.bench.sage_bench --dataset pubmed --n-epochs 100 --aggregator-type lstm --log-every 0 | tee bench_results/sage_lstm_epoch.json
python -m gespmm_tpu.bench.gat_bench  --dataset pubmed --n-epochs 100 --log-every 0 | tee bench_results/gat_epoch.json
python -m gespmm_tpu.bench.gcn_bench  --dataset pubmed --n-epochs 100 --impl bcoo --log-every 0 | tee bench_results/gcn_epoch_bcoo.json
python -m gespmm_tpu.bench.sage_bench --dataset pubmed --n-epochs 100 --aggregator-type mean --impl stock --log-every 0 | tee bench_results/sage_mean_epoch_stock.json
python -m gespmm_tpu.bench.sage_bench --dataset pubmed --n-epochs 100 --aggregator-type pool --impl stock --log-every 0 | tee bench_results/sage_pool_epoch_stock.json
python -m gespmm_tpu.bench.gat_bench  --dataset pubmed --n-epochs 100 --impl stock --log-every 0 | tee bench_results/gat_epoch_stock.json

# 2. Cost decompositions (profile tables the perf claims hang on).
python scripts/gat_probe3.py | tee bench_results/gat_profile.md
python scripts/pool_probe.py | tee bench_results/pool_profile.md

# 3. SDDMM sweep (one run, one row per graph — the CSV writer replaces
#    stale rows, VERDICT r3 weak #2).
python -m gespmm_tpu.bench.spmm_bench \
  --graphs cora citeseer pubmed rmat14 rmat16 \
  --k 32 64 128 --sddmm --validate \
  --csv bench_results/sddmm_sweep.csv \
  > bench_results/sddmm_sweep.jsonl \
  2> bench_results/spmm_sweep_errors.log

# 4a. Main SpMM sweep: the reference's 7-graph x K{32,128,512} matrix
#     (restores the rmat18/rmat20 rows — VERDICT r3 #1).  Per-cell OOM
#     handling records error cells instead of dying; stderr carries
#     per-cell progress lines; dual roofline columns.
python -m gespmm_tpu.bench.spmm_bench \
  --graphs cora citeseer pubmed rmat14 rmat16 rmat18 \
  --k 32 128 512 --validate --roofline \
  --methods xla tiled tiled-hilo bcoo \
  --csv bench_results/spmm_sweep.csv \
  > bench_results/spmm_sweep.jsonl \
  2>> bench_results/spmm_sweep_errors.log
# rmat20 runs in ITS OWN process: a TPU-worker crash mid-graph poisons
# every later cell of that client (observed r4: a worker fault at the
# first rmat20 cell turned the rest UNAVAILABLE); isolation caps the
# blast radius at one graph.  The single-gather formulations (XLA
# segment tier AND stock BCOO) both FAULT the worker at this scale —
# 31.4M-index gathers from an HBM table; reproduced three times at the
# first such cell — so rmat20 sweeps the stream-kernel tiers only
# (their gathers are per-tile takes from VMEM-sized tables, which the
# runtime handles).  The CSV writer field-merges the row into the
# union schema; xla/bcoo cells stay nan with the fault recorded in
# spmm_sweep_errors.log.
python -m gespmm_tpu.bench.spmm_bench \
  --graphs rmat20 \
  --k 32 128 512 --validate --roofline \
  --methods tiled tiled-hilo \
  --csv bench_results/spmm_sweep.csv \
  >> bench_results/spmm_sweep.jsonl \
  2>> bench_results/spmm_sweep_errors.log

# 4b. Extended sweep (VERDICT r3 #8): K in {64,256,512} (BASELINE.md's
#     own target points), widened corpus (banded + RECTANGULAR), the
#     scatter column (Gunrock pull-vs-push, measured at last), and
#     tiled-fast (the bf16-stream tier) at large K.
python -m gespmm_tpu.bench.spmm_bench \
  --graphs cora citeseer pubmed rmat14 rmat16 \
           banded262144-8 rect262144x16384-16 \
  --k 64 256 512 --validate --roofline \
  --methods xla tiled tiled-hilo tiled-fast scatter bcoo \
  --csv bench_results/spmm_sweep_ext.csv \
  > bench_results/spmm_sweep_ext.jsonl \
  2>> bench_results/spmm_sweep_errors.log

# 5. Compiled-kernel gate (now covers precision tiers, want_ties minmax
#    VJP, and the fused GAT fwd+bwd — VERDICT r3 #4).
GESPMM_RUN_TPU_GATE=1 python -m pytest tests/test_tpu_compiled.py -q

# 6. Headline.
python bench.py | tee bench_results/headline.json
