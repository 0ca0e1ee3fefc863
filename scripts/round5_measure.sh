#!/bin/sh
# Round-5 measurement pass — run on a LIVE TPU chip (one TPU process at
# a time; each step is its own process).  Regenerates every artifact the
# round-5 docs cite (VERDICT r4 #3: the committed script must reproduce
# the committed artifacts END TO END, and the main sweep must restore
# all 7 headline rows of spmm_sweep.csv — the merge-writer preserves
# earlier rows, so the isolated rmat20 step MERGES into the same file).
#
#   sh scripts/round5_measure.sh 2>&1 | tee bench_results/round5_measure.log
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

# 3. SDDMM sweep (one run, one row per graph; the CSV writer replaces
#    stale rows and field-merges partial re-runs).
python -m gespmm_tpu.bench.spmm_bench \
  --graphs cora citeseer pubmed rmat14 rmat16 \
  --k 32 64 128 --sddmm --validate \
  --csv bench_results/sddmm_sweep.csv \
  > bench_results/sddmm_sweep.jsonl \
  2> bench_results/spmm_sweep_errors.log

# 4a. Main SpMM sweep: 6 of the 7 headline graphs x K{32,128,512}.
#     Per-cell OOM handling records error cells instead of dying;
#     stderr carries per-cell progress; dual roofline columns.
python -m gespmm_tpu.bench.spmm_bench \
  --graphs cora citeseer pubmed rmat14 rmat16 rmat18 \
  --k 32 128 512 --validate --roofline \
  --methods xla tiled tiled-hilo bcoo \
  --csv bench_results/spmm_sweep.csv \
  > bench_results/spmm_sweep.jsonl \
  2>> bench_results/spmm_sweep_errors.log
# rmat20 runs in ITS OWN process: the single-gather formulations (XLA
# segment tier AND stock BCOO) FAULT the TPU worker at 31.4M indices
# (scripts/rmat20_fault_repro.py; the library now guards those tiers at
# XLA_SEGMENT_NNZ_LIMIT), and a worker crash poisons every later cell
# of that client.  The CSV writer field-merges this row into the same
# spmm_sweep.csv WITHOUT touching the 6 rows step 4a just wrote.
python -m gespmm_tpu.bench.spmm_bench \
  --graphs rmat20 \
  --k 32 128 512 --validate --roofline \
  --methods tiled tiled-hilo \
  --csv bench_results/spmm_sweep.csv \
  >> bench_results/spmm_sweep.jsonl \
  2>> bench_results/spmm_sweep_errors.log

# 4b. Extended sweep: K in {64,256,512}, the widened corpus (banded,
#     RECTANGULAR, and round-5's Chung-Lu / 2-D grid / extreme-hub
#     families — >= 12 matrices across degree-distribution families
#     with 4a), the scatter (push) column, the bf16-stream tier, and
#     round-5's dense-MXU crossover baseline (small graphs measure it;
#     guarded graphs record the refusal as an error cell).
python -m gespmm_tpu.bench.spmm_bench \
  --graphs cora citeseer pubmed rmat14 rmat16 \
           banded262144-8 rect262144x16384-16 \
           cl262144-16 grid512 hub262144 \
  --k 64 256 512 --validate --roofline \
  --methods xla tiled tiled-hilo tiled-fast scatter bcoo dense \
  --csv bench_results/spmm_sweep_ext.csv \
  > bench_results/spmm_sweep_ext.jsonl \
  2>> bench_results/spmm_sweep_errors.log

# 4c. Max/min sweep (round 5): the aligned scan-free tier vs the scan
#     kernel vs XLA segment-max, K=128 (the pooling aggregate regime).
python scripts/minmax_sweep.py \
  --graphs cora citeseer pubmed rmat14 rmat16 \
           grid256 hub65536 banded65536-8 grid512 hub262144 \
  --k 128 \
  --csv bench_results/minmax_sweep.csv \
  2>> bench_results/spmm_sweep_errors.log

# 5. Compiled-kernel gate (per-kernel groups since round 5 — a single
#    regression reports what still passes).
GESPMM_RUN_TPU_GATE=1 python -m pytest tests/test_tpu_compiled.py -q

# 6. Headline.
python bench.py | tee bench_results/headline.json
