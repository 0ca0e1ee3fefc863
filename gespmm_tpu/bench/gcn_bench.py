"""End-to-end GCN training benchmark.

Capability parity with `pytorch-custom/gcn_custom.py` and
`dgl-custom/benchmark/gcn/gcn_dgl.py`: CLI flags (--dataset, --n-hidden,
--n-layers, --self-loop, --n-epochs — matching `gcn_dgl.py:205-225`),
per-epoch wall time (mean after 3 warmup epochs, ≙ `gcn_dgl.py:176-186`),
final train/val/test accuracy, and an optional jax.profiler trace (the
TPU-side analogue of the torch profiler tables at `gcn_custom.py:134-143`).

Run:  python -m gespmm_tpu.bench.gcn_bench --dataset pubmed --n-hidden 32
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="pubmed",
                   help="bundled graph name, .mtx path, or 'sbm'")
    p.add_argument("--n-hidden", type=int, default=32)
    p.add_argument("--n-layers", type=int, default=2,
                   help="number of GCN layers (2 = one hidden)")
    p.add_argument("--n-epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--self-loop", action="store_true", default=True)
    p.add_argument("--no-self-loop", dest="self_loop", action="store_false")
    p.add_argument("--method", default="auto",
                   choices=["auto", "xla", "pallas", "tiled"])
    p.add_argument(
        "--impl", default="ours", choices=["ours", "bcoo"],
        help="'bcoo' trains the identical model on stock "
        "jax.experimental.sparse (the gcn_pyg.py-style A/B baseline)",
    )
    p.add_argument("--plan", action="store_true", default=True,
                   help="build the tiled stream plan for the adjacency "
                        "(default on; fastest tier)")
    p.add_argument("--no-plan", dest="plan", action="store_false")
    p.add_argument("--profile-dir", default="",
                   help="write a jax.profiler trace here")
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--log-every", type=int, default=20)
    args = p.parse_args(argv)

    import jax

    from gespmm_tpu.models.gcn import GCN
    from gespmm_tpu.ops.graph import add_self_loops
    from gespmm_tpu.ops.spmm import Adjacency
    from gespmm_tpu.train.loop import train_node_classifier
    from gespmm_tpu.utils.datasets import planetoid_style_dataset, sbm_graph

    if args.dataset == "sbm":
        ds = sbm_graph(n_per_class=500, num_classes=4)
    else:
        ds = planetoid_style_dataset(args.dataset)

    csr = add_self_loops(ds.csr) if args.self_loop else ds.csr
    adj = Adjacency.from_csr(csr, plan=args.plan)

    dims = (
        [ds.features.shape[1]]
        + [args.n_hidden] * (args.n_layers - 1)
        + [ds.num_classes]
    )
    if args.impl == "bcoo":
        from gespmm_tpu.models.baselines import GCNBcoo

        model = GCNBcoo(dims=dims, dropout_rate=args.dropout)
        adj = GCNBcoo.from_adjacency(adj)
    else:
        model = GCN(
            dims=dims, dropout_rate=args.dropout, method=args.method
        ).with_norms(adj)

    def run():
        return train_node_classifier(
            model, adj, ds.features, ds.labels, ds.masks,
            epochs=args.n_epochs, lr=args.lr,
            weight_decay=args.weight_decay,
            log_every=args.log_every,
            checkpoint_dir=args.checkpoint_dir or None,
            checkpoint_every=50 if args.checkpoint_dir else 0,
        )

    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            res = run()
    else:
        res = run()

    print(json.dumps({
        "dataset": ds.name,
        "n": int(ds.features.shape[0]),
        "nnz": csr.nnz,
        "dims": dims,
        "impl": args.impl,
        "method": args.method,
        "epochs": args.n_epochs,
        "mean_epoch_time_ms": round(res["mean_epoch_time"] * 1e3, 3),
        "train_acc": round(res["train_acc"], 4),
        "val_acc": round(res["val_acc"], 4),
        "test_acc": round(res["test_acc"], 4),
    }))


if __name__ == "__main__":
    main()
