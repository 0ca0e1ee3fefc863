"""Model + training integration: GCN/SAGE must learn on a community graph.

The reference's only instructed test is end-to-end training accuracy
(SURVEY §4.3); our SBM fixture plays PubMed's role: broken kernels collapse
accuracy to chance (1/num_classes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gespmm_tpu.models.gcn import GCN
from gespmm_tpu.models.sage import GraphSAGE
from gespmm_tpu.ops.spmm import Adjacency
from gespmm_tpu.ops.graph import add_self_loops
from gespmm_tpu.train.loop import train_node_classifier
from gespmm_tpu.utils.datasets import sbm_graph


@pytest.fixture(scope="module")
def sbm():
    ds = sbm_graph(n_per_class=150, num_classes=3, p_in=0.06, p_out=0.004,
                   feat_dim=32, signal=0.6, seed=0)
    adj = Adjacency.from_csr(add_self_loops(ds.csr))
    return ds, adj


def test_gcn_learns_communities(sbm):
    ds, adj = sbm
    model = GCN(dims=[32, 32, ds.num_classes], dropout_rate=0.2)
    res = train_node_classifier(
        model, adj, ds.features, ds.labels, ds.masks,
        epochs=60, lr=1e-2, seed=0,
    )
    assert res["test_acc"] > 0.85, f"GCN failed to learn: {res['test_acc']}"
    # Loss must decrease.
    assert res["history"]["loss"][-1] < res["history"]["loss"][0] * 0.5


@pytest.mark.parametrize("aggregator", ["mean", "gcn", "pool"])
def test_sage_learns_communities(sbm, aggregator):
    ds, adj = sbm
    model = GraphSAGE(
        dims=[32, 32, ds.num_classes], aggregator=aggregator, dropout_rate=0.2
    )
    res = train_node_classifier(
        model, adj, ds.features, ds.labels, ds.masks,
        epochs=60, lr=1e-2, seed=1,
    )
    assert res["test_acc"] > 0.75, (
        f"SAGE/{aggregator} failed: {res['test_acc']}"
    )


def test_gcn_forward_jits_and_is_deterministic(sbm):
    ds, adj = sbm
    model = GCN(dims=[32, 16, 3])
    params = model.init(jax.random.PRNGKey(0))
    f = jax.jit(lambda p, x: model.apply(p, adj, x))
    a = f(params, ds.features)
    b = f(params, ds.features)
    assert jnp.array_equal(a, b)
    assert a.shape == (ds.features.shape[0], 3)


def test_checkpoint_roundtrip(tmp_path, sbm):
    import optax

    from gespmm_tpu.train.checkpoint import latest_checkpoint, restore, save
    from gespmm_tpu.train.loop import TrainState

    ds, adj = sbm
    model = GCN(dims=[32, 8, 3])
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adamw(1e-2)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    save(str(tmp_path), state, 7)
    path = latest_checkpoint(str(tmp_path))
    assert path and path.endswith("ckpt_00000007.npz")
    restored, epoch = restore(path, state)
    assert epoch == 7
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rmat_generator():
    from gespmm_tpu.utils.datasets import rmat_graph

    csr = rmat_graph(scale=8, edge_factor=4, seed=0)
    assert csr.shape == (256, 256)
    assert csr.nnz > 256
    deg = np.asarray(csr.row_lengths())
    # Power-law-ish: max degree well above mean.
    assert deg.max() > 4 * max(deg.mean(), 1)


def test_sage_lstm_aggregator_learns(sbm):
    from gespmm_tpu.models.sage_lstm import build_neighbor_table

    ds, adj = sbm
    nt = build_neighbor_table(ds.csr, max_neighbors=16)
    model = GraphSAGE(
        dims=[32, 32, ds.num_classes], aggregator="lstm",
        dropout_rate=0.2, neighbor_table=nt,
    )
    res = train_node_classifier(
        model, adj, ds.features, ds.labels, ds.masks,
        epochs=40, lr=1e-2, seed=2,
    )
    assert res["test_acc"] > 0.6, f"SAGE/lstm failed: {res['test_acc']}"


def test_sage_lstm_requires_table(sbm):
    import pytest as _pytest

    ds, adj = sbm
    model = GraphSAGE(dims=[32, 8, 3], aggregator="lstm")
    params = model.init(jax.random.PRNGKey(0))
    with _pytest.raises(ValueError, match="neighbor_table"):
        model.apply(params, adj, ds.features)


def test_gat_learns_communities(sbm):
    from gespmm_tpu.models.gat import GAT

    ds, adj = sbm
    model = GAT(dims=[32, 32, ds.num_classes], dropout_rate=0.2)
    res = train_node_classifier(
        model, adj, ds.features, ds.labels, ds.masks,
        epochs=60, lr=1e-2, seed=3,
    )
    assert res["test_acc"] > 0.8, f"GAT failed: {res['test_acc']}"



def test_checkpoint_rejects_structure_mismatch(tmp_path):
    import numpy as np
    import pytest

    from gespmm_tpu.train.checkpoint import restore, save

    state = {"w": np.ones((4, 3), np.float32), "b": np.zeros((3,), np.float32)}
    path = save(str(tmp_path), state, epoch=1)

    # same leaf count, different shapes -> must raise
    bad_shape = {"w": np.ones((3, 4), np.float32),
                 "b": np.zeros((3,), np.float32)}
    with pytest.raises(ValueError, match="leaf"):
        restore(path, bad_shape)

    # same leaf count + shapes, different tree structure -> must raise
    bad_tree = {"u": np.ones((4, 3), np.float32),
                "v": np.zeros((3,), np.float32)}
    with pytest.raises(ValueError, match="structure"):
        restore(path, bad_tree)

    # matching template round-trips
    got, epoch = restore(path, state)
    assert epoch == 1
    np.testing.assert_array_equal(got["w"], state["w"])


@pytest.mark.slow
def test_accuracy_parity_ours_vs_bcoo_same_seed(tmp_path):
    """Cross-implementation accuracy A/B (the reference's only user-facing
    test is training-accuracy parity, `gcn_pyg.py` vs `gcn_custom.py`):
    the SAME GCN trained with the same seed on our kernels and on stock
    BCOO must land at the same final accuracies."""
    import json

    import numpy as np

    from gespmm_tpu.models.baselines import GCNBcoo
    from gespmm_tpu.models.gcn import GCN
    from gespmm_tpu.ops.graph import add_self_loops
    from gespmm_tpu.ops.spmm import Adjacency
    from gespmm_tpu.train.loop import train_node_classifier
    from gespmm_tpu.utils.datasets import sbm_graph

    ds = sbm_graph(n_per_class=120, num_classes=4, feat_dim=16, seed=3)
    csr = add_self_loops(ds.csr)
    adj = Adjacency.from_csr(csr, plan=True)
    dims = [16, 16, ds.num_classes]
    kw = dict(seed=7, lr=1e-2, epochs=30)

    ours = train_node_classifier(
        GCN(dims=dims, dropout_rate=0.0), adj,
        ds.features, ds.labels, ds.masks, **kw,
    )
    stock = train_node_classifier(
        GCNBcoo(dims=dims, dropout_rate=0.0),
        GCNBcoo.from_adjacency(adj),
        ds.features, ds.labels, ds.masks, **kw,
    )
    assert abs(ours["test_acc"] - stock["test_acc"]) <= 1e-4, (
        ours["test_acc"], stock["test_acc"],
    )
    assert abs(ours["val_acc"] - stock["val_acc"]) <= 1e-4
    # both must actually have learned something
    assert ours["test_acc"] > 0.5
    # record the A/B line the way the bench harness would
    line = {
        "metric": "gcn_accuracy_parity_sbm",
        "ours_test_acc": round(float(ours["test_acc"]), 4),
        "bcoo_test_acc": round(float(stock["test_acc"]), 4),
    }
    with open(tmp_path / "parity.json", "w") as f:
        json.dump(line, f)


def test_gat_multihead_trains_and_matches_xla_path():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gespmm_tpu.models.gat import GAT
    from gespmm_tpu.ops.spmm import Adjacency
    from tests.conftest import random_csr

    csr, _ = random_csr(32, 32, density=0.15, seed=41)
    adj_plan = Adjacency.from_csr(csr, plan=True, col_tile=1 << 20,
                                  rows_per_block=8, chunk_nnz=8)
    adj_xla = Adjacency.from_csr(csr)
    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.standard_normal((32, 10)).astype(np.float32))
    model = GAT(dims=[10, 4, 3], dropout_rate=0.0, heads=2)
    params = model.init(jax.random.PRNGKey(0))
    out_fused = model.apply(params, adj_plan, x)
    model_xla = GAT(dims=[10, 4, 3], dropout_rate=0.0, heads=2,
                    method="xla")
    out_xla = model_xla.apply(params, adj_xla, x)
    assert out_fused.shape == (32, 3)  # output layer: heads averaged
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_xla), rtol=1e-4, atol=1e-4
    )
    # Gradients flow through every head's parameters.
    def loss(p):
        return jnp.sum(model.apply(p, adj_plan, x) ** 2)

    g = jax.grad(loss)(params)
    for lname, lp in g.items():
        for pname, arr in lp.items():
            assert bool(jnp.any(arr != 0)), f"{lname}/{pname} grad all-zero"


def test_gat_stock_baseline_same_params_parity():
    """GATStock (segment_* + BCOO) must compute the same function as our
    GAT given identical parameters — the A/B baseline is only meaningful
    if the models are the same model."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gespmm_tpu.models.baselines import GATStock
    from gespmm_tpu.models.gat import GAT
    from gespmm_tpu.ops.spmm import Adjacency
    from tests.conftest import random_csr

    csr, _ = random_csr(40, 40, density=0.15, seed=51)
    adj = Adjacency.from_csr(csr)
    rng = np.random.default_rng(51)
    x = jnp.asarray(rng.standard_normal((40, 8)).astype(np.float32))
    ours = GAT(dims=[8, 6, 3], dropout_rate=0.0, method="xla")
    stock = GATStock(dims=[8, 6, 3], dropout_rate=0.0)
    params = ours.init(jax.random.PRNGKey(3))
    out_ours = ours.apply(params, adj, x)
    out_stock = stock.apply(params, GATStock.from_adjacency(adj), x)
    np.testing.assert_allclose(
        np.asarray(out_ours), np.asarray(out_stock), rtol=1e-4, atol=1e-4
    )


def test_sage_stock_baseline_same_params_parity():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gespmm_tpu.models.baselines import SAGEStock
    from gespmm_tpu.models.sage import GraphSAGE
    from gespmm_tpu.ops.spmm import Adjacency
    from tests.conftest import random_csr

    csr, _ = random_csr(40, 40, density=0.15, seed=53)
    # Binary adjacency: SAGE aggregators are edge-weight-free in DGL and
    # in the benches (planetoid graphs load binary); our spmm would fold
    # edge values into max/mean where the stock path does not.
    import dataclasses as _dc

    csr = _dc.replace(csr, data=None)
    adj = Adjacency.from_csr(csr)
    rng = np.random.default_rng(53)
    x = jnp.asarray(rng.standard_normal((40, 8)).astype(np.float32))
    for aggregator in ("mean", "pool"):
        ours = GraphSAGE(dims=[8, 6, 3], aggregator=aggregator,
                         dropout_rate=0.0, method="xla")
        stock = SAGEStock(dims=[8, 6, 3], aggregator=aggregator,
                          dropout_rate=0.0)
        params = ours.init(jax.random.PRNGKey(5))
        out_ours = ours.apply(params, adj, x)
        out_stock = stock.apply(
            params, SAGEStock.from_adjacency(adj, aggregator), x
        )
        np.testing.assert_allclose(
            np.asarray(out_ours), np.asarray(out_stock),
            rtol=1e-4, atol=1e-4, err_msg=aggregator,
        )
