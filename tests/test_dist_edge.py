"""Sharded SDDMM / edge-softmax / GAT on the 8-device virtual CPU mesh.

Every sharded edge op must match its single-device counterpart (same CSR,
same values) to fp tolerance, forward AND backward — the distributed
attention surface the reference never had (its SDDMM is single-GPU,
forward-only: `pytorch-custom/sddmm.cpp:63-68`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from gespmm_tpu.ops.graph import additive_attention_logits, edge_softmax
from gespmm_tpu.ops.sddmm import sddmm
from gespmm_tpu.ops.spmm import Adjacency, spmm
from gespmm_tpu.parallel.edge_ops import (
    halo_additive_logits,
    halo_edge_softmax,
    halo_gat_attention,
    halo_sddmm,
    merge_edge_values,
)
from gespmm_tpu.parallel.halo import (
    build_halo_partition,
    halo_spmm,
    pad_for_halo,
)
from gespmm_tpu.parallel.mesh import make_mesh
from tests.conftest import powerlaw_csr, random_csr

TOL = dict(rtol=1e-5, atol=1e-5)


def _pad_rows(a, rows):
    return jnp.pad(
        jnp.asarray(a), ((0, rows - a.shape[0]),) + ((0, 0),) * (a.ndim - 1)
    )


def _place(mesh, a, spec):
    return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))


@pytest.mark.parametrize(
    "parts", [pytest.param(2, marks=pytest.mark.slow), 4]
)
def test_halo_sddmm_matches_single_device(parts):
    mesh = make_mesh(data=parts, model=1, devices=jax.devices()[:parts])
    csr, _ = random_csr(60, 44, density=0.12, seed=parts)
    hp = build_halo_partition(csr, parts, tiled=False)
    rng = np.random.default_rng(parts)
    D1 = rng.standard_normal((60, 16)).astype(np.float32)
    D2 = rng.standard_normal((44, 16)).astype(np.float32)
    d1 = _place(mesh, _pad_rows(D1, hp.num_parts * hp.rpp), P("data", None))
    d2 = _place(mesh, _pad_rows(D2, hp.num_parts * hp.cpp), P("data", None))
    dv, hv = halo_sddmm(hp, d1, d2, mesh, model_axis=None)
    got = np.asarray(merge_edge_values(hp, dv, hv))
    expect = np.asarray(sddmm(csr, jnp.asarray(D1), jnp.asarray(D2)))
    np.testing.assert_allclose(got, expect, **TOL)


def test_halo_sddmm_model_axis_psum():
    # K sharded over the model axis: the contraction must psum.
    mesh = make_mesh(data=4, model=2)
    csr, _ = random_csr(48, 48, density=0.12, seed=7)
    hp = build_halo_partition(csr, 4, tiled=False)
    rng = np.random.default_rng(7)
    D1 = rng.standard_normal((48, 32)).astype(np.float32)
    D2 = rng.standard_normal((48, 32)).astype(np.float32)
    d1 = _place(mesh, _pad_rows(D1, 4 * hp.rpp), P("data", "model"))
    d2 = _place(mesh, _pad_rows(D2, 4 * hp.cpp), P("data", "model"))
    dv, hv = halo_sddmm(hp, d1, d2, mesh)
    got = np.asarray(merge_edge_values(hp, dv, hv))
    expect = np.asarray(sddmm(csr, jnp.asarray(D1), jnp.asarray(D2)))
    np.testing.assert_allclose(got, expect, **TOL)


def test_halo_additive_logits_and_softmax_match_single_device():
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    csr, _ = powerlaw_csr(70, 70, avg_deg=6, seed=11)
    hp = build_halo_partition(csr, 4, tiled=False)
    rng = np.random.default_rng(11)
    H = 3
    src = rng.standard_normal((70, H)).astype(np.float32)
    dst = rng.standard_normal((70, H)).astype(np.float32)
    sp = _place(mesh, _pad_rows(src, 4 * hp.rpp), P("data", None))
    dp = _place(mesh, _pad_rows(dst, 4 * hp.cpp), P("data", None))
    dl, hl = halo_additive_logits(hp, sp, dp, mesh)
    adj = Adjacency.from_csr(csr)
    logits = additive_attention_logits(adj, jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(
        np.asarray(merge_edge_values(hp, dl, hl)), np.asarray(logits), **TOL
    )
    ad, ah = halo_edge_softmax(hp, dl, hl, mesh)
    alpha = edge_softmax(adj, logits)
    np.testing.assert_allclose(
        np.asarray(merge_edge_values(hp, ad, ah)), np.asarray(alpha), **TOL
    )
    # Padded slots exactly zero; per-row alphas sum to 1 on non-empty rows.
    assert np.all(np.asarray(ad)[~np.asarray(hp.diag_mask)] == 0)
    assert np.all(np.asarray(ah)[~np.asarray(hp.halo_mask)] == 0)


@pytest.mark.slow
def test_halo_attention_chain_grads_vs_single_device():
    """d(loss)/d(features) through logits → softmax → weighted halo_spmm
    must match the single-device composition (reverse collectives via
    autodiff)."""
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    csr, _ = random_csr(52, 52, density=0.14, seed=23)
    hp = build_halo_partition(csr, 4, tiled=True)
    rng = np.random.default_rng(23)
    X = rng.standard_normal((52, 8)).astype(np.float32)
    a_s = rng.standard_normal((8,)).astype(np.float32)
    a_d = rng.standard_normal((8,)).astype(np.float32)
    w = rng.standard_normal((52,)).astype(np.float32)
    m_pad = 4 * hp.rpp
    wp = _pad_rows(w[:, None], m_pad)[:, 0]

    def dist_loss(x):
        ad, ah = halo_gat_attention(hp, x, jnp.asarray(a_s), jnp.asarray(a_d),
                                    mesh)
        out = halo_spmm(hp, x, mesh, diag_vals=ad, halo_vals=ah,
                        model_axis=None)
        return jnp.sum(out * wp[:, None])

    def single_loss(x):
        adj = Adjacency.from_csr(csr)
        logits = additive_attention_logits(adj, x @ jnp.asarray(a_s),
                                           x @ jnp.asarray(a_d))
        alpha = edge_softmax(adj, jax.nn.leaky_relu(logits, 0.2))
        out = spmm(adj.with_data(alpha), x, method="xla")
        return jnp.sum(out * jnp.asarray(w)[:, None])

    xp = _place(mesh, _pad_rows(X, m_pad), P("data", None))
    ld, gd = jax.value_and_grad(dist_loss)(xp)
    ls, gs = jax.value_and_grad(single_loss)(jnp.asarray(X))
    np.testing.assert_allclose(float(ld), float(ls), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gd)[:52], np.asarray(gs), rtol=1e-4, atol=1e-4
    )
    assert np.all(np.asarray(gd)[52:] == 0)


def test_sharded_gat_train_step_loss_decreases():
    from gespmm_tpu.parallel.train_step import build_sharded_gat

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    csr, _ = powerlaw_csr(64, 64, avg_deg=5, seed=31)
    rng = np.random.default_rng(31)
    X = rng.standard_normal((64, 12)).astype(np.float32)
    labels = rng.integers(0, 4, 64)
    mask = np.ones(64, bool)
    step, (params, opt_state), prep, hp = build_sharded_gat(
        csr, 12, 8, 4, mesh, heads=2, lr=1e-2, seed=31
    )
    x, y, mk = prep(jnp.asarray(X), jnp.asarray(labels), jnp.asarray(mask))
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, x, y, mk)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("aggregator", ["mean", "pool"])
def test_sharded_sage_train_step_loss_decreases(aggregator):
    from gespmm_tpu.parallel.train_step import build_sharded_sage

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    csr, _ = powerlaw_csr(64, 64, avg_deg=5, seed=13)
    rng = np.random.default_rng(13)
    X = rng.standard_normal((64, 12)).astype(np.float32)
    labels = rng.integers(0, 4, 64)
    mask = np.ones(64, bool)
    step, (params, opt_state), prep, hp = build_sharded_sage(
        csr, 12, 8, 4, mesh, aggregator=aggregator, lr=1e-2, seed=13
    )
    x, y, mk = prep(jnp.asarray(X), jnp.asarray(labels), jnp.asarray(mask))
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, x, y, mk)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_halo_spmm_multihead_runtime_vals_match_per_head():
    """3-D (per-head) runtime edge values on the tiled tier == looping
    heads with 2-D values over the head's feature block."""
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    csr, _ = random_csr(48, 48, density=0.15, seed=43)
    hp = build_halo_partition(csr, 4, tiled=True)
    rng = np.random.default_rng(43)
    H, dh = 2, 4
    X = _place(mesh, _pad_rows(
        rng.standard_normal((48, H * dh)).astype(np.float32), 4 * hp.cpp
    ), P("data", None))
    from gespmm_tpu.parallel.halo import split_edge_values

    vals = jnp.asarray(rng.random((csr.nnz, H)).astype(np.float32))
    dv, hv = split_edge_values(hp, vals)
    assert dv.ndim == 3 and dv.shape[2] == H
    out = halo_spmm(hp, X, mesh, diag_vals=dv, halo_vals=hv,
                    model_axis=None)
    for hd in range(H):
        dv1, hv1 = split_edge_values(hp, vals[:, hd])
        ref_h = halo_spmm(hp, X[:, hd * dh : (hd + 1) * dh], mesh,
                          diag_vals=dv1, halo_vals=hv1, model_axis=None)
        np.testing.assert_allclose(
            np.asarray(out)[:, hd * dh : (hd + 1) * dh],
            np.asarray(ref_h), rtol=1e-5, atol=1e-5, err_msg=f"head {hd}",
        )
    # Per-head edge-value gradients flow.
    def loss(v):
        dv, hv = split_edge_values(hp, v)
        return jnp.sum(halo_spmm(hp, X, mesh, diag_vals=dv, halo_vals=hv,
                                 model_axis=None) ** 2)

    gv = jax.grad(loss)(vals)
    assert gv.shape == vals.shape
    assert bool(jnp.any(gv != 0))
