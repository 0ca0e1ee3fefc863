"""Training loop for node classification — the "app" tier.

Capability parity with the reference training scripts
(`pytorch-custom/gcn_custom.py:100-143`, `dgl-custom/benchmark/gcn/
gcn_dgl.py:156-201`): Adam, NLL loss on masked nodes, per-epoch timing,
train/val/test accuracy reporting.  Improvements: jitted full train step,
deterministic PRNG threading, and checkpoint/resume (absent from the
reference — SURVEY §5.4).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: Array

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def masked_nll_loss(log_probs: Array, labels: Array, mask: Array) -> Array:
    """Mean negative log-likelihood over masked nodes (≙ F.nll_loss on the
    train split, `gcn_custom.py:115`)."""
    ll = jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    mask = mask.astype(log_probs.dtype)
    return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def accuracy(logits: Array, labels: Array, mask: Array) -> Array:
    pred = jnp.argmax(logits, axis=-1)
    hit = (pred == labels).astype(jnp.float32) * mask.astype(jnp.float32)
    return hit.sum() / jnp.maximum(mask.astype(jnp.float32).sum(), 1.0)


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    *,
    loss_fn: Callable = masked_nll_loss,
) -> Callable:
    """Build a jitted (state, adj, x, labels, mask, rng) -> (state, loss)."""

    def step(state: TrainState, adj, x, labels, mask, rng):
        def objective(params):
            lp = model.log_probs(
                params, adj, x, training=True, rng=rng
            )
            return loss_fn(lp, labels, mask)

        loss, grads = jax.value_and_grad(objective)(state.params)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(step)


def train_node_classifier(
    model,
    adj,
    x: Array,
    labels: Array,
    masks: Dict[str, Array],
    *,
    seed: int = 0,
    lr: float = 1e-2,
    weight_decay: float = 5e-4,
    epochs: int = 200,
    log_every: int = 0,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
) -> Dict[str, Any]:
    """Full training run; returns final params + metric history.

    Mirrors the reference protocol (200 epochs Adam(1e-2, wd 5e-4),
    `gcn_custom.py:106-117`) and reports epoch wall time the way the DGL
    benchmark does (mean epoch time skipping the first 3 warmup epochs,
    `gcn_dgl.py:176-186`).
    """
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = model.init(init_key)
    optimizer = optax.adamw(lr, weight_decay=weight_decay)
    state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(model, optimizer)
    eval_fn = jax.jit(lambda p: model.apply(p, adj, x))

    start_epoch = 0
    if checkpoint_dir:
        from gespmm_tpu.train.checkpoint import latest_checkpoint, restore

        ckpt = latest_checkpoint(checkpoint_dir)
        if ckpt is not None:
            state, start_epoch = restore(ckpt, state)

    history = {"loss": [], "val_acc": [], "epoch_time": []}
    for epoch in range(start_epoch, epochs):
        key, rng = jax.random.split(key)
        t0 = time.perf_counter()
        state, loss = step(state, adj, x, labels, masks["train"], rng)
        loss.block_until_ready()
        dt = time.perf_counter() - t0
        history["loss"].append(float(loss))
        if epoch >= 3:
            history["epoch_time"].append(dt)
        if log_every and (epoch % log_every == 0 or epoch == epochs - 1):
            logits = eval_fn(state.params)
            val = float(accuracy(logits, labels, masks["val"]))
            history["val_acc"].append(val)
            print(
                f"epoch {epoch:04d} | loss {float(loss):.4f} | "
                f"val acc {val:.4f} | {dt * 1e3:.1f} ms/epoch"
            )
        if checkpoint_dir and checkpoint_every and (epoch + 1) % checkpoint_every == 0:
            from gespmm_tpu.train.checkpoint import save

            save(checkpoint_dir, state, epoch + 1)

    logits = eval_fn(state.params)
    result = {
        "params": state.params,
        "history": history,
        "train_acc": float(accuracy(logits, labels, masks["train"])),
        "val_acc": float(accuracy(logits, labels, masks["val"])),
        "test_acc": float(accuracy(logits, labels, masks["test"])),
        "mean_epoch_time": (
            sum(history["epoch_time"]) / len(history["epoch_time"])
            if history["epoch_time"]
            else float("nan")
        ),
    }
    return result
