"""Minimal pure-functional module helpers (no flax dependency).

Params are plain pytrees (nested dicts of arrays); models are (init, apply)
pairs — the idiomatic-JAX counterpart of the reference's torch.nn modules
(`pytorch-custom/op.py:77-152`).  Keeping params as raw pytrees makes them
trivially shardable with `jax.sharding.NamedSharding` in parallel/.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def glorot(key, shape, dtype=jnp.float32) -> Array:
    """Glorot/Xavier uniform — the init used by the reference's GCNConv
    (`op.py:97-105` resets with glorot)."""
    fan_in, fan_out = shape[0], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def dense_init(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32):
    kw, _ = jax.random.split(key)
    p = {"w": glorot(kw, (in_dim, out_dim), dtype)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def dense_apply(p, x: Array) -> Array:
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def dropout(key, x: Array, rate: float, training: bool) -> Array:
    if not training or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
