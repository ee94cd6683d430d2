"""shard_map graph convolutions: DP x pixel-sharded polynomial conv.

The TPU-native scale-out of the hot loop (SURVEY.md §3.2): batch rides the
``data`` mesh axis, the pixel axis M rides the ``pixel`` mesh axis, and every
Laplacian application performs one boundary-halo all_gather over ICI
(:mod:`.halo`) instead of materializing the full activation anywhere.
Gradients flow through ``shard_map`` + collectives natively (all_gather
transposes to a scatter-reduce in the VJP).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .. import config
from .halo import ShardedEllpack, shard_ellpack

__all__ = ["ShardConfig", "sharded_poly_conv"]


@dataclass(frozen=True)
class ShardConfig:
    """Mesh + axis names for DP x pixel sharding (hashable; lives on Flax
    modules as a static attribute)."""

    mesh: Mesh
    data_axis: str = "data"
    pixel_axis: str = "pixel"

    @property
    def n_pixel_shards(self):
        return self.mesh.shape[self.pixel_axis]


def _basis_stack(kind, op: ShardedEllpack, x2d, n_terms, axis_name):
    """Polynomial basis recursions on the local (m, C) block; each L
    application does one halo exchange."""
    if kind == "cheby":
        stack = [x2d]
        if n_terms > 1:
            x1 = op.spmv(x2d, axis_name)
            stack.append(x1)
            x0 = x2d
            for _ in range(2, n_terms):
                x2 = 2.0 * op.spmv(x1, axis_name) - x0
                stack.append(x2)
                x0, x1 = x1, x2
        return stack
    if kind == "mono":
        stack = [x2d]
        for _ in range(1, n_terms):
            stack.append(op.spmv(stack[-1], axis_name))
        return stack
    if kind == "bern":
        from scipy.special import comb

        K = n_terms - 1
        powers = [x2d]
        for _ in range(K):
            powers.append(op.spmv(powers[-1], axis_name))
        stack = []
        for i in range(n_terms):
            theta = float(comb(K, i)) / (2.0**K)
            y = powers[i]
            for _ in range(K - i):
                y = 2.0 * y - op.spmv(y, axis_name)
            stack.append(theta * y)
        return stack
    raise ValueError(f"unknown basis kind {kind}")


def sharded_poly_conv(kind, graph, x, kernel, n_terms, scale, cfg: ShardConfig):
    """Pixel-sharded polynomial graph conv: x (B, M, Fin) -> (B, M, Fout).

    ``graph`` is a :class:`~deepsphere_tpu.graph.SphereGraph`; its sharded
    ELLPACK form is precomputed and cached per (n_shards, scale).
    """
    cache = getattr(graph, "_sharded_cache", None)
    if cache is None:
        cache = graph._sharded_cache = {}
    key = (cfg.n_pixel_shards, round(float(scale), 12))
    if key not in cache:
        cache[key] = shard_ellpack(graph, cfg.n_pixel_shards, scale)
    op = cache[key]

    da, pa = cfg.data_axis, cfg.pixel_axis
    Fout = kernel.shape[-1]

    @partial(
        shard_map,
        mesh=cfg.mesh,
        in_specs=(P(da, pa, None), P()),
        out_specs=P(da, pa, None),
        check_vma=False,
    )
    def conv(x_local, kernel_rep):
        B, m, Fin = x_local.shape
        x2d = jnp.transpose(x_local, (1, 0, 2)).reshape(m, B * Fin)
        stack = _basis_stack(kind, op, x2d, n_terms, pa)
        tx = jnp.stack(stack, axis=0).reshape(n_terms, m, B, Fin)
        tx = jnp.transpose(tx, (2, 1, 3, 0)).reshape(B * m, Fin * n_terms)
        y = jnp.dot(
            tx, kernel_rep.astype(tx.dtype),
            preferred_element_type=jnp.float32, precision=config.precision(),
        )
        return y.reshape(B, m, Fout).astype(x_local.dtype)

    return conv(x, kernel)
