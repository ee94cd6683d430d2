"""Model summary helpers (the analogue of Keras ``model.summary()``)."""

from __future__ import annotations

import jax
import numpy as np


def count_params(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return int(sum(np.prod(l.shape) for l in leaves if hasattr(l, "shape")))


def format_summary(name, rows, total_params):
    """rows: list of (layer_name, layer_type, output_shape, n_params)."""
    lines = [f'Model: "{name}"']
    header = f"{'Layer (name)':30s} {'Type':28s} {'Output shape':22s} {'Params':>10s}"
    lines.append("=" * len(header))
    lines.append(header)
    lines.append("-" * len(header))
    for lname, ltype, shape, nparams in rows:
        lines.append(f"{lname:30s} {ltype:28s} {str(shape):22s} {nparams:>10d}")
    lines.append("-" * len(header))
    lines.append(f"Total params: {total_params:,}")
    lines.append("=" * len(header))
    return "\n".join(lines)
