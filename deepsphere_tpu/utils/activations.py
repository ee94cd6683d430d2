"""Activation resolution by name.

Parity with the reference's ``getattr(tf.keras.activations, name)`` lookup
(``/root/reference/src/deepsphere/gnn_layers.py:55-60``): layers accept
``None``, a callable, or a string name and raise ``ValueError`` for unknown
names.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ACTIVATIONS = {
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "hard_sigmoid": jax.nn.hard_sigmoid,
    "tanh": jnp.tanh,
    "softmax": jax.nn.softmax,
    "softplus": jax.nn.softplus,
    "softsign": jax.nn.soft_sign,
    "exponential": jnp.exp,
    "leaky_relu": jax.nn.leaky_relu,
}


def resolve_activation(activation):
    """None -> None, callable -> itself, known name -> function, else raise."""
    if activation is None or callable(activation):
        return activation
    if isinstance(activation, str) and activation in _ACTIVATIONS:
        return _ACTIVATIONS[activation]
    raise ValueError(f"Could not find activation <{activation}>...")
