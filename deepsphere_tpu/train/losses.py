"""Loss and metric functions (Keras-name compatible).

The reference trains with ``tf.keras`` losses/metrics
(``quick_start.ipynb`` cell 15: ``SparseCategoricalCrossentropy`` +
``SparseCategoricalAccuracy``; ``generative_models.ipynb``: MAE/MSE).  These
are the jnp equivalents, resolvable by the same string names.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["resolve_loss", "resolve_metric"]

_EPS = 1e-7


def sparse_categorical_crossentropy(y_true, y_pred, from_logits=False):
    if from_logits:
        logp = jax.nn.log_softmax(y_pred, axis=-1)
    else:
        logp = jnp.log(jnp.clip(y_pred, _EPS, 1.0))
    y_true = y_true.astype(jnp.int32).reshape(y_pred.shape[:-1])
    picked = jnp.take_along_axis(logp, y_true[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


def categorical_crossentropy(y_true, y_pred, from_logits=False):
    if from_logits:
        logp = jax.nn.log_softmax(y_pred, axis=-1)
    else:
        logp = jnp.log(jnp.clip(y_pred, _EPS, 1.0))
    return -jnp.mean(jnp.sum(y_true * logp, axis=-1))


def mean_squared_error(y_true, y_pred):
    return jnp.mean((y_pred - y_true) ** 2)


def mean_absolute_error(y_true, y_pred):
    return jnp.mean(jnp.abs(y_pred - y_true))


def binary_crossentropy(y_true, y_pred, from_logits=False):
    if from_logits:
        return jnp.mean(
            jnp.maximum(y_pred, 0) - y_pred * y_true + jnp.log1p(jnp.exp(-jnp.abs(y_pred)))
        )
    p = jnp.clip(y_pred, _EPS, 1 - _EPS)
    return -jnp.mean(y_true * jnp.log(p) + (1 - y_true) * jnp.log(1 - p))


def _from_logits(fn):
    def wrapped(y_true, y_pred):
        return fn(y_true, y_pred, from_logits=True)

    wrapped.__name__ = fn.__name__ + "_from_logits"
    return wrapped


_LOSSES = {
    "sparse_categorical_crossentropy": sparse_categorical_crossentropy,
    "sparse_categorical_crossentropy_from_logits": _from_logits(
        sparse_categorical_crossentropy
    ),
    "categorical_crossentropy": categorical_crossentropy,
    "categorical_crossentropy_from_logits": _from_logits(categorical_crossentropy),
    "binary_crossentropy_from_logits": _from_logits(binary_crossentropy),
    "mse": mean_squared_error,
    "mean_squared_error": mean_squared_error,
    "mae": mean_absolute_error,
    "mean_absolute_error": mean_absolute_error,
    "binary_crossentropy": binary_crossentropy,
}


def sparse_categorical_accuracy(y_true, y_pred):
    pred = jnp.argmax(y_pred, axis=-1)
    return jnp.mean(pred == y_true.astype(pred.dtype).reshape(pred.shape))


_METRICS = {
    "accuracy": sparse_categorical_accuracy,
    "sparse_categorical_accuracy": sparse_categorical_accuracy,
    "mse": mean_squared_error,
    "mae": mean_absolute_error,
}


def resolve_loss(loss):
    if callable(loss):
        return loss
    if isinstance(loss, str) and loss in _LOSSES:
        return _LOSSES[loss]
    raise ValueError(f"Unknown loss: {loss}")


def resolve_metric(metric):
    if callable(metric):
        return metric
    if isinstance(metric, str) and metric in _METRICS:
        return _METRICS[metric]
    raise ValueError(f"Unknown metric: {metric}")
