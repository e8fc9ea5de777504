"""Losses: per-path cross-entropy summed over the 4 evidence paths.

Matches the reference objective (reference train.py:161-175: one
CrossEntropyLoss per path on labels[:, idx], summed) while staying fully
on-device and jit-friendly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mmd_tpu.data.labels import PATHS


def cross_entropy_per_sample(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-sample softmax cross-entropy; logits (B, C) fp32, labels (B,) int.
    Returns (B,)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)
    return nll[:, 0]


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy; logits (B, C) fp32, labels (B,) int."""
    return jnp.mean(cross_entropy_per_sample(logits, labels))


def multipath_loss(
    outputs: Tuple[Tuple[Optional[jax.Array], Optional[jax.Array]],
                   Tuple[Optional[jax.Array], Optional[jax.Array]]],
    labels: jax.Array,
) -> tuple[jax.Array, dict]:
    """Sum CE over the available paths.

    outputs: ((y_t_t, y_t_i), (y_i_t, y_i_i)); labels (B, 4) with path order
    (text_text, text_image, image_text, image_image).
    Returns (total_loss, {path: loss}).
    """
    (y_t_t, y_t_i), (y_i_t, y_i_i) = outputs
    per_path = {}
    total = jnp.zeros((), jnp.float32)
    for idx, (name, y) in enumerate(
        zip(PATHS, (y_t_t, y_t_i, y_i_t, y_i_i))
    ):
        if y is None:
            continue
        l = cross_entropy(y, labels[:, idx])
        per_path[name] = l
        total = total + l
    return total, per_path


def single_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """factify / text_only modes: one CE over category or 3-class labels."""
    return cross_entropy(logits, labels)
