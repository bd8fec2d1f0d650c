"""Gaze losses, including the MoE-expert variants.

Reference surface: refinenet/losses/{angular_error,gaze_mse_error,
experts_angular_error,experts_gaze_mse_error}.py — vestigial in the
reference's OpenEDS entry points (never constructed by train_segnet /
train_refinenet) but part of its public loss API; implemented here so the
inventory is complete.  TPU-native: pure jit-friendly functions with one
shared broadcasting ``to_vector`` instead of four near-identical torch
classes; all four reference callables map onto two functions + the experts
wrappers.

Conventions (kept bit-faithful to the loss files):
  * pitchyaw (..., 2) -> vector [cos(p)·sin(y), -sin(p), cos(p)·cos(y)]
    (angular_error.py:12-18).  Note the sign differs from
    refinenet/core/gaze.py's +sin(p) (utils/gaze.py) — a reflection, so
    pairwise errors agree between the two conventions, but mixed
    pitchyaw-vs-3D-vector comparisons need the losses' own convention.
  * 3-channel inputs are L2-normalized over the vector axis
    (angular_error.py:20 F.normalize).  The experts classes call
    F.normalize with the default dim=1 — the EXPERT axis — which is a
    latent reference bug in never-executed code; we normalize the vector
    axis (the only semantics that make the subsequent cosine meaningful).
  * cosine similarity clipped to ±(1 - 1e-8) (hardtanh_, angular_error.py
    :28-29) before acos; errors reported in degrees.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_TO_DEGREES = 180.0 / jnp.pi


def to_vector(a: jax.Array) -> jax.Array:
    """(..., 2) pitchyaw radians or (..., 3) vectors -> (..., 3) unit-ish
    gaze vectors (angular_error.py _to_vector)."""
    if a.shape[-1] == 2:
        sin, cos = jnp.sin(a), jnp.cos(a)
        return jnp.stack([cos[..., 0] * sin[..., 1],
                          -sin[..., 0],
                          cos[..., 0] * cos[..., 1]], axis=-1)
    if a.shape[-1] == 3:
        # F.normalize semantics: x / max(||x||, eps), eps=1e-12
        n = jnp.linalg.norm(a, axis=-1, keepdims=True)
        return a / jnp.maximum(n, 1e-12)
    raise ValueError(f"Do not know how to convert tensor of size {a.shape}")


def angular_error(a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-row angular error in DEGREES (AngularError.__call__):
    inputs (N, 2|3) -> (N,).  Broadcasts, so it also serves the experts
    form below."""
    va, vb = to_vector(a), to_vector(b)
    # cosine_similarity with eps=1e-8: dot / max(||a||·||b||, eps)
    denom = jnp.maximum(jnp.linalg.norm(va, axis=-1) *
                        jnp.linalg.norm(vb, axis=-1), 1e-8)
    sim = jnp.sum(va * vb, axis=-1) / denom
    sim = jnp.clip(sim, -1.0 + 1e-8, 1.0 - 1e-8)
    return jnp.arccos(sim) * _TO_DEGREES


def gaze_mse_error(a: jax.Array, b: jax.Array) -> jax.Array:
    """Scalar MSE between gaze vectors (GazeMSEError.__call__)."""
    return jnp.mean((to_vector(a) - to_vector(b)) ** 2)


def experts_angular_error(pred_experts: jax.Array,
                          true: jax.Array) -> jax.Array:
    """(B, E, 2|3) expert predictions vs (B, 2) ground truth -> (B, E)
    per-expert angular error in degrees (ExpertsAngularError.__call__;
    true pitchyaw is unsqueezed against the expert axis, :25-35)."""
    assert true.shape[-1] == 2, true.shape
    return angular_error(pred_experts, to_vector(true)[:, None, :])


def experts_gaze_mse_error(pred_experts: jax.Array,
                           true: jax.Array) -> jax.Array:
    """(B, E, 2|3) vs (B, 2) -> (B, E) per-expert MSE over the vector axis
    (ExpertsGazeMSEError.__call__ keeps the expert axis: mean(dim=-1))."""
    assert true.shape[-1] == 2, true.shape
    diff = to_vector(pred_experts) - to_vector(true)[:, None, :]
    return jnp.mean(diff ** 2, axis=-1)
