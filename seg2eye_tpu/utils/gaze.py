"""Gaze math utilities (reference: refinenet/core/gaze.py:6-71 and
refinenet/losses/angular_error.py — vestigial in the reference's OpenEDS
path but part of its public surface; provided in numpy and jax flavors)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pitchyaw_to_vector(pitchyaws: np.ndarray) -> np.ndarray:
    """(N,2) [pitch, yaw] radians -> (N,3) unit gaze vectors."""
    sin = np.sin(pitchyaws)
    cos = np.cos(pitchyaws)
    return np.stack([cos[:, 0] * sin[:, 1], sin[:, 0],
                     cos[:, 0] * cos[:, 1]], axis=1)


def vector_to_pitchyaw(vectors: np.ndarray) -> np.ndarray:
    """(N,3) gaze vectors -> (N,2) [pitch, yaw] radians."""
    n = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    return np.stack([np.arcsin(n[:, 1]),
                     np.arctan2(n[:, 0], n[:, 2])], axis=1)


def angular_error(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-row angular error in degrees between pitchyaw arrays."""
    va, vb = pitchyaw_to_vector(a), pitchyaw_to_vector(b)
    sim = np.sum(va * vb, axis=1) / (
        np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1))
    sim = np.clip(sim, -1.0 + 1e-7, 1.0 - 1e-7)
    return np.degrees(np.arccos(sim))


def angular_error_jax(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """jit-friendly angular error (degrees) between pitchyaw batches."""
    def to_vec(py):
        sin, cos = jnp.sin(py), jnp.cos(py)
        return jnp.stack([cos[:, 0] * sin[:, 1], sin[:, 0],
                          cos[:, 0] * cos[:, 1]], axis=1)
    va, vb = to_vec(a), to_vec(b)
    sim = jnp.sum(va * vb, axis=1) / (
        jnp.linalg.norm(va, axis=1) * jnp.linalg.norm(vb, axis=1))
    sim = jnp.clip(sim, -1.0 + 1e-7, 1.0 - 1e-7)
    return jnp.degrees(jnp.arccos(sim))
