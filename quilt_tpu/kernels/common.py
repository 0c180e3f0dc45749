"""Shared device-kernel utilities: padding and on-device bit unpacking."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pad_axis(x: np.ndarray, axis: int, size: int, value=0) -> np.ndarray:
    """Pad numpy array along axis to `size` with a constant."""
    if x.shape[axis] == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, size - x.shape[axis])
    return np.pad(x, pad, constant_values=value)


def unpack_bits_device(words: jnp.ndarray) -> jnp.ndarray:
    """uint32 words [..., G] -> bits [..., G*32] uint8 (LSB-first).

    Device-side equivalent of utils.bits.unpack_bits_32; used to inflate
    packed panel subsets on-chip instead of shipping inflated matrices over
    PCIe (reference keeps panels packed for the same RAM reason:
    rhb_t, SURVEY.md section 2.1).
    """
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*words.shape[:-1], words.shape[-1] * 32).astype(jnp.uint8)
