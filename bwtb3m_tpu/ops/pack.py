"""Device-side k-bit pack/unpack kernels.

Compact texts travel to the device as their packed bytes (4-32x less
host->device transfer than int32 symbols) and are unpacked on device.
Counterpart of the host codecs in io/compact.py (identical LSB-first
layout).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(1, 2))
def unpack_bits_device(data: jnp.ndarray, bits: int, n: int) -> jnp.ndarray:
    """uint8 packed bytes -> int32 symbols [n] (LSB-first layout)."""
    if n == 0:
        return jnp.zeros(0, jnp.int32)
    if 8 % bits == 0:
        # aligned fast path: each byte holds 8//bits whole symbols
        per = 8 // bits
        shifts = (jnp.arange(per, dtype=jnp.uint8) * bits)[None, :]
        syms = (data[:, None] >> shifts) & jnp.uint8((1 << bits) - 1)
        return syms.reshape(-1)[:n].astype(jnp.int32)
    # general path: explode to bits, regroup
    bit_shifts = jnp.arange(8, dtype=jnp.uint8)[None, :]
    bitarr = ((data[:, None] >> bit_shifts) & jnp.uint8(1)).reshape(-1)
    bitarr = bitarr[: n * bits].reshape(n, bits).astype(jnp.int32)
    weights = (jnp.int32(1) << jnp.arange(bits, dtype=jnp.int32))[None, :]
    return jnp.sum(bitarr * weights, axis=1)


@partial(jax.jit, static_argnums=(1,))
def pack_bits_device(symbols: jnp.ndarray, bits: int) -> jnp.ndarray:
    """int32 symbols -> uint8 packed bytes (LSB-first layout). The symbol
    count must make the bit stream byte-aligned (n*bits % 8 == 0); callers
    pad first."""
    n = symbols.shape[0]
    assert (n * bits) % 8 == 0, "pad to byte alignment before packing"
    if 8 % bits == 0:
        per = 8 // bits
        s = symbols.astype(jnp.uint8).reshape(-1, per)
        shifts = (jnp.arange(per, dtype=jnp.uint8) * bits)[None, :]
        return jnp.sum(
            (s & jnp.uint8((1 << bits) - 1)).astype(jnp.uint32) << shifts,
            axis=1).astype(jnp.uint8)
    shifts = jnp.arange(bits, dtype=jnp.int32)[None, :]
    bitarr = ((symbols[:, None] >> shifts) & 1).astype(jnp.uint8).reshape(-1, 8)
    w = (jnp.uint32(1) << jnp.arange(8, dtype=jnp.uint32))[None, :]
    return jnp.sum(bitarr.astype(jnp.uint32) * w, axis=1).astype(jnp.uint8)


def load_compact_to_device(path: str):
    """Read a CAR1 file and unpack it on device. Returns (symbols, bits)."""
    from ..io import compact as cio

    with open(path, "rb") as f:
        bits, n = cio.read_compact_header(f)
        nbytes = (n * bits + 7) // 8
        data = np.frombuffer(f.read(nbytes), dtype=np.uint8)
    return unpack_bits_device(jnp.asarray(data), bits, n), bits
