"""Pallas kernel for batched LF walks with a VMEM-resident occ table.

STATUS: experimental / interpret-mode only on this toolchain. The design
keeps the entire rank structure on-chip (for a 4-symbol BWT the packed
bit-planes cost n/4 bits + n/32 checkpoint words, so ~30M symbols fit
VMEM) and does two vectorized row-gathers per step. However, the installed
Mosaic lowering only supports `take_along_axis`-shaped gathers (input ==
indices == output shape, jax/_src/pallas/mosaic/lowering.py
_gather_lowering_rule), which cannot express a [B]-row gather from an
[nb, K] table, so the kernel compiles only in interpreter mode today.

Measured context (v5e): the XLA gather path tops out at ~2.7e7 LF-steps/s
at 131k lanes and is per-element-bound — batch width, not block size, is
the lever (see ops/rank.py consumers, which now default to dense preisa
seeding). When Mosaic grows row-gather or DMA-gather support this kernel
is the intended speed-of-light path.

Structure (from ops/rank_packed.build_occ_packed):
    planes [nb, P, 4] u32 -> viewed [nb, P*4]
    occ    [nb+1, sigma] i32
    C      [sigma+1] i32   (selected by compare-mask, no gather)
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rank_packed import PackedOccTable

# VMEM budget for the resident structure (bytes); leave room for lanes
VMEM_BUDGET = 10 * 1024 * 1024


def fits_vmem(occt: PackedOccTable) -> bool:
    planes_b = int(np.prod(occt.planes.shape)) * 4
    occ_b = int(np.prod(occt.occ.shape)) * 4
    return planes_b + occ_b <= VMEM_BUDGET


def _select_col(rows: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """rows [B, K] select per-lane column idx [B] via compare-mask sum
    (K is small and static; avoids unsupported gather shapes)."""
    K = rows.shape[1]
    col = lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    mask = col == idx[:, None]
    return jnp.sum(jnp.where(mask, rows, jnp.zeros_like(rows)), axis=1)


def _lf_kernel(planes_ref, occ_ref, c_ref, r_ref, out_ref, *, steps: int,
               nplanes: int, sigma: int):
    planes2d = planes_ref[...].reshape(planes_ref.shape[0],
                                       nplanes * 4)  # [nb, P*4]
    occ2d = occ_ref[...]                             # [nb+1, sigma]
    Cvec = c_ref[...]                                # [sigma+1]

    def body(_i, r):
        b = r >> 7
        off = r - (b << 7)
        w = off >> 5
        bit = (off - (w << 5)).astype(jnp.uint32)
        rows = jnp.take(planes2d, b, axis=0)         # [B, P*4] u32 (2D gather)
        # symbol: bit `bit` of word (j*4 + w) for each plane j
        sym = jnp.zeros_like(r)
        for j in range(nplanes):
            wordj = _select_col(rows, j * 4 + w)
            sym = sym | (((wordj >> bit) & jnp.uint32(1)).astype(jnp.int32) << j)
        occ_rows = jnp.take(occ2d, b, axis=0)        # [B, sigma] (2D gather)
        cnt = _select_col(occ_rows, sym)
        full = jnp.uint32(0xFFFFFFFF)
        for wi in range(4):
            match = jnp.full(r.shape, full, jnp.uint32)
            for j in range(nplanes):
                wordj = rows[:, j * 4 + wi]  # static column
                cbit = ((sym >> j) & 1).astype(jnp.uint32)
                flip = jnp.where(cbit == 1, jnp.uint32(0), full)
                match = match & (wordj ^ flip)
            rel = jnp.clip(off - wi * 32, 0, 32).astype(jnp.uint32)
            pmask = jnp.where(rel >= 32, full,
                              (jnp.uint32(1) << rel) - jnp.uint32(1))
            cnt = cnt + lax.population_count(match & pmask).astype(jnp.int32)
        # C[sym] via compare-mask over the sigma+1 vector
        csel = _select_col(jnp.broadcast_to(Cvec[None, :sigma],
                                            (r.shape[0], sigma)), sym)
        return csel + cnt

    out_ref[...] = lax.fori_loop(0, steps, body, r_ref[...])


@functools.partial(jax.jit, static_argnums=(2, 3))
def lf_walk_pallas(occt: PackedOccTable, r0: jnp.ndarray, steps: int,
                   interpret: bool = False) -> jnp.ndarray:
    """Walk `steps` LF steps for each lane; returns final ranks."""
    kernel = functools.partial(
        _lf_kernel, steps=steps, nplanes=occt.nplanes, sigma=occt.sigma)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(r0.shape, jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # planes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # occ
            pl.BlockSpec(memory_space=pltpu.VMEM),  # C
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(occt.planes, occt.occ, occt.C, r0.astype(jnp.int32))
