"""Pallas TPU kernel for fused 1-form mass-matrix assembly (experimental).

Computes all four metric blocks of M1 for a tile of elements entirely in
VMEM: the Jacobian metric factors (k_hh, k_vv, k_hv) are formed on the VPU,
the block GEMMs run on the MXU, and the assembled ``[T, n1, n1]`` tile is
written to HBM exactly once.

Status: validated bit-consistent with the einsum path (interpret mode) and
functional on TPU v5e, but MEASURED SLOWER than XLA's own lowering of the
batched einsum (6 vs 59 M elements/s at p=4, f32): XLA's batched-GEMM
strategy for these small contractions is already excellent, and the
float32-faithful MXU mode inside Mosaic costs multiple passes.  The einsum
path (ops/mass.py) therefore stays the production default; this kernel is
kept as the scaffold for a future fully fused assembly->factorization
pipeline where avoiding HBM materialization pays off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfv2d_tpu.ops.mass import TensorBasis


def _mass_edge_kernel(j00_ref, j01_ref, j10_ref, j11_ref, det_ref,
                      bh_ref, bv_ref, w_ref, out_ref, *, n_h, n_v, nq, tile, acc_dtype):
    """One grid step: M1 blocks for ``tile`` elements."""
    j00 = j00_ref[...]
    j01 = j01_ref[...]
    j10 = j10_ref[...]
    j11 = j11_ref[...]
    inv_det = 1.0 / det_ref[...]
    w = w_ref[...]  # [1, nq]

    k_hh = (j10 * j10 + j11 * j11) * inv_det * w
    k_vv = (j00 * j00 + j01 * j01) * inv_det * w
    k_hv = (j00 * j10 + j01 * j11) * inv_det * w

    bh = bh_ref[...]  # [n_h, nq]
    bv = bv_ref[...]  # [n_v, nq]

    def gram(k, brow, bcol, nr, nc):
        # kw[t, r, s] = k[t, s] * brow[r, s]; out[t, r, c] = kw @ bcol^T
        kw = k[:, None, :] * brow[None, :, :]
        return jax.lax.dot_general(
            kw.reshape(tile * nr, nq),
            bcol,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(tile, nr, nc)

    m_hh = gram(k_hh, bh, bh, n_h, n_h)
    m_vv = gram(k_vv, bv, bv, n_v, n_v)
    m_hv = gram(k_hv, bh, bv, n_h, n_v)
    # Computing the lower-left block directly avoids an in-kernel transpose
    # (cheaper for Mosaic than relayouting the minor dims).
    m_vh = gram(k_hv, bv, bh, n_v, n_h)

    top = jnp.concatenate([m_hh, m_hv], axis=2)
    bot = jnp.concatenate([m_vh, m_vv], axis=2)
    out_ref[...] = jnp.concatenate([top, bot], axis=1)


def mass_edge_pallas(
    tb: TensorBasis,
    jac,
    tile: int = 256,
    interpret: bool | None = None,
):
    """M1 for a batch of elements via the fused Pallas kernel.

    ``jac`` holds flattened ``[E, nq]`` Jacobian terms (ops/mass.py
    ``batch_jacobian``).  The element count must be a multiple of ``tile``
    (pad at the call site).  Matches ``ops.mass.mass_edge`` exactly.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    e = jac.det.shape[0]
    if e % tile != 0:
        raise ValueError(f"Element count {e} must be a multiple of tile {tile}.")
    nq = tb.w.size
    n_h = tb.bh.shape[0]
    n_v = tb.bv.shape[0]
    n1 = n_h + n_v
    dtype = jac.det.dtype

    bh = jnp.asarray(tb.bh, dtype)
    bv = jnp.asarray(tb.bv, dtype)
    w = jnp.asarray(tb.w, dtype)[None, :]

    kernel = functools.partial(
        _mass_edge_kernel, n_h=n_h, n_v=n_v, nq=nq, tile=tile,
        acc_dtype=jnp.float32 if dtype == jnp.float32 else dtype,
    )

    grid = (e // tile,)
    # NOTE: index maps use 0 * i instead of literal 0 so every returned index
    # has the grid index dtype (x64 mode would otherwise mix i32/i64, which
    # Mosaic refuses to legalize).
    jac_spec = pl.BlockSpec((tile, nq), lambda i: (i, 0 * i), memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec((n_h, nq), lambda i: (0 * i, 0 * i), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_v, nq), lambda i: (0 * i, 0 * i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nq), lambda i: (0 * i, 0 * i), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[jac_spec] * 5 + const_specs,
        out_specs=pl.BlockSpec(
            (tile, n1, n1), lambda i: (i, 0 * i, 0 * i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((e, n1, n1), dtype),
        interpret=interpret,
    )(jac.j00, jac.j01, jac.j10, jac.j11, jac.det, bh, bv, w)
