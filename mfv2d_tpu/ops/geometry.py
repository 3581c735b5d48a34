"""Bilinear element geometry: mapping and Jacobians, batched over elements.

Conventions match the reference (python/mfv2d/mimetic2d.py:876-1000 and
src/fem_space/fem_space.c:39-53):

    J = [[j00, j01], [j10, j11]] = [[dx/dxi, dy/dxi], [dx/deta, dy/deta]]
    det = j00 * j11 - j10 * j01

Corner order is counter-clockwise starting bottom-left: c0=(−1,−1), c1=(+1,−1),
c2=(+1,+1), c3=(−1,+1) in the reference square.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def bilinear_interpolate(corner_vals, xi, eta):
    """Bilinear interpolation of per-corner values at reference points.

    ``corner_vals`` has the 4 corner values along its *last* axis (so batched
    ``[E, 4]`` works); ``xi``/``eta`` broadcast against each other.
    """
    c = jnp.asarray(corner_vals)
    t0 = jnp.asarray(xi)
    t1 = jnp.asarray(eta)
    b11 = (1 - t0) / 2
    b12 = (1 + t0) / 2
    b21 = (1 - t1) / 2
    b22 = (1 + t1) / 2
    c = c[..., None, None]  # broadcast corner axis against grid axes
    return (c[..., 0, :, :] * b11 + c[..., 1, :, :] * b12) * b21 + (
        c[..., 3, :, :] * b11 + c[..., 2, :, :] * b12
    ) * b22


class JacobianTerms(NamedTuple):
    """Jacobian entries and determinant at a grid of reference points."""

    j00: jnp.ndarray  # dx/dxi
    j01: jnp.ndarray  # dy/dxi
    j10: jnp.ndarray  # dx/deta
    j11: jnp.ndarray  # dy/deta
    det: jnp.ndarray


def jacobian(corners, nodes_xi, nodes_eta) -> JacobianTerms:
    """Jacobian terms at the tensor grid of reference points.

    Parameters
    ----------
    corners : (..., 4, 2) array
        Element corners; a leading batch axis is supported.
    nodes_xi, nodes_eta : arrays
        Reference coordinates, broadcast against each other (the usual call is
        ``nodes_xi[None, :]`` and ``nodes_eta[:, None]`` giving an
        (n_eta, n_xi) grid).

    Returns
    -------
    JacobianTerms
        Each entry has shape ``corners.shape[:-2] + broadcast(xi, eta).shape``.
    """
    c = jnp.asarray(corners)
    t0 = jnp.asarray(nodes_xi)
    t1 = jnp.asarray(nodes_eta)
    x = c[..., 0]
    y = c[..., 1]

    def _mk(v):
        return v[..., None, None]

    x0, x1, x2, x3 = (_mk(x[..., i]) for i in range(4))
    y0, y1, y2, y3 = (_mk(y[..., i]) for i in range(4))

    dx_dxi = ((x1 - x0) * (1 - t1) + (x2 - x3) * (1 + t1)) / 4
    dx_deta = ((x3 - x0) * (1 - t0) + (x2 - x1) * (1 + t0)) / 4
    dy_dxi = ((y1 - y0) * (1 - t1) + (y2 - y3) * (1 + t1)) / 4
    dy_deta = ((y3 - y0) * (1 - t0) + (y2 - y1) * (1 + t0)) / 4
    det = dx_dxi * dy_deta - dx_deta * dy_dxi
    # Terms that depend on only one reference coordinate would keep a
    # degenerate axis; broadcast everything to the full grid shape.
    shape = det.shape
    dx_dxi, dy_dxi, dx_deta, dy_deta = (
        jnp.broadcast_to(v, shape) for v in (dx_dxi, dy_dxi, dx_deta, dy_deta)
    )
    return JacobianTerms(dx_dxi, dy_dxi, dx_deta, dy_deta, det)


def physical_coordinates(corners, nodes_xi, nodes_eta):
    """Map reference grid points to physical (x, y); batched like jacobian."""
    c = jnp.asarray(corners)
    x = bilinear_interpolate(c[..., 0], nodes_xi, nodes_eta)
    y = bilinear_interpolate(c[..., 1], nodes_xi, nodes_eta)
    return x, y
