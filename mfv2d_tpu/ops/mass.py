"""Batched element mass and interior-product matrices.

This module replaces the reference's per-element quadrature triple loops
(src/fem_space/fem_space.c:235-1055) with *batched* contractions over all
elements of an order bucket at once.  Every matrix has the form

    M[e] = B_w @ diag(k[e]) @ B_u^T

where ``B_w``/``B_u`` are small per-order basis tables shared by the whole
batch and ``k[e]`` is a per-element metric factor at the quadrature points.
XLA turns the einsum into one batched GEMM that tiles onto the TPU MXU; this
is the "element assemblies/sec" hot path of BASELINE.md.

All arrays are laid out with the quadrature grid flattened eta-major:
``q = a * n_xi_pts + b`` for eta point ``a`` and xi point ``b``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from mfv2d_tpu.ops.basis import Basis2D
from mfv2d_tpu.ops.geometry import JacobianTerms, jacobian


@dataclass(frozen=True)
class TensorBasis:
    """Tensor-product basis tables flattened over the quadrature grid.

    Attributes are ``(n_basis, n_quad)`` NumPy arrays:
      - ``b0``: nodal x nodal (0-form basis)
      - ``bh``: edge-xi x node-eta (1-form eta-component block)
      - ``bv``: node-xi x edge-eta (1-form xi-component block)
      - ``b2``: edge x edge (2-form basis)
    plus the quadrature weights ``w`` of shape ``(n_quad,)``.
    """

    p1: int
    p2: int
    b0: np.ndarray
    bh: np.ndarray
    bv: np.ndarray
    b2: np.ndarray
    w: np.ndarray
    nodes_xi: np.ndarray
    nodes_eta: np.ndarray
    # 1D factors (basis, 1D-points) for sum-factorized assembly.
    node_xi: np.ndarray = None
    edge_xi: np.ndarray = None
    node_eta: np.ndarray = None
    edge_eta: np.ndarray = None

    def factors(self, name: str):
        """(eta-table, xi-table) pair whose kron equals the named table."""
        return {
            "b0": (self.node_eta, self.node_xi),
            "bh": (self.node_eta, self.edge_xi),
            "bv": (self.edge_eta, self.node_xi),
            "b2": (self.edge_eta, self.edge_xi),
        }[name]


def tensor_basis(basis: Basis2D) -> TensorBasis:
    """Build the flattened tensor-product tables from a 2D basis."""
    bx = basis.basis_xi
    be = basis.basis_eta
    return TensorBasis(
        p1=bx.order,
        p2=be.order,
        b0=np.kron(be.node, bx.node),
        bh=np.kron(be.node, bx.edge),
        bv=np.kron(be.edge, bx.node),
        b2=np.kron(be.edge, bx.edge),
        w=np.kron(be.rule.weights, bx.rule.weights),
        nodes_xi=bx.rule.nodes,
        nodes_eta=be.rule.nodes,
        node_xi=bx.node,
        edge_xi=bx.edge,
        node_eta=be.node,
        edge_eta=be.edge,
    )


def batch_jacobian(tb: TensorBasis, corners) -> JacobianTerms:
    """Jacobian terms at the quadrature grid, flattened to ``[..., n_quad]``.

    The computation follows the dtype of ``corners`` (float32 for the TPU
    assembly throughput path, float64 for the parity path).
    """
    c = jnp.asarray(corners)
    jac = jacobian(
        c,
        jnp.asarray(tb.nodes_xi, c.dtype)[None, :],
        jnp.asarray(tb.nodes_eta, c.dtype)[:, None],
    )
    flat = tuple(v.reshape(v.shape[:-2] + (-1,)) for v in jac)
    return JacobianTerms(*flat)


def weighted_gram(bw, bu, k):
    """``out[e] = bw @ diag(k[e]) @ bu^T`` as one batched GEMM.

    ``bw: (nw, nq)``, ``bu: (nu, nq)``, ``k: (E, nq)`` -> ``(E, nw, nu)``.
    """
    bw = jnp.asarray(bw, dtype=k.dtype)
    bu = jnp.asarray(bu, dtype=k.dtype)
    return jnp.einsum("ws,es,us->ewu", bw, k, bu, optimize=True)


def _sum_factorization_enabled(p1: int, p2: int) -> bool:
    from mfv2d_tpu.config import config as _cfg

    mode = _cfg.sum_factorization
    if mode == "always":
        return True
    if mode == "never":
        return False
    # auto: measured CPU crossover is p=5 (1.6x there, 2.9x at p=7, 2.1x at
    # p=8); below that the extra einsum dispatch costs more than the flops
    # saved, and on the TPU MXU the single big contraction always wins.
    import jax

    return max(p1, p2) >= 5 and jax.default_backend() != "tpu"


def factored_gram(wy, wx, uy, ux, k):
    """Sum-factorized gram: exploits the tensor-product quadrature grid.

    ``wy/uy: (n_eta, s2)``, ``wx/ux: (n_xi, s1)``, ``k: (E, s2*s1)``
    (eta-major) -> ``(E, n_w, n_u)``.  Same result as
    ``weighted_gram(kron(wy, wx), kron(uy, ux), k)`` with ~5.5x fewer flops
    at p=4 (more at higher order); reference fem_space.c does the full
    O(p^4 q^2) loop.
    """
    s2 = wy.shape[1]
    s1 = wx.shape[1]
    e = k.shape[0]
    k2 = k.reshape(e, s2, s1)
    wy = jnp.asarray(wy, k.dtype)
    wx = jnp.asarray(wx, k.dtype)
    uy = jnp.asarray(uy, k.dtype)
    ux = jnp.asarray(ux, k.dtype)
    t = jnp.einsum("ia,ja,eba->ebij", wx, ux, k2, optimize=True)
    m = jnp.einsum("Ib,Jb,ebij->eIiJj", wy, uy, t, optimize=True)
    return m.reshape(e, wy.shape[0] * wx.shape[0], uy.shape[0] * ux.shape[0])


def gram(tb_w: TensorBasis, name_w: str, tb_u: TensorBasis, name_u: str, k):
    """Dispatch between the single-GEMM and sum-factorized gram paths."""
    if _sum_factorization_enabled(tb_w.p1, tb_w.p2):
        wy, wx = tb_w.factors(name_w)
        uy, ux = tb_u.factors(name_u)
        if wy is not None and uy is not None:
            return factored_gram(wy, wx, uy, ux, k)
    return weighted_gram(getattr(tb_w, name_w), getattr(tb_u, name_u), k)


def mass_node(tb: TensorBasis, jac: JacobianTerms):
    """M0: 0-form mass matrices ``[E, n0, n0]`` (fem_space.c:235)."""
    k = jac.det * jnp.asarray(tb.w, jac.det.dtype)
    return gram(tb, "b0", tb, "b0", k)


def mass_surf(tb: TensorBasis, jac: JacobianTerms):
    """M2: 2-form mass matrices ``[E, n2, n2]`` (fem_space.c:377)."""
    k = jnp.asarray(tb.w, jac.det.dtype) / jac.det
    return gram(tb, "b2", tb, "b2", k)


def _edge_metric(jac: JacobianTerms, w):
    wdt = jnp.asarray(w, jac.det.dtype)
    k_hh = (jac.j10 * jac.j10 + jac.j11 * jac.j11) / jac.det * wdt
    k_vv = (jac.j00 * jac.j00 + jac.j01 * jac.j01) / jac.det * wdt
    k_hv = (jac.j00 * jac.j10 + jac.j01 * jac.j11) / jac.det * wdt
    return k_hh, k_vv, k_hv


def mass_edge(tb: TensorBasis, jac: JacobianTerms, field=None):
    """M1: 1-form mass matrices ``[E, n1, n1]`` with metric terms.

    Block layout is ``[eta-component (h), xi-component (v)]`` as in
    fem_space.c:271-375.  If ``field`` (a ``[E, nq]`` scalar) is given, the
    metric is weighted by it (the primal edge-edge interior product variant,
    fem_space.c:638-721).
    """
    k_hh, k_vv, k_hv = _edge_metric(jac, tb.w)
    if field is not None:
        k_hh = k_hh * field
        k_vv = k_vv * field
        k_hv = k_hv * field
    m_hh = gram(tb, "bh", tb, "bh", k_hh)
    m_vv = gram(tb, "bv", tb, "bv", k_vv)
    m_hv = gram(tb, "bh", tb, "bv", k_hv)
    top = jnp.concatenate([m_hh, m_hv], axis=2)
    bot = jnp.concatenate([jnp.swapaxes(m_hv, 1, 2), m_vv], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def mass_edge_edge_dual(tb: TensorBasis, jac: JacobianTerms, field):
    """Dual edge-edge interior product matrix (fem_space.c:722-745).

    Antisymmetric: ``[[0, +B], [-B^T, 0]]`` with
    ``B = bh @ diag(field w / det) @ bv^T``.
    """
    k = field * jnp.asarray(tb.w, jac.det.dtype) / jac.det
    b = gram(tb, "bh", tb, "bv", k)
    e = b.shape[0]
    n_h = tb.bh.shape[0]
    n_v = tb.bv.shape[0]
    zero_hh = jnp.zeros((e, n_h, n_h), b.dtype)
    zero_vv = jnp.zeros((e, n_v, n_v), b.dtype)
    top = jnp.concatenate([zero_hh, b], axis=2)
    bot = jnp.concatenate([-jnp.swapaxes(b, 1, 2), zero_vv], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def mass_node_edge(tb: TensorBasis, jac: JacobianTerms, field, transpose: bool):
    """Interior product of a 1-form with a vector field -> 0-form block.

    ``field`` is ``[E, nq, 2]`` physical (x, y) components at quadrature
    points.  Matches fem_space.c:546-635: the eta-component columns use
    ``F_x j11 - F_y j10`` and the xi-component columns ``F_x j01 - F_y j00``.
    """
    wdt = jnp.asarray(tb.w, jac.det.dtype)
    comp_h = (field[..., 0] * jac.j11 - field[..., 1] * jac.j10) * wdt
    comp_v = (field[..., 0] * jac.j01 - field[..., 1] * jac.j00) * wdt
    m_h = gram(tb, "b0", tb, "bh", comp_h)
    m_v = gram(tb, "b0", tb, "bv", comp_v)
    mat = jnp.concatenate([m_h, m_v], axis=2)
    if transpose:
        return jnp.swapaxes(mat, 1, 2)
    return mat


def mass_edge_surf(tb: TensorBasis, jac: JacobianTerms, field, transpose: bool):
    """Interior product of a 2-form with a vector field -> 1-form block.

    Matches fem_space.c:752-846: rows are [h, v] 1-form blocks, columns are
    2-form DoFs; components ``-(F_x j10 + F_y j11)/det`` (h) and
    ``-(F_x j00 + F_y j01)/det`` (v).
    """
    wdt = jnp.asarray(tb.w, jac.det.dtype)
    comp_h = -(field[..., 0] * jac.j10 + field[..., 1] * jac.j11) / jac.det * wdt
    comp_v = -(field[..., 0] * jac.j00 + field[..., 1] * jac.j01) / jac.det * wdt
    m_h = gram(tb, "bh", tb, "b2", comp_h)
    m_v = gram(tb, "bv", tb, "b2", comp_v)
    mat = jnp.concatenate([m_h, m_v], axis=1)
    if transpose:
        return jnp.swapaxes(mat, 1, 2)
    return mat


def mass_node_double(tb_in: TensorBasis, tb_out: TensorBasis, jac: JacobianTerms):
    """Cross-space 0-form mass ``[E, n0_out, n0_in]`` (fem_space.c:847)."""
    k = jac.det * jnp.asarray(tb_in.w, jac.det.dtype)
    return gram(tb_out, "b0", tb_in, "b0", k)


def mass_surf_double(tb_in: TensorBasis, tb_out: TensorBasis, jac: JacobianTerms):
    """Cross-space 2-form mass ``[E, n2_out, n2_in]`` (fem_space.c:1011)."""
    k = jnp.asarray(tb_in.w, jac.det.dtype) / jac.det
    return gram(tb_out, "b2", tb_in, "b2", k)


def mass_edge_double(tb_in: TensorBasis, tb_out: TensorBasis, jac: JacobianTerms):
    """Cross-space 1-form mass ``[E, n1_out, n1_in]`` (fem_space.c:888)."""
    k_hh, k_vv, k_hv = _edge_metric(jac, tb_in.w)
    m_hh = gram(tb_out, "bh", tb_in, "bh", k_hh)
    m_vv = gram(tb_out, "bv", tb_in, "bv", k_vv)
    m_hv = gram(tb_out, "bh", tb_in, "bv", k_hv)
    m_vh = gram(tb_out, "bv", tb_in, "bh", k_hv)
    top = jnp.concatenate([m_hh, m_hv], axis=2)
    bot = jnp.concatenate([m_vh, m_vv], axis=2)
    return jnp.concatenate([top, bot], axis=1)
