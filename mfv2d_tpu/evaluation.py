"""Batched evaluation of compiled k-form systems.

The reference executes a bytecode block per element inside a C interpreter
(src/evaluation/element_eval.c:399-479, element_system.c:13-212).  Here the
same op semantics run at *JAX trace time* over an ``[E, ...]`` batch of
same-order elements, so XLA sees one fused computation (batched GEMMs on the
MXU) for the entire mesh bucket instead of ``n_elem x n_forms^2`` interpreter
calls.

Lazy-composition rules mirror the C ``matrix_t`` union: identities and
incidence matrices stay symbolic until a dense matrix forces materialization
(element_eval.c:117-177).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from mfv2d_tpu.compiler import (
    Identity,
    Incidence,
    InterProd,
    MassMat,
    Push,
    Scale,
    Sum,
    SystemBlocks,
)
from mfv2d_tpu.kform import UnknownFormOrder
from mfv2d_tpu.ops.basis import Basis2D
from mfv2d_tpu.ops.geometry import physical_coordinates
from mfv2d_tpu.ops.incidence import (
    INCIDENCE_E10,
    INCIDENCE_E10_T,
    INCIDENCE_E21,
    INCIDENCE_E21_T,
    incidence_matrix,
)
from mfv2d_tpu.ops.mass import (
    TensorBasis,
    batch_jacobian,
    mass_edge,
    mass_edge_double,
    mass_edge_surf,
    mass_node,
    mass_node_double,
    mass_node_edge,
    mass_surf,
    mass_surf_double,
    tensor_basis,
)
from mfv2d_tpu.system import ElementFormSpecification


def _mass_solve(a, b, refinements: int = 3):
    """Traceable f64 solve ``A X = B`` for (well-conditioned) mass matrices.

    TPU XLA implements LuDecomposition only for f32/c64, so an f64
    ``jnp.linalg.solve`` fails to lower there; factor in f32 and refine
    the f64 residual instead (mass matrices are mildly conditioned, so a
    few rounds reach ~1e-13).  Elsewhere (or in f32) this is a plain
    solve.  ``jax.default_backend()`` is static at trace time.
    """
    import jax

    if a.dtype != jnp.float64 or jax.default_backend() != "tpu":
        return jnp.linalg.solve(a, b)
    lu, piv = jax.scipy.linalg.lu_factor(a.astype(jnp.float32))

    def solve32(r):
        return jax.scipy.linalg.lu_solve(
            (lu, piv), r.astype(jnp.float32)
        ).astype(jnp.float64)

    x = solve32(b)
    for _ in range(refinements):
        x = x + solve32(b - a @ x)
    return x


def _mass_inverse(a):
    """Traceable f64 inverse of batched mass matrices (see _mass_solve)."""
    eye = jnp.broadcast_to(
        jnp.eye(a.shape[-1], dtype=a.dtype), a.shape
    )
    return _mass_solve(a, eye)


class ElementBatch:
    """A batch of elements sharing basis orders and integration rules.

    Holds the per-batch geometry (Jacobian terms at quadrature points) and
    memoizes mass matrices/inverses.  When used inside ``jax.jit`` the memo
    is per-trace; when used eagerly the arrays are concrete device buffers
    reused across Newton iterations (the reference's per-element lazy mass
    cache, element_fem_space.c:445-469, amortized over the whole batch).
    """

    def __init__(self, basis: Basis2D, corners) -> None:
        self.basis = basis
        self.tb: TensorBasis = tensor_basis(basis)
        self.corners = jnp.asarray(corners)
        if self.corners.ndim == 2:
            self.corners = self.corners[None]
        self.n_elements = self.corners.shape[0]
        # Jacobians are computed lazily: batches are often constructed on
        # the host only to carry (basis, corners) into a jitted evaluator,
        # and eager geometry dispatch was a measured 1.3 s/round cost in
        # warm hp-refinement loops.
        self._jac = None
        self._mass: dict[tuple[int, bool], jnp.ndarray] = {}

    @property
    def jac(self):
        if self._jac is None:
            self._jac = batch_jacobian(self.tb, self.corners)
        return self._jac

    @classmethod
    def from_parts(cls, basis: Basis2D, tb, jac, n_elements: int) -> "ElementBatch":
        """Build from precomputed Jacobian terms (no corners).

        Used to re-batch per-element slices under ``jax.vmap`` (e.g. for
        exact Newton Jacobians of the element residual).
        """
        out = cls.__new__(cls)
        out.basis = basis
        out.tb = tb
        out.corners = None
        out.n_elements = n_elements
        out._jac = jac
        out._mass = {}
        return out

    @property
    def orders(self) -> tuple[int, int]:
        return (self.tb.p1, self.tb.p2)

    @property
    def n_quad(self) -> int:
        return self.tb.w.size

    def quad_points(self):
        """Physical (x, y) of quadrature points, each ``[E, nq]``."""
        x, y = physical_coordinates(
            self.corners, self.tb.nodes_xi[None, :], self.tb.nodes_eta[:, None]
        )
        return x.reshape(self.n_elements, -1), y.reshape(self.n_elements, -1)

    def mass(self, order: UnknownFormOrder, inv: bool) -> jnp.ndarray:
        """Memoized batched mass matrix (or inverse) of the given form order."""
        key = (int(order), bool(inv))
        if key not in self._mass:
            if not inv:
                if order == UnknownFormOrder.FORM_ORDER_0:
                    m = mass_node(self.tb, self.jac)
                elif order == UnknownFormOrder.FORM_ORDER_1:
                    m = mass_edge(self.tb, self.jac)
                elif order == UnknownFormOrder.FORM_ORDER_2:
                    m = mass_surf(self.tb, self.jac)
                else:
                    raise ValueError(f"Invalid mass order {order}.")
            else:
                m = _mass_inverse(self.mass(order, False))
            self._mass[key] = m
        return self._mass[key]

    def reconstruct_one_form(self, dofs):
        """Physical (x, y) components of a 1-form at quadrature points.

        ``dofs`` is ``[E, n1]`` in the [h, v] layout; returns ``[E, nq, 2]``
        (the on-device equivalent of integrating_fields.c:13-353 /
        mimetic2d.reconstruct for 1-forms).
        """
        tb = self.tb
        n_h = tb.bh.shape[0]
        c_h = dofs[:, :n_h]
        c_v = dofs[:, n_h:]
        out_eta = jnp.einsum("hq,eh->eq", jnp.asarray(tb.bh, dofs.dtype), c_h)
        out_xi = jnp.einsum("vq,ev->eq", jnp.asarray(tb.bv, dofs.dtype), c_v)
        jac = self.jac
        fx = (out_xi * jac.j00 + out_eta * jac.j10) / jac.det
        fy = (out_xi * jac.j01 + out_eta * jac.j11) / jac.det
        return jnp.stack([fx, fy], axis=-1)


def _incidence_for(batch: ElementBatch, begin: UnknownFormOrder, transpose) -> np.ndarray:
    kind = {
        (int(UnknownFormOrder.FORM_ORDER_0), False): INCIDENCE_E10,
        (int(UnknownFormOrder.FORM_ORDER_1), False): INCIDENCE_E21,
        (int(UnknownFormOrder.FORM_ORDER_0), True): INCIDENCE_E10_T,
        (int(UnknownFormOrder.FORM_ORDER_1), True): INCIDENCE_E21_T,
    }[(int(begin), bool(transpose))]
    return incidence_matrix(kind, batch.tb.p1, batch.tb.p2)


def _interprod_matrix(
    batch: ElementBatch, op: InterProd, fields: dict
) -> tuple[jnp.ndarray, float]:
    """Field-weighted interior-product matrix and its sign coefficient.

    Matches element_eval.c:311-397: starting order 1 -> node_edge with +1,
    starting order 2 -> edge_surf with -1.
    """
    field = fields[op.field]
    if op.starting_order == UnknownFormOrder.FORM_ORDER_1:
        return mass_node_edge(batch.tb, batch.jac, field, op.transpose), +1.0
    if op.starting_order == UnknownFormOrder.FORM_ORDER_2:
        return mass_edge_surf(batch.tb, batch.jac, field, op.transpose), -1.0
    raise ValueError(
        f"InterProd starting order must be 1- or 2-form, got {op.starting_order}."
    )


class _State:
    """Lazy 'current matrix' of the stack machine.

    kind: 'invalid' | 'identity' | 'incidence' | 'full'
    For vectors the full payload is ``[E, n]``; for matrices ``[E, r, c]``.
    """

    __slots__ = ("kind", "coef", "payload", "inc")

    def __init__(self, kind="invalid", coef=0.0, payload=None, inc=None):
        self.kind = kind
        self.coef = coef
        self.payload = payload
        self.inc = inc  # (begin_order, transpose) for incidence

    def copy(self) -> "_State":
        return _State(self.kind, self.coef, self.payload, self.inc)


def _left_apply_const(mat_const: np.ndarray, state: _State, batch: ElementBatch) -> _State:
    """Left-multiply the state by a constant (non-batched) matrix."""
    m = jnp.asarray(mat_const, batch.jac.det.dtype)
    if state.kind in ("invalid", "identity"):
        coef = state.coef if state.kind == "identity" else 1.0
        e = batch.n_elements
        arr = jnp.broadcast_to(m, (e,) + m.shape)
        return _State("full", coef, arr)
    if state.kind == "incidence":
        e_mat = _incidence_for(batch, *state.inc)
        return _State("full", state.coef, jnp.broadcast_to(m @ e_mat, (batch.n_elements,) + (m.shape[0], e_mat.shape[1])))
    if state.kind == "full":
        if state.payload.ndim == 2:  # vector [E, n]
            return _State("full", state.coef, jnp.einsum("ij,ej->ei", m, state.payload))
        return _State("full", state.coef, jnp.einsum("ij,ejk->eik", m, state.payload))
    raise RuntimeError(f"Bad state {state.kind}")


def _left_apply_batched(mat: jnp.ndarray, state: _State, batch: ElementBatch) -> _State:
    """Left-multiply the state by a batched ``[E, r, c]`` matrix."""
    if state.kind in ("invalid", "identity"):
        coef = state.coef if state.kind == "identity" else 1.0
        return _State("full", coef, mat)
    if state.kind == "incidence":
        e_mat = jnp.asarray(_incidence_for(batch, *state.inc), mat.dtype)
        return _State("full", state.coef, jnp.einsum("eij,jk->eik", mat, e_mat))
    if state.kind == "full":
        if state.payload.ndim == 2:
            return _State("full", state.coef, jnp.einsum("eij,ej->ei", mat, state.payload))
        return _State("full", state.coef, jnp.einsum("eij,ejk->eik", mat, state.payload))
    raise RuntimeError(f"Bad state {state.kind}")


def _materialize(
    state: _State,
    batch: ElementBatch,
    n_cols: int,
    vector: bool,
    initial,
) -> jnp.ndarray:
    """Turn the lazy state into a dense ``[E, r, c]`` matrix or ``[E, n]`` vector."""
    e = batch.n_elements
    if state.kind == "invalid":
        raise RuntimeError("Block evaluated to an invalid state.")
    if state.kind == "identity":
        if vector:
            return state.coef * initial
        eye = jnp.eye(n_cols, dtype=batch.jac.det.dtype)
        return state.coef * jnp.broadcast_to(eye, (e, n_cols, n_cols))
    if state.kind == "incidence":
        e_mat = jnp.asarray(_incidence_for(batch, *state.inc), batch.jac.det.dtype)
        if vector:
            return state.coef * jnp.einsum("ij,ej->ei", e_mat, initial)
        return state.coef * jnp.broadcast_to(e_mat, (e,) + e_mat.shape)
    arr = state.payload
    if state.coef != 1.0:
        arr = state.coef * arr
    return arr


def evaluate_block(
    ops: Sequence,
    batch: ElementBatch,
    fields: dict,
    n_cols: int,
    initial=None,
) -> jnp.ndarray:
    """Evaluate one bytecode block over the batch.

    With ``initial`` (an ``[E, n_cols]`` vector) the result is the block
    applied to that vector (``compute_element_vector`` semantics, each Push
    re-seeds with the initial operand); otherwise the dense block matrix.
    """
    vector = initial is not None

    def fresh() -> _State:
        if vector:
            return _State("full", 1.0, initial)
        return _State("invalid", 0.0)

    current = fresh()
    stack: list[_State] = []

    for op in ops:
        t = type(op)
        if t is Identity:
            if current.kind == "invalid":
                current = _State("identity", 1.0)
        elif t is Scale:
            if current.kind == "invalid":
                current = _State("identity", op.k)
            else:
                current = current.copy()
                current.coef = current.coef * op.k
        elif t is Push:
            stack.append(current)
            current = fresh()
        elif t is Incidence:
            if current.kind in ("invalid", "identity"):
                coef = current.coef if current.kind == "identity" else 1.0
                current = _State("incidence", coef, inc=(op.begin, bool(op.transpose)))
            else:
                e_mat = _incidence_for(batch, op.begin, bool(op.transpose))
                current = _left_apply_const(e_mat, current, batch)
        elif t is MassMat:
            m = batch.mass(op.order, op.inv)
            current = _left_apply_batched(m, current, batch)
        elif t is InterProd:
            m, sign = _interprod_matrix(batch, op, fields)
            current = _left_apply_batched(m, current, batch)
            current = current.copy()
            current.coef = current.coef * sign
        elif t is Sum:
            total = _materialize(current, batch, n_cols, vector, initial)
            for _ in range(op.count):
                other = stack.pop()
                total = total + _materialize(other, batch, n_cols, vector, initial)
            current = _State("full", 1.0, total)
        else:
            raise TypeError(f"Unknown op {op}.")

    return _materialize(current, batch, n_cols, vector, initial)


def compute_fields(
    batch: ElementBatch,
    field_keys: Sequence,
    form_spec: ElementFormSpecification | None = None,
    dofs=None,
    static_fields: dict | None = None,
) -> dict:
    """Resolve interior-product fields to ``[E, nq, 2]`` arrays.

    Callable fields must be supplied pre-evaluated through ``static_fields``
    (host-evaluated once with NumPy; see :func:`evaluate_static_fields`).
    String fields name unknown 1-forms and are reconstructed from ``dofs``
    inside the trace (the nonlinear advection coupling).
    """
    out: dict = {}
    for key in field_keys:
        if isinstance(key, str):
            assert form_spec is not None and dofs is not None
            idx = form_spec.index((key, UnknownFormOrder.FORM_ORDER_1))
            p1, p2 = batch.orders
            off = form_spec.form_offset(idx, p1, p2)
            size = form_spec.form_size(idx, p1, p2)
            out[key] = batch.reconstruct_one_form(dofs[:, off : off + size])
        else:
            if static_fields is None or key not in static_fields:
                raise KeyError(
                    f"Static field {getattr(key, '__name__', key)} was not "
                    "pre-evaluated; call evaluate_static_fields first."
                )
            out[key] = static_fields[key]
    return out


def evaluate_static_fields(batch: ElementBatch, field_keys: Sequence) -> dict:
    """Host-evaluate callable fields at the quadrature points (NumPy).

    User callables are arbitrary NumPy code, so they run on the host over the
    whole batch at once and the results ship to the device as inputs.
    """
    callables = [k for k in field_keys if not isinstance(k, str)]
    if not callables:
        return {}
    corners = np.asarray(batch.corners)
    tb = batch.tb
    # Bilinear map evaluated in NumPy: this runs on the host path (the field
    # values feed a host callable anyway) and eager JAX dispatch here costs a
    # per-shape XLA compile every refinement round.
    xi = np.broadcast_to(tb.nodes_xi[None, :], (tb.nodes_eta.size, tb.nodes_xi.size))
    eta = np.broadcast_to(tb.nodes_eta[:, None], xi.shape)
    shapes = np.stack(
        [
            (1 - xi) * (1 - eta),
            (1 + xi) * (1 - eta),
            (1 + xi) * (1 + eta),
            (1 - xi) * (1 + eta),
        ]
    ).reshape(4, -1) / 4
    x = corners[:, :, 0] @ shapes
    y = corners[:, :, 1] @ shapes
    out = {}
    for fn in callables:
        vals = np.asarray(fn(x, y), np.float64)
        if vals.shape != x.shape + (2,):
            raise ValueError(
                f"Vector field {getattr(fn, '__name__', fn)} must return shape"
                f" {(x.shape + (2,))}, got {vals.shape}."
            )
        out[fn] = jnp.asarray(vals)
    return out


def compute_element_matrices(
    form_spec: ElementFormSpecification,
    blocks: SystemBlocks,
    batch: ElementBatch,
    dofs=None,
    static_fields: dict | None = None,
    field_keys: Sequence | None = None,
) -> jnp.ndarray:
    """Full element system matrices ``[E, N, N]`` for the batch.

    The batched analogue of the reference ``compute_element_matrix``
    (element_system.c:13-212).
    """
    p1, p2 = batch.orders
    sizes = form_spec.form_sizes(p1, p2)
    from mfv2d_tpu.compiler import collect_fields

    needed = collect_fields(blocks)
    fields = compute_fields(batch, needed, form_spec, dofs, static_fields)

    from mfv2d_tpu.config import config as _cfg
    from mfv2d_tpu.ops.fused_assembly import evaluate_block_fused, try_plan

    use_fused = _cfg.fused_assembly
    k_cache: dict = {}
    rows = []
    for i, row in enumerate(blocks):
        cols = []
        for j, block in enumerate(row):
            if block is None:
                cols.append(
                    jnp.zeros(
                        (batch.n_elements, sizes[i], sizes[j]),
                        batch.jac.det.dtype,
                    )
                )
                continue
            plan = try_plan(block, batch) if use_fused else None
            if plan is not None:
                cols.append(evaluate_block_fused(plan, batch, fields, k_cache))
            else:
                cols.append(evaluate_block(block, batch, fields, sizes[j]))
        rows.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(rows, axis=1)


def compute_element_vectors(
    form_spec: ElementFormSpecification,
    blocks: SystemBlocks,
    batch: ElementBatch,
    dofs,
    static_fields: dict | None = None,
    field_keys: Sequence | None = None,
) -> jnp.ndarray:
    """Element residual/forcing vectors ``[E, N]``: blocks applied to DoFs.

    Batched analogue of ``compute_element_vector`` (element_system.c:245-440):
    each block is seeded with the current solution slice of its column form.
    """
    p1, p2 = batch.orders
    sizes = form_spec.form_sizes(p1, p2)
    offsets = form_spec.form_offsets(p1, p2)
    from mfv2d_tpu.compiler import collect_fields

    needed = collect_fields(blocks)
    fields = compute_fields(batch, needed, form_spec, dofs, static_fields)

    rows = []
    for i, row in enumerate(blocks):
        acc = None
        for j, block in enumerate(row):
            if block is None:
                continue
            seed = dofs[:, offsets[j] : offsets[j + 1]]
            val = evaluate_block(block, batch, fields, sizes[j], initial=seed)
            acc = val if acc is None else acc + val
        if acc is None:
            acc = jnp.zeros((batch.n_elements, sizes[i]), dofs.dtype)
        rows.append(acc)
    return jnp.concatenate(rows, axis=1)


@lru_cache(maxsize=64)
def _reference_inclusion_cached(spec_items, orders_in, orders_out):
    import numpy as np

    from mfv2d_tpu.ops.basis import FemCache

    # Exact rule for the finer mass matrix: GLL with q points integrates
    # degree 2q-3, the fine mass integrand is degree 2*p_f.
    q1 = orders_out[0] + 3
    q2 = orders_out[1] + 3
    cache = FemCache(0)
    ref_corners = np.array([[[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]]])
    batch_in = ElementBatch(cache.get_basis2d(*orders_in, q1, q2), ref_corners)
    batch_out = ElementBatch(cache.get_basis2d(*orders_out, q1, q2), ref_corners)
    form_spec = ElementFormSpecification(*spec_items)
    projs = compute_element_projector(form_spec, batch_in, batch_out)
    n_in = form_spec.total_size(*orders_in)
    n_out = form_spec.total_size(*orders_out)
    off_in = form_spec.form_offsets(*orders_in)
    off_out = form_spec.form_offsets(*orders_out)
    full = np.zeros((n_out, n_in))
    for i, p in enumerate(projs):
        full[off_out[i] : off_out[i + 1], off_in[i] : off_in[i + 1]] = np.asarray(
            p
        )[0]
    return full


def reference_inclusion_matrix(
    form_spec: "ElementFormSpecification",
    orders_in: tuple[int, int],
    orders_out: tuple[int, int],
):
    """Shared coarse-to-fine inclusion matrix ``[n_out, n_in]`` (NumPy f64).

    For nested spaces on the *same* element (``orders_out >= orders_in``
    componentwise), every coarse basis function is exactly representable in
    the fine basis in reference space, and the same geometry map carries
    that identity to any (including bilinearly deformed) physical element:
    if ``phi_c = C phi_f`` on the reference square then
    ``M_cross = M_f C`` and the L2 projector ``M_f^{-1} M_cross = C`` is
    element-INDEPENDENT (verified to 7e-16 against the per-element
    projector on random deformed quads).  VMS stores this one matrix where
    the per-element path materializes ``[E, n_f, n_c]`` (2.2 GB at
    BASELINE config-5 scale; reference element_system.c:480-560 recomputes
    the projection per element).

    Computed once per (spec, orders) on a reference element with a
    quadrature rule exact for the fine mass matrix.
    """
    if orders_out[0] < orders_in[0] or orders_out[1] < orders_in[1]:
        raise ValueError(
            "Inclusion requires nested spaces: output orders must be >= "
            f"input orders ({orders_out} < {orders_in})."
        )
    return _reference_inclusion_cached(
        tuple((n, int(o)) for n, o in form_spec),
        tuple(orders_in),
        tuple(orders_out),
    )


def compute_element_projector(
    form_spec: ElementFormSpecification,
    batch_in: ElementBatch,
    batch_out: ElementBatch,
) -> list[jnp.ndarray]:
    """Per-form L2 projection matrices from ``batch_in`` to ``batch_out``.

    ``P = M_out^{-1} @ M_cross`` with cross-space mass matrices evaluated on
    the shared integration grid (element_system.c:480-560).  Returns one
    ``[E, n_out, n_in]`` array per form.
    """
    if batch_in.basis.integration_orders != batch_out.basis.integration_orders:
        raise ValueError("Input and output integration rules must match.")
    out: list[jnp.ndarray] = []
    jac = batch_in.jac
    for _, order in form_spec:
        if order == UnknownFormOrder.FORM_ORDER_0:
            cross = mass_node_double(batch_in.tb, batch_out.tb, jac)
        elif order == UnknownFormOrder.FORM_ORDER_1:
            cross = mass_edge_double(batch_in.tb, batch_out.tb, jac)
        elif order == UnknownFormOrder.FORM_ORDER_2:
            cross = mass_surf_double(batch_in.tb, batch_out.tb, jac)
        else:
            raise ValueError(f"Invalid form order {order}.")
        out.append(_mass_solve(batch_out.mass(order, False), cross))
    return out


# ---------------------------------------------------------------------------
# Cached jitted evaluators
# ---------------------------------------------------------------------------
#
# Jitted element evaluation keyed on the *mathematical* signature
# (orders, integration orders, block structure, form spec, field keys) rather
# than on Python object identity, so repeated solves, time steps, and
# refinement rounds reuse compiled executables whenever shapes match.

def _pad_pow2(a, e: int, ep: int):
    """Pad axis 0 from ``e`` to ``ep`` entries by repeating the last one."""
    a = jnp.asarray(a)
    return jnp.concatenate(
        [a, jnp.broadcast_to(a[-1:], (ep - e, *a.shape[1:]))], axis=0
    )


def _pow2(e: int) -> int:
    return 1 << max(0, e - 1).bit_length()


# Bounded: keys hold user callables (static field functions), so an
# unbounded cache would retain user closures and compiled executables for
# the process lifetime (long refinement studies with changing fields leak).
@lru_cache(maxsize=256)
def _cached_element_fn(
    orders: tuple[int, int],
    int_orders: tuple[int, int],
    blocks,
    spec_items,
    static_keys,
    mode: str,
    fused: bool = True,
    chunk_cap: int | None = None,
):
    import jax

    from mfv2d_tpu.ops.basis import FemCache

    basis = FemCache(0).get_basis2d(
        orders[0], orders[1], int_orders[0], int_orders[1]
    )
    form_spec = ElementFormSpecification(*spec_items)

    if mode == "vector":

        @jax.jit
        def fn(corners, dofs, static_vals):
            batch = ElementBatch(basis, corners)
            statics = dict(zip(static_keys, static_vals))
            return compute_element_vectors(
                form_spec, blocks, batch, dofs, static_fields=statics
            )

    elif mode == "matrix":

        @jax.jit
        def fn(corners, dofs, static_vals):
            batch = ElementBatch(basis, corners)
            statics = dict(zip(static_keys, static_vals))
            return compute_element_matrices(
                form_spec, blocks, batch, dofs=dofs, static_fields=statics
            )

    else:
        raise ValueError(mode)

    def dispatch(corners, dofs, static_vals):
        # Pad the element count to the next power of two (repeating the
        # last element) so refinement rounds — which change E every round —
        # reuse the compiled executable instead of retracing.  Measured:
        # recompilation was 5.4 s of an 8.0 s warm hp-refinement round.
        e = corners.shape[0]
        ep = _pow2(e)
        if ep == e:
            return fn(corners, dofs, static_vals)
        out = fn(
            _pad_pow2(corners, e, ep),
            None if dofs is None else _pad_pow2(dofs, e, ep),
            tuple(_pad_pow2(s, e, ep) for s in static_vals),
        )
        return out[:e]

    # Element dispatches at VMS scale overflow single-chip HBM as one
    # program: matrix OUTPUTS materialize at [4096, 320, 320] f64 = 3.4 GB
    # before quadrature intermediates, and vector dispatches build the
    # same per-block [E, n, n] operands INTERNALLY before the GEMV (the
    # first 64x64 p=8 residual_value died RESOURCE_EXHAUSTED with ~11 GB
    # of VMS operators resident).  Cap each dispatch so the live working
    # set stays ~0.5 GB (matching the projector and explicit-inverse
    # build budgets).  Chunks share one compiled shape (every chunk, tail
    # included, pads to the cap).
    if chunk_cap is None:
        n_total = form_spec.total_size(*orders)
        cap = max(1, int(5e8 / (n_total * n_total * 8)))
        cap = 1 << (cap.bit_length() - 1)
    else:
        cap = int(chunk_cap)  # tests exercise the chunked path at small n

    def padded(corners, dofs, static_vals, *, as_chunks: bool = False):
        # as_chunks=True returns the per-dispatch device chunks WITHOUT the
        # device concatenate: at VMS fine scale the concat alone is a second
        # [4096, 320, 320] f64 HBM copy (3.4 GB transient), and a caller
        # holding chunks can stream each one host-side while later chunks
        # (and any downstream per-chunk consumers, e.g. the Galerkin
        # GEMMs) still compute — overlapping the ~3.4 GB tunnel download
        # with device work instead of serializing after it.
        e = corners.shape[0]
        if e <= cap:
            out = dispatch(corners, dofs, static_vals)
            return [out] if as_chunks else out
        chunks = [
            dispatch(
                corners[lo : lo + cap],
                None if dofs is None else dofs[lo : lo + cap],
                tuple(s[lo : lo + cap] for s in static_vals),
            )
            for lo in range(0, e, cap)
        ]
        return chunks if as_chunks else jnp.concatenate(chunks, axis=0)

    return padded


def jit_element_matrices(
    form_spec, blocks, batch: ElementBatch, dofs=None, static_fields=None
):
    """compute_element_matrices through the shape-cached jitted padded path."""
    statics = static_fields or {}
    keys = tuple(statics.keys())
    fn = element_matrix_fn(batch, blocks, form_spec, keys)
    return fn(batch.corners, dofs, tuple(statics[k] for k in keys))


def jit_element_vectors(
    form_spec, blocks, batch: ElementBatch, dofs, static_fields=None
):
    """compute_element_vectors through the shape-cached jitted padded path."""
    statics = static_fields or {}
    keys = tuple(statics.keys())
    fn = element_vector_fn(batch, blocks, form_spec, keys)
    return fn(batch.corners, dofs, tuple(statics[k] for k in keys))


def element_vector_fn(batch: ElementBatch, blocks, form_spec, static_keys=()):
    """Shape-cached jitted ``(corners, dofs, static_vals) -> [E, N]``."""
    from mfv2d_tpu.config import config as _cfg

    return _cached_element_fn(
        batch.orders,
        batch.basis.integration_orders,
        blocks,
        tuple((n, int(o)) for n, o in form_spec),
        tuple(static_keys),
        "vector",
        _cfg.fused_assembly,
    )


def element_matrix_fn(batch: ElementBatch, blocks, form_spec, static_keys=()):
    """Shape-cached jitted ``(corners, dofs, static_vals) -> [E, N, N]``."""
    from mfv2d_tpu.config import config as _cfg

    return _cached_element_fn(
        batch.orders,
        batch.basis.integration_orders,
        blocks,
        tuple((n, int(o)) for n, o in form_spec),
        tuple(static_keys),
        "matrix",
        _cfg.fused_assembly,
    )


# ---------------------------------------------------------------------------
# Cached jitted projector / mass application
# ---------------------------------------------------------------------------
#
# The refinement estimators and VMS call these once per bucket per round with
# element counts that change every round; running them eagerly cost one XLA
# compile per op per shape (measured: 814 compiles / 84 s of a 110 s
# refinement example).  Shape-cached jit + power-of-two element padding makes
# the compiled executables recur.


@lru_cache(maxsize=256)
def _cached_projector_fn(orders_in, orders_out, int_orders, spec_items):
    import jax

    from mfv2d_tpu.ops.basis import FemCache

    cache = FemCache(0)
    basis_in = cache.get_basis2d(*orders_in, *int_orders)
    basis_out = cache.get_basis2d(*orders_out, *int_orders)
    form_spec = ElementFormSpecification(*spec_items)

    @jax.jit
    def fn(corners):
        return tuple(
            compute_element_projector(
                form_spec,
                ElementBatch(basis_in, corners),
                ElementBatch(basis_out, corners),
            )
        )

    def dispatch(corners, e, ep):
        if ep == e:
            return fn(corners)
        return tuple(o[:e] for o in fn(_pad_pow2(corners, e, ep)))

    def padded(corners):
        corners = jnp.asarray(corners)
        e = corners.shape[0]
        # The projector build materializes large quadrature intermediates
        # per element (measured: the compile for a 4096-element p=8->10
        # batch asks for 39 GB of HBM); cap each dispatch and concatenate.
        # Chunks share one compiled shape (tail pads to the cap).
        cap = 512
        if e <= cap:
            return dispatch(corners, e, _pow2(e))
        chunks = [
            dispatch(corners[i : i + cap], min(cap, e - i), cap)
            for i in range(0, e, cap)
        ]
        return tuple(
            jnp.concatenate([c[j] for c in chunks], axis=0)
            for j in range(len(chunks[0]))
        )

    return padded


def jit_element_projector(
    form_spec, batch_in: ElementBatch, batch_out: ElementBatch
) -> list[jnp.ndarray]:
    """compute_element_projector through the shape-cached jitted padded path."""
    if batch_in.basis.integration_orders != batch_out.basis.integration_orders:
        raise ValueError("Input and output integration rules must match.")
    fn = _cached_projector_fn(
        batch_in.orders,
        batch_out.orders,
        batch_in.basis.integration_orders,
        tuple((n, int(o)) for n, o in form_spec),
    )
    return list(fn(batch_in.corners))


@lru_cache(maxsize=256)
def _cached_mass_apply_fn(orders, int_orders, form_orders, inverse: bool):
    import jax

    from mfv2d_tpu.ops.basis import FemCache

    basis = FemCache(0).get_basis2d(*orders, *int_orders)
    orders_list = tuple(UnknownFormOrder(o) for o in form_orders)

    @jax.jit
    def fn(corners, dofs):
        batch = ElementBatch(basis, corners)
        parts = []
        off = 0
        for order in orders_list:
            n = order.full_unknown_count(*orders)
            v = dofs[:, off : off + n]
            off += n
            m = batch.mass(order, False)
            if inverse:
                parts.append(_mass_solve(m, v[..., None])[..., 0])
            else:
                parts.append(jnp.einsum("eij,ej->ei", m, v))
        return jnp.concatenate(parts, axis=1)

    def padded(corners, dofs):
        corners = jnp.asarray(corners)
        e = corners.shape[0]
        ep = _pow2(e)
        if ep == e:
            return fn(corners, dofs)
        return fn(_pad_pow2(corners, e, ep), _pad_pow2(dofs, e, ep))[:e]

    return padded


def jit_apply_mass(
    form_spec, batch: ElementBatch, dofs, *, inverse: bool
) -> jnp.ndarray:
    """Per-form (inverse) mass application over the full element vector.

    ``dofs`` is ``[E, total_size]``; applies M or M^-1 of each form's order
    to its slice (primal<->dual conversion, solve_system.py:274-351).
    """
    fn = _cached_mass_apply_fn(
        batch.orders,
        batch.basis.integration_orders,
        tuple(int(o) for _, o in form_spec),
        bool(inverse),
    )
    return fn(batch.corners, dofs)


@lru_cache(maxsize=256)
def _cached_project_apply_fn(orders_in, orders_out, int_orders, spec_items, roundtrip):
    import jax

    from mfv2d_tpu.ops.basis import FemCache

    cache = FemCache(0)
    basis_in = cache.get_basis2d(*orders_in, *int_orders)
    basis_out = cache.get_basis2d(*orders_out, *int_orders)
    form_spec = ElementFormSpecification(*spec_items)

    @jax.jit
    def fn(corners, dofs):
        batch_in = ElementBatch(basis_in, corners)
        batch_out = ElementBatch(basis_out, corners)
        projs = compute_element_projector(form_spec, batch_in, batch_out)
        offsets = form_spec.form_offsets(*orders_in)
        parts = [
            jnp.einsum("eij,ej->ei", p, dofs[:, offsets[i] : offsets[i + 1]])
            for i, p in enumerate(projs)
        ]
        out = jnp.concatenate(parts, axis=1)
        if not roundtrip:
            return out
        back = compute_element_projector(form_spec, batch_out, batch_in)
        offs_out = form_spec.form_offsets(*orders_out)
        parts_b = [
            jnp.einsum("eij,ej->ei", p, out[:, offs_out[i] : offs_out[i + 1]])
            for i, p in enumerate(back)
        ]
        return dofs - jnp.concatenate(parts_b, axis=1)

    def padded(corners, dofs):
        corners = jnp.asarray(corners)
        dofs = jnp.asarray(dofs)
        e = corners.shape[0]
        ep = _pow2(e)
        if ep == e:
            return fn(corners, dofs)
        return fn(_pad_pow2(corners, e, ep), _pad_pow2(dofs, e, ep))[:e]

    return padded


def jit_project_between(
    form_spec, batch_in: ElementBatch, batch_out: ElementBatch, dofs
) -> jnp.ndarray:
    """L2-project a full element DoF vector between two order spaces."""
    fn = _cached_project_apply_fn(
        batch_in.orders,
        batch_out.orders,
        batch_in.basis.integration_orders,
        tuple((n, int(o)) for n, o in form_spec),
        False,
    )
    return fn(batch_in.corners, dofs)


def jit_projection_roundtrip_error(
    form_spec, batch: ElementBatch, batch_lower: ElementBatch, dofs
) -> jnp.ndarray:
    """``dofs - P_up(P_down(dofs))``: the order-reduction error DoFs."""
    fn = _cached_project_apply_fn(
        batch.orders,
        batch_lower.orders,
        batch.basis.integration_orders,
        tuple((n, int(o)) for n, o in form_spec),
        True,
    )
    return fn(batch.corners, dofs)
