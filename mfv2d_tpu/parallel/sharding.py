"""Multi-chip element-parallel solve over a JAX device mesh.

The hybridized structure is exactly the distributed seam the reference was
designed around (docs/modules/solving.rst:10-13): element blocks are
embarrassingly parallel, and the only communication is the trace (constraint)
exchange.  Here element batches are sharded along a 1D mesh axis ``"e"`` with
``shard_map``; each Krylov matvec does

    1. local batched block GEMV / LU-solve on the device's elements,
    2. local partial ``G x`` via a per-device segment-sum,
    3. one ``psum`` over the mesh axis to reduce the trace vector,
    4. local ``G^T lambda`` scatter from the (replicated) trace vector.

So one all-reduce of size ``n_lagrange`` per matvec rides the ICI; no other
communication exists.  The same layout scales the Picard residual evaluation
(element-local) and the assembly (fully local).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfv2d_tpu.solver.discretization import Discretization


def _pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths)


class ShardedBlockSystem:
    """Element-sharded saddle system over a 1D device mesh.

    Supports a single order bucket directly; for hp meshes use
    :class:`MultiBucketShardedSystem`, which wraps one of these per bucket.

    Parameters
    ----------
    disc : Discretization
        Single-bucket discretization.
    element_matrices : [E, n, n] array
        Element matrix batch (bucket 0).
    lagrange_mat : scipy CSR or None
        Constraint matrix over the global DoF vector.
    mesh : jax.sharding.Mesh
        1D device mesh with axis name "e".
    """

    def __init__(
        self,
        disc: Discretization,
        element_matrices: np.ndarray,
        lagrange_mat: sp.csr_array | None,
        mesh: Mesh,
    ) -> None:
        if len(disc.buckets) != 1:
            raise NotImplementedError(
                "ShardedBlockSystem expects a uniform-order mesh; use"
                " MultiBucketShardedSystem for hp meshes."
            )
        self.mesh = mesh
        self.n_devices = mesh.devices.size
        bucket = disc.buckets[0]
        e_real = bucket.batch.n_elements
        self.n_dofs_per_element = element_matrices.shape[1]
        n = self.n_dofs_per_element

        blocks = _pad_to_multiple(np.asarray(element_matrices), self.n_devices)
        # Padding elements get identity blocks so the batched LU stays valid.
        for i in range(e_real, blocks.shape[0]):
            blocks[i] = np.eye(n)
        self.e_padded = blocks.shape[0]
        self.e_real = e_real

        if lagrange_mat is not None:
            coo = lagrange_mat.tocoo()
            self.n_lagrange = lagrange_mat.shape[0]
            rows = np.asarray(coo.row, np.int64)
            cols = np.asarray(coo.col, np.int64)
            vals = np.asarray(coo.data)
        else:
            self.n_lagrange = 0
            rows = np.zeros(0, np.int64)
            cols = np.zeros(0, np.int64)
            vals = np.zeros(0)

        # Map flat DoF columns to (element, local dof) and partition entries
        # by the owning device (elements are block-distributed).  Both trace
        # products use padded GATHER layouts: TPU scatters/segment-sums are
        # ~10x slower than dense gathers (zero-valued padding is a no-op).
        elem_of_entry = cols // n
        local_dof = cols % n
        per_dev = self.e_padded // self.n_devices
        owner = elem_of_entry // per_dev
        nd = self.n_devices
        n_lag = max(self.n_lagrange, 1)

        # Row-major per device: G x = psum of per-device partial row sums.
        fill1 = np.zeros((nd, n_lag), np.int64)
        for d, r in zip(owner, rows):
            fill1[d, r] += 1
        k1 = max(1, int(fill1.max()))
        tr_elem = np.zeros((nd, n_lag, k1), np.int32)
        tr_dof = np.zeros((nd, n_lag, k1), np.int32)
        tr_val = np.zeros((nd, n_lag, k1))
        fill1[:] = 0
        for i in range(rows.size):
            d, r = int(owner[i]), int(rows[i])
            j = fill1[d, r]
            tr_elem[d, r, j] = elem_of_entry[i] - d * per_dev
            tr_dof[d, r, j] = local_dof[i]
            tr_val[d, r, j] = vals[i]
            fill1[d, r] += 1

        # Column-major per device: G^T lam gathered per local (element, dof).
        fill2 = np.zeros((self.e_padded, n), np.int64)
        for e, dd in zip(elem_of_entry, local_dof):
            fill2[e, dd] += 1
        k2 = max(1, int(fill2.max()))
        tt_rows = np.zeros((self.e_padded, n, k2), np.int32)
        tt_val = np.zeros((self.e_padded, n, k2))
        fill2[:] = 0
        for i in range(rows.size):
            e, dd = int(elem_of_entry[i]), int(local_dof[i])
            j = fill2[e, dd]
            tt_rows[e, dd, j] = rows[i]
            tt_val[e, dd, j] = vals[i]
            fill2[e, dd] += 1

        shard_e = NamedSharding(mesh, P("e"))
        self.blocks = jax.device_put(blocks, NamedSharding(mesh, P("e", None, None)))
        # TPU XLA only implements LuDecomposition in f32 and runs batched
        # triangular solves ~23x slower than a GEMV, so on TPU "lu" holds a
        # precomputed f32 explicit inverse (applied as a GEMV + f64
        # refinement); elsewhere it is the f64 LU factorization.
        self._refine = jax.default_backend() == "tpu"
        if self._refine:
            inv = np.asarray(
                jnp.linalg.inv(jnp.asarray(blocks, jnp.float32))
            )
            self.lu = jax.device_put(inv, NamedSharding(mesh, P("e", None, None)))
            self.piv = jax.device_put(
                np.zeros((blocks.shape[0], blocks.shape[1]), np.int32),
                NamedSharding(mesh, P("e", None)),
            )
        else:
            lu, piv = jax.scipy.linalg.lu_factor(jnp.asarray(blocks))
            self.lu = jax.device_put(lu, NamedSharding(mesh, P("e", None, None)))
            self.piv = jax.device_put(piv, NamedSharding(mesh, P("e", None)))
        self.tr_elem = jax.device_put(tr_elem, shard_e)
        self.tr_dof = jax.device_put(tr_dof, shard_e)
        self.tr_val = jax.device_put(tr_val, shard_e)
        shard_e3 = NamedSharding(mesh, P("e", None, None))
        self.tt_rows = jax.device_put(tt_rows, shard_e3)
        self.tt_val = jax.device_put(tt_val, shard_e3)
        self.dof_sharding = NamedSharding(mesh, P("e", None))

    # -- shard_map kernels ---------------------------------------------

    def _block_solve(self, lu, piv, blocks, rhs):
        """Batched A^{-1} rhs; refined f32-inverse GEMV on TPU, f64 LU
        elsewhere (piv is a dummy on TPU)."""
        if not self._refine:
            return jax.scipy.linalg.lu_solve((lu, piv), rhs[..., None])[..., 0]
        x = jnp.einsum("eij,ej->ei", lu, rhs.astype(jnp.float32)).astype(
            rhs.dtype
        )
        for _ in range(3):
            r = rhs - jnp.einsum("eij,ej->ei", blocks, x)
            x = x + jnp.einsum(
                "eij,ej->ei", lu, r.astype(jnp.float32)
            ).astype(rhs.dtype)
        return x

    def _trace_local(self, dofs_local, tr_elem, tr_dof, tr_val):
        """Per-device partial G x (padded gather) + psum over the mesh axis."""
        partial_sum = jnp.sum(
            tr_val[0] * dofs_local[tr_elem[0], tr_dof[0]], axis=-1
        )
        return jax.lax.psum(partial_sum, "e")[: self.n_lagrange]

    def _trace_t_local(self, lam, tt_rows, tt_val):
        """Local G^T lambda as a padded gather (lambda replicated)."""
        return jnp.sum(tt_val * lam[tt_rows], axis=-1)

    def make_schur_matvec(self):
        """Jitted sharded S = G A^{-1} G^T matvec."""
        per_dev = self.e_padded // self.n_devices
        n = self.n_dofs_per_element

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P(None),
                P("e", None, None),
                P("e", None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
            ),
            out_specs=P(None),
        )
        def schur(lam, lu, piv, blocks, tr_elem, tr_dof, tr_val, tt_rows, tt_val):
            gt = self._trace_t_local(lam, tt_rows, tt_val)
            ainv = self._block_solve(lu, piv, blocks, gt)
            return self._trace_local(ainv, tr_elem, tr_dof, tr_val)

        def matvec(lam):
            return schur(
                lam,
                self.lu,
                self.piv,
                self.blocks,
                self.tr_elem,
                self.tr_dof,
                self.tr_val,
                self.tt_rows,
                self.tt_val,
            )

        return jax.jit(matvec)

    def make_residual_step(self):
        """Jitted sharded saddle application: (u, lam) -> (A u + G^T lam, G u).

        This is the communication pattern of one full solve iteration: the
        element part is local, the trace part needs one psum.
        """
        per_dev = self.e_padded // self.n_devices
        n = self.n_dofs_per_element

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P("e", None),
                P(None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
            ),
            out_specs=(P("e", None), P(None)),
        )
        def step(dofs, lam, blocks, tr_elem, tr_dof, tr_val, tt_rows, tt_val):
            au = jnp.einsum("eij,ej->ei", blocks, dofs)
            gt = self._trace_t_local(lam, tt_rows, tt_val)
            trace = self._trace_local(dofs, tr_elem, tr_dof, tr_val)
            return au + gt, trace

        def apply_saddle(dofs, lam):
            return step(
                dofs,
                lam,
                self.blocks,
                self.tr_elem,
                self.tr_dof,
                self.tr_val,
                self.tt_rows,
                self.tt_val,
            )

        return jax.jit(apply_saddle)

    # -- data movement --------------------------------------------------

    def shard_dofs(self, flat: np.ndarray) -> jnp.ndarray:
        """Global flat DoF vector -> sharded [E_padded, n] batch."""
        arr = np.asarray(flat).reshape(self.e_real, self.n_dofs_per_element)
        arr = _pad_to_multiple(arr, self.n_devices)
        return jax.device_put(arr, self.dof_sharding)

    def unshard_dofs(self, dofs: jnp.ndarray) -> np.ndarray:
        """Sharded batch -> global flat DoF vector."""
        return np.asarray(dofs)[: self.e_real].reshape(-1)


def sharded_schur_solve(
    system: ShardedBlockSystem,
    rhs_flat: np.ndarray,
    constraints: np.ndarray,
    maximum_iterations: int,
    tolerance: float,
):
    """CG on the sharded Schur complement; element work stays sharded."""
    matvec = system.make_schur_matvec()
    per_dev = system.e_padded // system.n_devices
    n = system.n_dofs_per_element

    # A^{-1} b and the Schur RHS.
    b = system.shard_dofs(rhs_flat)
    ainv_b = system._block_solve(system.lu, system.piv, system.blocks, b)

    @partial(
        jax.shard_map,
        mesh=system.mesh,
        in_specs=(
            P("e", None),
            P("e", None, None),
            P("e", None, None),
            P("e", None, None),
        ),
        out_specs=P(None),
    )
    def trace_of(dofs, tr_elem, tr_dof, tr_val):
        return system._trace_local(dofs, tr_elem, tr_dof, tr_val)

    trace_rhs = (
        trace_of(ainv_b, system.tr_elem, system.tr_dof, system.tr_val)
        - jnp.asarray(constraints)
    )

    lam = jnp.zeros(system.n_lagrange)
    res = trace_rhs - matvec(lam)
    p = res
    mag2 = float(jnp.vdot(res, res))
    iters = 0
    for iters in range(maximum_iterations):
        sp_ = matvec(p)
        denom = float(jnp.vdot(sp_, p))
        if denom == 0:
            break
        alpha = mag2 / denom
        lam = lam + alpha * p
        res = res - alpha * sp_
        new_mag2 = float(jnp.vdot(res, res))
        if new_mag2 < tolerance * tolerance:
            mag2 = new_mag2
            break
        p = res + (new_mag2 / mag2) * p
        mag2 = new_mag2

    # Back substitution: u = A^{-1}(b - G^T lam)
    @partial(
        jax.shard_map,
        mesh=system.mesh,
        in_specs=(
            P(None),
            P("e", None, None),
            P("e", None),
            P("e", None, None),
            P("e", None),
            P("e", None, None),
            P("e", None, None),
        ),
        out_specs=P("e", None),
    )
    def backsub(lam, lu, piv, blocks, b_loc, tt_rows, tt_val):
        gt = system._trace_t_local(lam, tt_rows, tt_val)
        return system._block_solve(lu, piv, blocks, b_loc - gt)

    u = backsub(
        lam,
        system.lu,
        system.piv,
        system.blocks,
        b,
        system.tt_rows,
        system.tt_val,
    )
    return system.unshard_dofs(u), np.asarray(lam), float(np.sqrt(mag2)), iters + 1


class MultiBucketShardedSystem:
    """hp-mesh sharding: one element-sharded block system per order bucket.

    Each bucket's elements are distributed over the same device mesh; the
    Schur matvec sums the per-bucket ``G A^{-1} G^T`` contributions, each of
    which ends in a psum, so lambda stays replicated.  Bucket matvecs are
    issued back-to-back and overlap across the mesh.
    """

    def __init__(
        self,
        disc: Discretization,
        element_matrices: list[np.ndarray],
        lagrange_mat: sp.csr_array | None,
        mesh: Mesh,
    ) -> None:
        from mfv2d_tpu.solver.discretization import Discretization as _D

        self.n_lagrange = 0 if lagrange_mat is None else lagrange_mat.shape[0]
        self.subsystems = []
        for bucket, mats in zip(disc.buckets, element_matrices):
            # Build a single-bucket view with column indices relative to the
            # bucket's own flat DoF vector (elements packed contiguously).
            n = mats.shape[1]
            e = mats.shape[0]
            sub_disc = _D(
                mesh=disc.mesh,
                form_spec=disc.form_spec,
                basis_cache=disc.basis_cache,
                leaf_indices=tuple(
                    disc.leaf_indices[int(r)] for r in bucket.leaf_ranks
                ),
                element_orders=disc.element_orders[bucket.leaf_ranks],
                element_sizes=np.full(e, n, np.int64),
                element_offsets=np.arange(e + 1, dtype=np.int64) * n,
                buckets=[bucket],
            )
            # Remap the global constraint columns into bucket-local columns.
            if lagrange_mat is not None:
                coo = lagrange_mat.tocoo()
                col_map = np.full(disc.n_dofs, -1, np.int64)
                flat = bucket.gather.reshape(-1)
                col_map[flat] = np.arange(flat.size)
                sel = col_map[coo.col] >= 0
                sub_g = sp.csr_array(
                    (
                        coo.data[sel],
                        (coo.row[sel], col_map[coo.col[sel]]),
                    ),
                    shape=(self.n_lagrange, e * n),
                )
            else:
                sub_g = None
            # The sub-bucket's gather map is the identity layout.
            local_bucket = type(bucket)(
                orders=bucket.orders,
                leaf_ranks=np.arange(e),
                batch=bucket.batch,
                gather=np.arange(e * n, dtype=np.int64).reshape(e, n),
            )
            sub_disc.buckets = [local_bucket]
            self.subsystems.append(
                (bucket, ShardedBlockSystem(sub_disc, mats, sub_g, mesh))
            )
        self.disc = disc

    def make_schur_matvec(self):
        fns = [sub.make_schur_matvec() for _, sub in self.subsystems]

        def matvec(lam):
            out = None
            for fn in fns:
                v = fn(lam)
                out = v if out is None else out + v
            return out

        return matvec

    def schur_rhs(self, rhs_flat: np.ndarray, constraints: np.ndarray):
        """G A^{-1} b - c across buckets."""
        total = -jnp.asarray(constraints)
        self._ainv_b = []
        for bucket, sub in self.subsystems:
            b = np.asarray(rhs_flat)[bucket.gather].reshape(-1)
            b_sh = sub.shard_dofs(b)
            ainv = sub._block_solve(sub.lu, sub.piv, sub.blocks, b_sh)
            self._ainv_b.append(ainv)
            from jax.sharding import PartitionSpec as P

            @partial(
                jax.shard_map,
                mesh=sub.mesh,
                in_specs=(
                    P("e", None),
                    P("e", None, None),
                    P("e", None, None),
                    P("e", None, None),
                ),
                out_specs=P(None),
            )
            def trace_of(dofs, te, td, tv):
                return sub._trace_local(dofs, te, td, tv)

            total = total + trace_of(ainv, sub.tr_elem, sub.tr_dof, sub.tr_val)
        return total

    def solve_schur(self, rhs_flat, constraints, maximum_iterations, tolerance):
        """CG on the multi-bucket Schur complement."""
        matvec = self.make_schur_matvec()
        trace_rhs = self.schur_rhs(rhs_flat, constraints)
        lam = jnp.zeros(self.n_lagrange)
        res = trace_rhs - matvec(lam)
        p = res
        mag2 = float(jnp.vdot(res, res))
        iters = 0
        for iters in range(maximum_iterations):
            sp_ = matvec(p)
            denom = float(jnp.vdot(sp_, p))
            if denom == 0:
                break
            alpha = mag2 / denom
            lam = lam + alpha * p
            res = res - alpha * sp_
            new_mag2 = float(jnp.vdot(res, res))
            if new_mag2 < tolerance * tolerance:
                mag2 = new_mag2
                break
            p = res + (new_mag2 / mag2) * p
            mag2 = new_mag2

        # Back substitution per bucket.
        out = np.zeros(self.disc.n_dofs)
        for (bucket, sub), ainv_b in zip(self.subsystems, self._ainv_b):
            from jax.sharding import PartitionSpec as P

            per_dev = sub.e_padded // sub.n_devices
            n = sub.n_dofs_per_element

            @partial(
                jax.shard_map,
                mesh=sub.mesh,
                in_specs=(
                    P(None),
                    P("e", None, None),
                    P("e", None),
                    P("e", None, None),
                    P("e", None),
                    P("e", None, None),
                    P("e", None, None),
                ),
                out_specs=P("e", None),
            )
            def backsub(lam_, lu, piv, blocks, ainv, ttr, ttv):
                gt_local = sub._trace_t_local(lam_, ttr, ttv)
                corr = sub._block_solve(lu, piv, blocks, gt_local)
                return ainv - corr

            u_local = backsub(
                lam,
                sub.lu,
                sub.piv,
                sub.blocks,
                ainv_b,
                sub.tt_rows,
                sub.tt_val,
            )
            out[bucket.gather.reshape(-1)] = sub.unshard_dofs(u_local)
        return out, np.asarray(lam), float(np.sqrt(mag2)), iters + 1
