"""Row-partitioned GENERAL-sparsity execution: the windowed-gather Pallas
SpMM under ``shard_map``.

dist/sharded.py distributes the structured (DIA) operand class; this module
extends the distributed layer to the reference's native operand class —
arbitrary CSR/BCRS patterns (kernels_cpp.hh:626-657) as ELL / block-ELL.
The reference itself has no distributed execution at all (MPI deliberately
disabled, src/dune-eigensolver.cc:742-748).

Design:

* rows are split into P equal shards; after an RCM-style ordering the
  pattern's bandwidth ``halo = max |col - row|`` is bounded, so a shard's
  SpMM needs only its neighbors' boundary rows — the same
  ``lax.ppermute`` halo exchange as the DIA path (``halo_exchange_t``).
* each shard's local block is re-planned HOST-SIDE into a ``WindowedELL``
  over its halo-EXTENDED column space ``[r0 - halo, r1 + halo)`` (edge
  shards read the zero fill ppermute provides, matching the planner's
  zero-coefficient guards).
* shard_map needs one static kernel for every shard, so the per-shard
  plans are UNIFIED: segment slots are merged by (block offset, rank)
  with per-offset multiplicity maxed across shards (absent slots carry
  zero coefficients), window/width/tail sizes are maxed, and the per-shard
  arrays are stacked on a leading shard axis that ``in_specs`` splits.
* the hot loop inside shard_map is then: halo exchange -> zero-pad to the
  unified width -> ``windowed_spmm_t`` (the m-tiled vreg-gather kernel)
  -> slice the local rows. Gram reductions psum as usual.

Any ``n`` is accepted: ``windowed_shard_plan`` pads non-divisible row
counts host-side with decoupled identity/zero diagonal rows (the DIA
drivers' convention — pad lanes stay exactly zero; r4's v1 required
``n % P == 0``). ``windowed_spmm_halo_t`` overlaps the ppermute with the
interior rows by default (``overlap_interior``): rows whose gather window
lies inside the local lanes run on a halo-independent kernel instance
that XLA can schedule against the collective; only the boundary tiles
consume the exchanged slabs (r4's v1 serialized exchange before kernel).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dune_eigensolver_tpu.dist.mesh import ROW_AXIS, make_mesh
from dune_eigensolver_tpu.dist.sharded import (
    _cached_program,
    _mesh_key,
    _on_tpu,
    _result_specs,
    _slice_result,
    halo_exchange_t,
    psum_reduce,
)
from dune_eigensolver_tpu.kernels.gather_spmm import (
    WindowedELL,
    _build_segmented,
    _round_up,
    _validate_vmem,
    windowed_spmm_t,
)
from dune_eigensolver_tpu.sparse.formats import (
    BSRMatrix,
    DIAMatrix,
    ELLMatrix,
    ell_from_scipy,
)


@dataclasses.dataclass(frozen=True)
class WindowedShardPlan:
    """P per-shard WindowedELL containers with UNIFIED static metadata,
    stacked on a leading shard axis (split by shard_map in_specs).

    ``bnd_left``/``bnd_right`` are dense (halo, halo) boundary blocks per
    shard — the entries whose columns land in the exchanged halo slabs,
    extracted from the kernel's input space so the Pallas kernel can run on
    local-only X (overlappable with the ppermute) while the boundary
    contributions ride two small MXU matmuls that alone consume the
    collective's output. Zero-size when halo == 0 or the halo exceeds
    ``_BND_DENSE_CAP`` (drivers then serialize exchange -> kernel, v1)."""

    data: jax.Array  # (P, smax_u, width_u)
    lanes: jax.Array  # (P, smax_u, width_u) int8
    starts: jax.Array  # (P, nt_u) int32
    far_rows: jax.Array  # (P, nfar_u) int32
    far_cols: jax.Array  # (P, nfar_u) int32
    far_vals: jax.Array  # (P, nfar_u)
    bnd_left: jax.Array  # (P, halo, halo) or (P, 0, 0)
    bnd_right: jax.Array  # (P, halo, halo) or (P, 0, 0)
    offs: Tuple[int, ...]  # unified static per-segment block offsets
    shape: Tuple[int, int]  # static per-shard logical (nloc, next)
    tile: int
    window: int
    nnz: int  # max per-shard nnz (cost-estimate grade)
    far_nnz: int  # max per-shard tail length (0 = no tail anywhere)
    halo: int
    nloc: int
    n: int  # global rows AFTER pad (nloc * P)
    n_logical: int = -1  # original rows; -1 = same as n (no pad)
    band_data: jax.Array = None  # (P, ndiag, nloc) local diag block, or (P, 0, 1)
    band_offsets: Tuple[int, ...] = ()  # static DIA offsets of band_data

    @property
    def width(self) -> int:
        return self.data.shape[-1]

    @property
    def rows(self) -> int:
        """Original (pre-pad) global row count."""
        return self.n if self.n_logical < 0 else self.n_logical


jax.tree_util.register_dataclass(
    WindowedShardPlan,
    data_fields=["data", "lanes", "starts", "far_rows", "far_cols",
                 "far_vals", "bnd_left", "bnd_right", "band_data"],
    meta_fields=["offs", "shape", "tile", "window", "nnz", "far_nnz",
                 "halo", "nloc", "n", "n_logical", "band_offsets"],
)

# dense boundary blocks cost 4 * halo^2 bytes per side per shard; past this
# the overlap machinery costs more HBM than it hides and the drivers fall
# back to the serialized exchange -> kernel order (v1, correct either way).
_BND_DENSE_CAP = 2048


def _to_scipy(A):
    if isinstance(A, (ELLMatrix, BSRMatrix, DIAMatrix)):
        return A.to_scipy().tocsr()
    import scipy.sparse as sp

    if sp.issparse(A):
        return A.tocsr()
    raise TypeError(f"windowed_shard_plan: unsupported operand {type(A)}")


def windowed_shard_plan(
    A, P_shards: int, tile: int = 2048, m: int = 8, diag_fill: float = 1.0,
    local_band: bool = False,
) -> WindowedShardPlan:
    """Host-side planning: split, re-plan per shard, unify, stack.

    ``n % P_shards != 0`` is handled by DECOUPLED host-side pad rows:
    ``diag_fill`` on the diagonal (1.0 for operators so pad lanes are
    well-conditioned, 0.0 for mass matrices — the DIA drivers' convention,
    sharded.py ``_pad_rows_dia``), zero coupling to real rows. With a
    zero start vector the pad lanes stay exactly zero through every linear
    operation, so the spectrum is untouched; the reference accepts any n
    at every entry point (eigensolver.hh:28,116,204)."""
    import scipy.sparse as sp

    S = _to_scipy(A)
    n_logical = n = S.shape[0]
    if S.shape[0] != S.shape[1]:
        raise ValueError("windowed_shard_plan: operator must be square")
    if n % P_shards != 0:
        n_pad = _round_up(n, P_shards)
        coo0 = S.tocoo()
        rows_, cols_, vals_ = coo0.row, coo0.col, coo0.data
        if diag_fill != 0.0:
            pr = np.arange(n, n_pad)
            rows_ = np.concatenate([rows_, pr])
            cols_ = np.concatenate([cols_, pr])
            vals_ = np.concatenate(
                [vals_, np.full(n_pad - n, diag_fill, dtype=vals_.dtype)]
            )
        S = sp.coo_matrix(
            (vals_, (rows_, cols_)), shape=(n_pad, n_pad)
        ).tocsr()
        n = n_pad
    nloc = n // P_shards
    coo = S.tocoo()
    halo = int(np.abs(coo.col - coo.row).max()) if coo.nnz else 0
    if halo > nloc:
        raise ValueError(
            f"windowed_shard_plan: bandwidth {halo} exceeds local rows "
            f"{nloc}; use fewer shards or reorder (RCM) first"
        )
    next_ = nloc + 2 * halo

    dtype = S.dtype
    bh = halo if 0 < halo <= _BND_DENSE_CAP else 0
    bnd_l = np.zeros((P_shards, bh, bh), np.dtype(dtype))
    bnd_r = np.zeros((P_shards, bh, bh), np.dtype(dtype))
    shards: List[WindowedELL] = []
    for i in range(P_shards):
        r0 = i * nloc
        Sl = S[r0 : r0 + nloc, :].tocoo()
        # shift to the halo-extended local column space; all entries land
        # in [0, next_) because |col - row| <= halo
        cols_ext = Sl.col - (r0 - halo)
        assert cols_ext.min() >= 0 and cols_ext.max() < next_
        Sl_ext = sp.coo_matrix(
            (Sl.data, (Sl.row, cols_ext)), shape=(nloc, next_)
        ).tocsr()
        if bh:
            # dense boundary blocks for the overlapped SpMM: rows that read
            # the left/right exchanged halo slabs (bandwidth bound => only
            # the first/last ``halo`` local rows can)
            bnd_l[i] = Sl_ext[:bh, :bh].toarray()
            bnd_r[i] = Sl_ext[nloc - bh :, halo + nloc :].toarray()
        Ae = ell_from_scipy(Sl_ext, dtype=dtype)
        shards.append(_build_segmented(Ae, WindowedELL, {}, tile, 0, m))

    Tr = shards[0].tile
    # --- unify segment slots: per offset value, max multiplicity ---
    def _mult(c):
        mult = {}
        for o in c.offs:
            mult[o] = mult.get(o, 0) + 1
        return mult

    union: dict = {}
    for c in shards:
        for o, k in _mult(c).items():
            union[o] = max(union.get(o, 0), k)
    offs_u = tuple(o for o in sorted(union) for _ in range(union[o]))
    smax_u = max(len(offs_u), 1)
    slot_of = {}  # (offset, rank) -> unified row
    for j, o in enumerate(offs_u):
        r = sum(1 for oo in offs_u[:j] if oo == o)
        slot_of[(o, r)] = j

    # --- unify window / width / tail sizes ---
    W_u = max(c.window for c in shards)
    # per-shard plans validated their own (W, smax) against the VMEM model,
    # but unification takes max-W and union-of-slots — re-check the mb=8
    # floor for the UNIFIED kernel (ADVICE r4: _pick_mb silently returns 8
    # even when nothing fits, the silent-NaN overrun class).
    _validate_vmem(W_u, smax_u, Tr, what="windowed_shard_plan (unified)")
    K_u = W_u // Tr + 1
    nt_real = -(-nloc // Tr)
    width_u = max(max(c.width for c in shards), next_)
    for c in shards:
        st = np.asarray(c.starts)[:nt_real]
        if len(st):
            width_u = max(width_u, (int(st.max()) // Tr + K_u) * Tr)
    width_u = _round_up(width_u, Tr)
    nt_u = width_u // Tr
    far_u = max(c.far_nnz for c in shards)
    nfar_u = max(int(np.asarray(c.far_rows).shape[0]) for c in shards)
    if far_u:
        nfar_u = _round_up(max(nfar_u, 1), 128)

    data = np.zeros((P_shards, smax_u, width_u), np.dtype(dtype))
    lanes = np.zeros((P_shards, smax_u, width_u), np.int8)
    starts = np.tile(
        (np.arange(nt_u, dtype=np.int32) * Tr)[None, :], (P_shards, 1)
    )
    far_rows = np.zeros((P_shards, nfar_u), np.int32)
    far_cols = np.zeros((P_shards, nfar_u), np.int32)
    far_vals = np.zeros((P_shards, nfar_u), np.dtype(dtype))
    for i, c in enumerate(shards):
        seen: dict = {}
        cd = np.asarray(c.data)
        cl = np.asarray(c.lanes)
        for j, o in enumerate(c.offs):
            r = seen.get(o, 0)
            seen[o] = r + 1
            u = slot_of[(o, r)]
            w = cd.shape[1]
            data[i, u, :w] = cd[j]
            lanes[i, u, :w] = cl[j]
        st = np.asarray(c.starts)
        starts[i, : st.shape[0]] = st
        # pad-region anchors beyond the shard's own nt keep the t*Tr rule
        fr = np.asarray(c.far_rows)
        far_rows[i, : fr.shape[0]] = fr
        far_cols[i, : fr.shape[0]] = np.asarray(c.far_cols)
        far_vals[i, : fr.shape[0]] = np.asarray(c.far_vals)

    if halo > _BND_DENSE_CAP:
        from dune_eigensolver_tpu.utils.vlog import warn_fallback

        warn_fallback(
            f"windowed_shard_plan: halo {halo} > {_BND_DENSE_CAP} — dense "
            "boundary blocks skipped, halo exchange will serialize before "
            "the kernel (no collective/compute overlap on this operand)"
        )

    # shard-local diagonal-block band (Schwarz inner engine): the post-RCM
    # bandwidth bound means each shard's nloc x nloc diagonal block is
    # banded with bw <= halo, so the device block-banded factorization
    # (factorize/banded.py) applies per shard — the same exact-local-solve
    # preconditioner the DIA dist layer has (sharded.schwarz_inverse_t)
    band_offsets: Tuple[int, ...] = ()
    band_data = np.zeros((P_shards, 0, 1), np.dtype(dtype))
    if local_band:
        from dune_eigensolver_tpu.factorize.banded import _DEVICE_BW_MAX
        from dune_eigensolver_tpu.sparse.formats import dia_from_scipy

        if halo > _DEVICE_BW_MAX:
            from dune_eigensolver_tpu.utils.vlog import warn_fallback

            warn_fallback(
                f"windowed_shard_plan: local bandwidth {halo} > "
                f"{_DEVICE_BW_MAX} — no per-shard banded block "
                "(Schwarz inner unavailable; use inner='cg')"
            )
        else:
            locals_ = [
                dia_from_scipy(
                    S[i * nloc : (i + 1) * nloc, i * nloc : (i + 1) * nloc],
                    dtype=dtype,
                )
                for i in range(P_shards)
            ]
            union = sorted(set().union(*(set(L.offsets) for L in locals_)))
            band_data = np.zeros(
                (P_shards, len(union), nloc), np.dtype(dtype)
            )
            pos = {o: j for j, o in enumerate(union)}
            for i, L in enumerate(locals_):
                for j, o in enumerate(L.offsets):
                    band_data[i, pos[o]] = np.asarray(L.data[j])
            band_offsets = tuple(union)

    return WindowedShardPlan(
        data=jnp.asarray(data),
        lanes=jnp.asarray(lanes),
        starts=jnp.asarray(starts),
        far_rows=jnp.asarray(far_rows),
        far_cols=jnp.asarray(far_cols),
        far_vals=jnp.asarray(far_vals),
        bnd_left=jnp.asarray(bnd_l),
        bnd_right=jnp.asarray(bnd_r),
        band_data=jnp.asarray(band_data),
        band_offsets=band_offsets,
        offs=offs_u,
        shape=(nloc, next_),
        tile=Tr,
        window=W_u,
        nnz=max(c.nnz for c in shards),
        far_nnz=far_u,
        halo=halo,
        nloc=nloc,
        n=n,
        n_logical=n_logical,
    )


def _shard_container(plan: WindowedShardPlan, arrs) -> WindowedELL:
    """Rebuild this shard's WindowedELL from the traced per-shard slices
    (leading shard axis already split by in_specs)."""
    data, lanes, starts, fr, fc, fv = arrs
    return WindowedELL(
        data=data[0],
        lanes=lanes[0],
        starts=starts[0],
        far_rows=fr[0],
        far_cols=fc[0],
        far_vals=fv[0],
        offs=plan.offs,
        shape=plan.shape,
        tile=plan.tile,
        window=plan.window,
        nnz=plan.nnz,
        far_nnz=plan.far_nnz,
    )


def windowed_spmm_halo_t(
    plan: WindowedShardPlan,
    op: WindowedELL,
    x_local: jax.Array,
    axis: str = ROW_AXIS,
    interpret: bool = False,
    bnd: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """Local rows of ``(A @ X)^T`` for the row-sharded general operand.
    x_local: (m, nloc).

    With ``bnd`` (this shard's dense boundary blocks): OVERLAPPED form —
    the ppermute is issued first, the Pallas kernel consumes ONLY local
    lanes (halo slabs zero-padded, so it has no data dependence on the
    collective and XLA's latency-hiding scheduler can run both
    concurrently), and the exchanged slabs feed two (m, halo) x
    (halo, halo) MXU matmuls that correct the first/last ``halo`` rows —
    the general-sparsity analogue of the DIA path's interior/edge split
    (``padded_spmm_halo``). Without ``bnd``: the r4 serialized order
    (exchange completes before the kernel launches)."""
    halo = plan.halo
    if halo == 0 or bnd is None:
        x_ext = halo_exchange_t(x_local, halo, axis)
        Xw = jnp.pad(x_ext, ((0, 0), (0, plan.width - x_ext.shape[1])))
        return windowed_spmm_t(op, Xw, interpret=interpret)[:, : plan.nloc]
    from jax import lax

    m, nloc = x_local.shape
    ndev = lax.axis_size(axis)
    if ndev > 1:  # launch the exchange first; the kernel never reads it
        fwd = [(i, i + 1) for i in range(ndev - 1)]
        bwd = [(i + 1, i) for i in range(ndev - 1)]
        from_left = lax.ppermute(x_local[:, -halo:], axis, fwd)
        from_right = lax.ppermute(x_local[:, :halo], axis, bwd)
    else:
        from_left = jnp.zeros((m, halo), x_local.dtype)
        from_right = jnp.zeros((m, halo), x_local.dtype)
    Xw = jnp.pad(x_local, ((0, 0), (halo, plan.width - halo - nloc)))
    Y = windowed_spmm_t(op, Xw, interpret=interpret)[:, : plan.nloc]
    A_l, A_r = bnd
    hp = jax.lax.Precision.HIGHEST  # TPU matmul defaults to bf16 inputs
    Y = Y.at[:, :halo].add(jnp.matmul(from_left, A_l.T, precision=hp))
    Y = Y.at[:, nloc - halo :].add(
        jnp.matmul(from_right, A_r.T, precision=hp)
    )
    return Y


def _shard_diag(plan: WindowedShardPlan, op: WindowedELL) -> jax.Array:
    """(nloc,) main diagonal of this shard's local block: in the extended
    column space the diagonal of local row i sits at column i + halo."""
    lane = jnp.arange(op.width, dtype=jnp.int32)
    on = (op._cols_abs() == (lane + plan.halo)[None, :]) & (op.data != 0)
    diag = jnp.sum(jnp.where(on, op.data, 0), axis=0)
    if plan.far_nnz:
        hit = (op.far_cols == op.far_rows + plan.halo) & (op.far_vals != 0)
        diag = diag.at[op.far_rows].add(jnp.where(hit, op.far_vals, 0))
    valid = lane < plan.nloc
    return jnp.where(valid, diag, jnp.asarray(1.0, op.dtype))[: plan.nloc]


def _q0_general(seed, plan, m, dtype, mesh, axis):
    """Sharded transposed start block: random over the LOGICAL rows, pad
    lanes exactly zero (the decoupled-pad-row invariant — sharded.py
    ``_random_q0_t``)."""
    from dune_eigensolver_tpu.solvers.standard import random_multivector_t

    Q0 = random_multivector_t(jax.random.PRNGKey(seed), plan.rows, m, dtype)
    if plan.n != plan.rows:
        Q0 = jnp.pad(Q0, ((0, 0), (0, plan.n - plan.rows)))
    return jax.device_put(Q0, NamedSharding(mesh, P(None, axis)))


_N_PLAN_ARRS = 8


def _plan_arrays(plan):
    return (plan.data, plan.lanes, plan.starts, plan.far_rows,
            plan.far_cols, plan.far_vals, plan.bnd_left, plan.bnd_right)


def _plan_specs(axis):
    return (
        tuple(P(axis, *(None,) * 2) for _ in range(2))
        + tuple(P(axis, None) for _ in range(4))
        + tuple(P(axis, *(None,) * 2) for _ in range(2))
    )


def _shard_bnd(plan: WindowedShardPlan, arrs):
    """This shard's dense boundary blocks, or None when overlap is
    unavailable (halo == 0 or past ``_BND_DENSE_CAP``)."""
    bl, br = arrs[6], arrs[7]
    if bl.shape[-1] == 0 or plan.halo == 0:
        return None
    return (bl[0], br[0])


def largest_operator(A, shift: float = 0.0):
    """The (shifted) operator ``sharded_standard_largest_general`` plans:
    prebuild its plan once with ``windowed_shard_plan(largest_operator(A,
    shift), P)`` and pass it as ``plan=`` to amortize host planning +
    device upload across repeated solves (measured ~1 s/call at n=20k on
    the tunneled chip vs a ~40 ms solver loop)."""
    S = _to_scipy(A)
    if shift != 0.0:
        import scipy.sparse as sp

        S = (S + shift * sp.eye(S.shape[0], dtype=S.dtype)).tocsr()
    return S


def pencil_operator(A, B, shift: float = 0.0, reg: float = 0.0):
    """The shift-folded pencil operator the generalized/lobpcg general
    drivers plan (A + shift*B + reg*I); see ``largest_operator``."""
    import scipy.sparse as sp

    S = _to_scipy(A)
    Sb = None if B is None else _to_scipy(B)
    n = S.shape[0]
    if shift != 0.0:
        S = S + shift * (sp.eye(n, dtype=S.dtype) if Sb is None else Sb)
    if reg != 0.0:
        S = S + reg * sp.eye(n, dtype=S.dtype)
    return S.tocsr()


def sharded_standard_largest_general(
    A,
    nev: int,
    tol: float,
    maxiter: int,
    shift: float = 0.0,
    mesh: Optional[Mesh] = None,
    block: int = 8,
    seed: int = 123,
    ortho_iterations: int = 1,
    rayleigh_ritz: bool = False,
    axis: str = ROW_AXIS,
    tile: int = 2048,
    plan: Optional[WindowedShardPlan] = None,
):
    """Multi-chip ``standard_largest`` on a GENERAL (ELL/BSR/scipy)
    operand through the windowed-gather kernel. Same semantics as the DIA
    driver; ``shift`` is applied host-side into the plan. ``plan``: a
    prebuilt ``windowed_shard_plan(largest_operator(A, shift), ndev)`` —
    after its first use the plan's arrays are device-resident, so repeated
    solves skip the host re-plan + re-upload (the dominant per-solve cost
    on small operands, experiments/dist_win_attrib.py)."""
    from dune_eigensolver_tpu.solvers.standard import (
        _largest_core,
        padded_width,
    )

    mesh = mesh or make_mesh(axis=axis)
    ndev = int(mesh.shape[axis])
    m = padded_width(nev, block)
    if plan is None:
        # plans memoized on the operand's identity (weakref-evicted —
        # engine.memoized_setup): re-solving the same operand must not
        # re-plan host-side and re-upload the plan arrays (m is excluded
        # from the key: plans are m-independent since the m-tiling rework)
        from dune_eigensolver_tpu.solvers.engine import memoized_setup

        plan = memoized_setup(
            (A,),
            ("win_plan_largest", ndev, int(tile), float(shift)),
            lambda: windowed_shard_plan(
                largest_operator(A, shift), ndev, tile=tile, m=m
            ),
        )
    if plan.nloc * ndev != plan.n:
        raise ValueError("plan does not match the mesh size")
    n = plan.n
    interpret = not _on_tpu()
    op_dtype = np.dtype(plan.data.dtype)
    Q0 = _q0_general(seed, plan, m, op_dtype, mesh, axis)
    reduce_ = psum_reduce(axis)

    def local_solver(q0, *arrs):
        op = _shard_container(plan, arrs[:6])
        bnd = _shard_bnd(plan, arrs)
        apply_a = lambda X: windowed_spmm_halo_t(  # noqa: E731
            plan, op, X, axis=axis, interpret=interpret, bnd=bnd
        )
        cfg = (
            nev, float(tol), int(maxiter), float(shift), int(block),
            int(ortho_iterations), bool(rayleigh_ritz), int(n),
            jnp.dtype(op_dtype),
        )
        return _largest_core(None, q0, (apply_a, reduce_), cfg)

    key = (
        "largest_general", _mesh_key(mesh), axis, interpret, plan.offs, plan.shape,
        plan.tile, plan.window, plan.far_nnz, nev, float(tol),
        int(maxiter), float(shift), int(block), int(ortho_iterations),
        bool(rayleigh_ritz), str(op_dtype), m,
    )
    fn = _cached_program(
        key,
        lambda: jax.jit(
            jax.shard_map(
                local_solver,
                mesh=mesh,
                in_specs=(P(None, axis),) + _plan_specs(axis),
                out_specs=_result_specs(axis),
                check_vma=False,
            )
        ),
    )
    return _slice_result(fn(Q0, *_plan_arrays(plan)), plan.rows)


def sharded_lobpcg_general(
    A,
    B=None,
    nev: int = 8,
    tol: float = 2e-3,
    maxiter: int = 200,
    shift: float = 1e-3,
    reg: float = 0.0,
    mesh: Optional[Mesh] = None,
    block: int = 8,
    seed: int = 123,
    min_iter: int = 3,
    ortho_eps: float = 1e-9,
    cg_rtol: float = 1e-2,
    cg_maxiter: int = 50,
    axis: str = ROW_AXIS,
    tile: int = 2048,
    ortho_block=None,
    plans: Optional[Tuple] = None,
    precond: str = "cg",
):
    """Multi-chip preconditioned LOBPCG (smallest eigenpairs) on a GENERAL
    operand pair. ``B=None`` means the identity pencil (standard problem);
    otherwise B is planned onto the same sharding and applied through the
    windowed kernel too. Preconditioner (``precond``): 'cg' = per-shard
    Jacobi-CG on the shifted operator (loose, matrix-free); 'schwarz' =
    ONE exact per-shard banded block solve per apply (the additive-Schwarz
    approximate inverse — LOBPCG only needs a search direction, so the CG
    wrapper the shift-invert drivers use is unnecessary here; auto-falls
    back to 'cg' past the device bandwidth ceiling). Gram reductions psum
    over the mesh. ``plans``: prebuilt ``(plan_a, plan_b)`` — plan_a over
    ``pencil_operator(A, B, shift, reg)`` with ``m=3*padded_width(nev)``
    (and ``local_band=True`` for 'schwarz'), plan_b over B with
    ``diag_fill=0.0`` (or None for the identity pencil); reuse amortizes
    host planning + upload across solves."""
    from dune_eigensolver_tpu.factorize.cg import cg_solve_t
    from dune_eigensolver_tpu.solvers.lobpcg import _lobpcg_core
    from dune_eigensolver_tpu.solvers.standard import padded_width

    if precond not in ("cg", "schwarz"):
        raise ValueError(f"unknown precond {precond!r} (cg|schwarz)")
    mesh = mesh or make_mesh(axis=axis)
    ndev = int(mesh.shape[axis])
    m = padded_width(nev, block)
    if plans is not None:
        plan_a, plan_b = plans
    else:
        # plans memoized on the operand identities (weakref-evicted):
        # re-solving the same pencil must not re-plan host-side and
        # re-upload — with local_band the band alone is O(bw * nloc)
        # (151 MB / ~56 s per call at n=20k through the tunnel)
        from dune_eigensolver_tpu.solvers.engine import memoized_setup

        def _build_plans():
            S_op = pencil_operator(A, B, shift, reg)
            pa = windowed_shard_plan(
                S_op, ndev, tile=tile, m=3 * m,
                local_band=(precond == "schwarz"),
            )
            pb = (
                None
                if B is None
                else windowed_shard_plan(
                    _to_scipy(B), ndev, tile=tile, m=3 * m, diag_fill=0.0
                )
            )
            return pa, pb

        plan_a, plan_b = memoized_setup(
            (A,) if B is None else (A, B),
            ("win_plan_lobpcg", ndev, int(tile), float(shift), float(reg),
             precond),
            _build_plans,
        )
    if precond == "schwarz" and not plan_a.band_offsets:
        precond = "cg"  # plan already warned (bandwidth > device ceiling)
    interpret = not _on_tpu()
    n = plan_a.n  # padded global rows (pad lanes stay exactly zero)
    op_dtype = np.dtype(plan_a.data.dtype)
    Q0 = _q0_general(seed, plan_a, m, op_dtype, mesh, axis)
    reduce_ = psum_reduce(axis)

    def local_solver(q0, *arrs):
        op_a = _shard_container(plan_a, arrs[:6])
        bnd_a = _shard_bnd(plan_a, arrs)
        apply_a = lambda X: windowed_spmm_halo_t(  # noqa: E731
            plan_a, op_a, X, axis=axis, interpret=interpret, bnd=bnd_a
        )
        if plan_b is None:
            apply_b = lambda X: X  # noqa: E731
        else:
            arrs_b = arrs[_N_PLAN_ARRS:]
            op_b = _shard_container(plan_b, arrs_b[:6])
            bnd_b = _shard_bnd(plan_b, arrs_b)
            apply_b = lambda X: windowed_spmm_halo_t(  # noqa: E731
                plan_b, op_b, X, axis=axis, interpret=interpret, bnd=bnd_b
            )
        inv_diag = 1.0 / _shard_diag(plan_a, op_a)

        if precond == "schwarz":
            from dune_eigensolver_tpu.factorize.banded import (
                banded_solve,
                factorize_banded_device,
            )
            from dune_eigensolver_tpu.sparse.formats import DIAMatrix

            nb = _N_PLAN_ARRS * (1 if plan_b is None else 2)
            blk = DIAMatrix(
                data=arrs[nb][0],
                offsets=plan_a.band_offsets,
                shape=(plan_a.nloc, plan_a.nloc),
            )
            F = factorize_banded_device(blk)

            def prec_fn(_aux, X):  # one exact local block solve per apply
                return banded_solve(F, X.T).T

        else:

            def prec_fn(_aux, X):
                Y, _ = cg_solve_t(
                    apply_a, X, inv_diag=inv_diag, rtol=cg_rtol,
                    maxiter=cg_maxiter, gram_reduce=reduce_,
                )
                return Y

        cfg = (
            nev, float(tol), int(maxiter), float(shift), int(block),
            int(min_iter), float(ortho_eps), int(n),
            jnp.dtype(op_dtype), 2, ortho_block,
        )
        hooks = (apply_a, apply_b, reduce_, prec_fn)
        return _lobpcg_core(None, None, None, q0, hooks, cfg)

    key = (
        "lobpcg_general", _mesh_key(mesh), axis, interpret, plan_a.offs, plan_a.shape,
        plan_a.tile, plan_a.window, plan_a.far_nnz,
        # plan_b.shape/tile pin halo_b, baked statically into the traced
        # halo exchange (ADVICE r4: identical offs/window/far_nnz with a
        # different halo must not reuse the program)
        None if plan_b is None else (plan_b.offs, plan_b.shape, plan_b.tile,
                                     plan_b.window, plan_b.far_nnz),
        nev, float(tol), int(maxiter), float(shift), float(reg), int(block),
        int(min_iter), float(ortho_eps), float(cg_rtol), int(cg_maxiter),
        ortho_block, str(op_dtype), m,
        precond, plan_a.band_offsets,
    )
    b_arrs = () if plan_b is None else _plan_arrays(plan_b)
    if precond == "schwarz":
        b_arrs = b_arrs + (plan_a.band_data,)
    fn = _cached_program(
        key,
        lambda: jax.jit(
            jax.shard_map(
                local_solver,
                mesh=mesh,
                in_specs=(P(None, axis),)
                + _plan_specs(axis)
                + (_plan_specs(axis) if plan_b is not None else ())
                + ((P(axis, None, None),) if precond == "schwarz" else ()),
                out_specs=_result_specs(axis),
                check_vma=False,
            )
        ),
    )
    return _slice_result(fn(Q0, *_plan_arrays(plan_a), *b_arrs), plan_a.rows)


def sharded_generalized_inverse_general(
    A,
    B,
    nev: int,
    tol: float,
    maxiter: int,
    shift: float = 0.0,
    reg: float = 0.0,
    mesh: Optional[Mesh] = None,
    block: int = 8,
    seed: int = 123,
    min_iter: int = 10,
    ortho_iterations: int = 1,
    rayleigh_ritz: bool = False,
    cg_rtol: float = 1e-6,
    cg_maxiter: int = 2000,
    axis: str = ROW_AXIS,
    tile: int = 2048,
    inner: str = "schwarz",
    plans: Optional[Tuple] = None,
):
    """Multi-chip ``generalized_inverse`` (shift-invert subspace iteration)
    on a GENERAL operand pair through the windowed kernel. ``plans``:
    prebuilt ``(plan_a, plan_b)`` — plan_a over ``pencil_operator(A, B,
    shift, reg)`` (with ``local_band=True`` for ``inner='schwarz'``),
    plan_b over B with ``diag_fill=0.0``; reuse amortizes host planning +
    device upload across solves.

    ``inner='schwarz'`` (default): the global CG on the shifted operator is
    preconditioned by EXACT per-shard banded block solves — post-RCM
    general patterns have bounded bandwidth, so each shard's diagonal block
    factorizes on the device block-banded engine (factorize/banded.py),
    matching the DIA drivers (sharded.schwarz_inverse_t; r4's general path
    only had Jacobi-CG, VERDICT r4 Missing #5). Auto-downgrades to
    ``inner='cg'`` (plain Jacobi-CG) with a loud FALLBACK when the
    bandwidth exceeds the device engine's ceiling."""
    from dune_eigensolver_tpu.factorize.cg import cg_solve_t
    from dune_eigensolver_tpu.solvers.generalized import _gen_core
    from dune_eigensolver_tpu.solvers.standard import padded_width

    if inner not in ("schwarz", "cg"):
        raise ValueError(f"unknown inner engine {inner!r} (schwarz|cg)")
    mesh = mesh or make_mesh(axis=axis)
    ndev = int(mesh.shape[axis])
    m = padded_width(nev, block)
    if plans is not None:
        plan_a, plan_b = plans
    else:
        # plans memoized on the operand identities (see lobpcg above)
        from dune_eigensolver_tpu.solvers.engine import memoized_setup

        def _build_plans():
            S_op = pencil_operator(A, B, shift, reg)
            pa = windowed_shard_plan(
                S_op, ndev, tile=tile, m=m,
                local_band=(inner == "schwarz"),
            )
            pb = windowed_shard_plan(
                _to_scipy(B), ndev, tile=tile, m=m, diag_fill=0.0
            )
            return pa, pb

        plan_a, plan_b = memoized_setup(
            (A, B),
            ("win_plan_gen", ndev, int(tile), float(shift), float(reg),
             inner),
            _build_plans,
        )
    if inner == "schwarz" and not plan_a.band_offsets:
        inner = "cg"  # plan already warned (bandwidth > device ceiling)
    interpret = not _on_tpu()
    n = plan_a.n  # padded global rows (pad lanes stay exactly zero)
    op_dtype = np.dtype(plan_a.data.dtype)
    Q0 = _q0_general(seed, plan_a, m, op_dtype, mesh, axis)
    reduce_ = psum_reduce(axis)

    def local_solver(q0, *arrs):
        arrs_b = arrs[_N_PLAN_ARRS : 2 * _N_PLAN_ARRS]
        op_a = _shard_container(plan_a, arrs[:6])
        op_b = _shard_container(plan_b, arrs_b[:6])
        bnd_a = _shard_bnd(plan_a, arrs)
        bnd_b = _shard_bnd(plan_b, arrs_b)
        apply_a = lambda X: windowed_spmm_halo_t(  # noqa: E731
            plan_a, op_a, X, axis=axis, interpret=interpret, bnd=bnd_a
        )
        apply_b = lambda X: windowed_spmm_halo_t(  # noqa: E731
            plan_b, op_b, X, axis=axis, interpret=interpret, bnd=bnd_b
        )
        inv_diag = 1.0 / _shard_diag(plan_a, op_a)

        if inner == "schwarz":
            from dune_eigensolver_tpu.factorize.banded import (
                banded_solve,
                factorize_banded_device,
            )
            from dune_eigensolver_tpu.sparse.formats import DIAMatrix

            blk = DIAMatrix(
                data=arrs[2 * _N_PLAN_ARRS][0],
                offsets=plan_a.band_offsets,
                shape=(plan_a.nloc, plan_a.nloc),
            )
            F = factorize_banded_device(blk)

            def precond(R):  # exact per-shard banded block solve
                return banded_solve(F, R.T).T

            if ndev == 1:
                # the local block IS the global operator: the Schwarz
                # preconditioner is exact and the CG wrapper would burn
                # >= 2 banded solves per apply verifying it (the r4 1.56x
                # sharded-generalized gap — TPU_GEN_ATTRIB_r05.log)
                def inv_fn(_aux, X):
                    return precond(X)

            else:

                def inv_fn(_aux, X):
                    Y, _ = cg_solve_t(
                        apply_a, X, rtol=cg_rtol, maxiter=cg_maxiter,
                        gram_reduce=reduce_, precond_apply=precond,
                    )
                    return Y

        else:

            def inv_fn(_aux, X):
                Y, _ = cg_solve_t(
                    apply_a, X, inv_diag=inv_diag, rtol=cg_rtol,
                    maxiter=cg_maxiter, gram_reduce=reduce_,
                )
                return Y

        cfg = (
            nev, float(tol), int(maxiter), float(shift), int(block),
            int(min_iter), int(ortho_iterations), bool(rayleigh_ritz),
            int(n), jnp.dtype(op_dtype),
        )
        hooks = (apply_a, apply_b, reduce_, inv_fn)
        return _gen_core(None, None, None, q0, hooks, cfg)

    key = (
        "generalized_general", _mesh_key(mesh), axis, interpret,
        plan_a.offs, plan_a.shape, plan_a.tile, plan_a.window,
        # plan_b.shape/tile pin halo_b (ADVICE r4), like the lobpcg key
        plan_a.far_nnz, plan_b.offs, plan_b.shape, plan_b.tile,
        plan_b.window, plan_b.far_nnz, nev,
        float(tol), int(maxiter), float(shift), float(reg), int(block),
        int(min_iter), int(ortho_iterations), bool(rayleigh_ritz),
        float(cg_rtol), int(cg_maxiter), str(op_dtype), m,
        inner, plan_a.band_offsets,
    )
    band_args = (plan_a.band_data,) if inner == "schwarz" else ()
    band_specs = (
        (P(axis, None, None),) if inner == "schwarz" else ()
    )
    fn = _cached_program(
        key,
        lambda: jax.jit(
            jax.shard_map(
                local_solver,
                mesh=mesh,
                in_specs=(P(None, axis),)
                + _plan_specs(axis)
                + _plan_specs(axis)
                + band_specs,
                out_specs=_result_specs(axis),
                check_vma=False,
            )
        ),
    )
    return _slice_result(
        fn(Q0, *_plan_arrays(plan_a), *_plan_arrays(plan_b), *band_args),
        plan_a.rows,
    )
