"""Row-partitioned multi-chip execution: halo-exchange SpMM, allreduce
orthogonalization, and sharded solver drivers.

This is the distributed layer the reference deliberately does not have (MPI
startup is commented out with "DO NOT INITIALIZE MPI", src/
dune-eigensolver.cc:742-748; its only concurrency is benchmark-replica
threads). TPU-natively:

* the matrix (DIA) and multivector rows are sharded over a 1D mesh axis;
  every shard holds the TRANSPOSED local block (m, nloc) — matrix rows on
  the lane dimension, the same layout the single-chip Pallas kernel streams;
* SpMM needs off-shard X rows up to the bandwidth: neighbors exchange halo
  slabs via ``lax.ppermute`` (non-cyclic, so edge shards receive zeros —
  exactly the Dirichlet zero-padding the local kernel expects), overlapping
  with the local diagonal contributions;
* every Gram matrix / dot product / convergence reduction becomes one
  ``lax.psum`` (the ``gram_reduce`` hook threaded through ops/ and solvers/);
* the entire solver while-loop runs inside one ``shard_map``, so an N-chip
  solve is a single XLA computation with ICI collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dune_eigensolver_tpu.dist.mesh import ROW_AXIS, make_mesh
from dune_eigensolver_tpu.sparse.formats import DIAMatrix


def halo_exchange_t(x_local: jax.Array, halo: int, axis: str = ROW_AXIS):
    """Gather ``halo`` boundary lanes from each neighbor.

    x_local: (m, nloc). Returns x_ext of shape (m, halo + nloc + halo).
    Edge shards get zeros in the missing direction (lax.ppermute
    semantics), matching the zero padding of the single-chip DIA SpMM.
    """
    ndev = lax.axis_size(axis)
    if ndev == 1:
        pad = jnp.zeros(x_local.shape[:1] + (halo,), x_local.dtype)
        return jnp.concatenate([pad, x_local, pad], axis=1)
    fwd = [(i, i + 1) for i in range(ndev - 1)]  # my top rows -> right's left halo
    bwd = [(i + 1, i) for i in range(ndev - 1)]
    from_left = lax.ppermute(x_local[:, -halo:], axis, fwd)
    from_right = lax.ppermute(x_local[:, :halo], axis, bwd)
    return jnp.concatenate([from_left, x_local, from_right], axis=1)


def dia_spmm_halo_t(
    data_local: jax.Array,
    offsets: tuple,
    x_local: jax.Array,
    axis: str = ROW_AXIS,
) -> jax.Array:
    """Local rows of ``(A @ X)^T`` for a row-sharded DIA matrix, structured
    for communication/compute overlap. Transposed layout throughout.

    data_local: (ndiag, nloc) — this shard's rows of every diagonal.
    x_local: (m, nloc). Requires halo = max|offset| <= nloc.

    The interior FMA sweep consumes only local lanes (halo positions read
    zero padding), so it has no data dependence on the ``ppermute`` results;
    XLA's latency-hiding scheduler can run the collective concurrently.
    Only the O(halo) edge-correction lanes wait on the neighbors.
    """
    m, nloc = x_local.shape
    halo = max((abs(o) for o in offsets), default=0)
    if halo > nloc:
        raise ValueError(
            f"dia_spmm_halo_t: bandwidth {halo} exceeds local rows {nloc}; "
            "use fewer shards or a wider partition"
        )
    if halo == 0:
        return data_local[0][None, :] * x_local

    ndev = lax.axis_size(axis)
    if ndev > 1:  # launch the exchange first; nothing below consumes it yet
        fwd = [(i, i + 1) for i in range(ndev - 1)]
        bwd = [(i + 1, i) for i in range(ndev - 1)]
        from_left = lax.ppermute(x_local[:, -halo:], axis, fwd)
        from_right = lax.ppermute(x_local[:, :halo], axis, bwd)

    # interior sweep on zero-padded local lanes (overlappable with the halos)
    Xp = jnp.pad(x_local, ((0, 0), (halo, halo)))
    acc = jnp.zeros_like(x_local)
    for d, off in enumerate(offsets):
        shifted = lax.slice(Xp, (0, halo + off), (m, halo + off + nloc))
        acc = acc + data_local[d][None, :] * shifted

    if ndev > 1:
        # edge corrections: the first/last |off| lanes of each off-diagonal
        # read neighbor lanes. All slices are static.
        for d, off in enumerate(offsets):
            if off < 0:
                acc = acc.at[:, :-off].add(
                    data_local[d][None, :-off] * from_left[:, halo + off :]
                )
            elif off > 0:
                acc = acc.at[:, nloc - off :].add(
                    data_local[d][None, nloc - off :] * from_right[:, :off]
                )
    return acc


def halo_exchange(x_local: jax.Array, halo: int, axis: str = ROW_AXIS):
    """Column-layout wrapper over ``halo_exchange_t`` (x_local (nloc, m))."""
    return halo_exchange_t(x_local.T, halo, axis).T


def dia_spmm_halo(
    data_local: jax.Array,
    offsets: tuple,
    x_local: jax.Array,
    axis: str = ROW_AXIS,
) -> jax.Array:
    """Column-layout wrapper over ``dia_spmm_halo_t`` (x_local (nloc, m))."""
    return dia_spmm_halo_t(data_local, offsets, x_local.T, axis).T


def psum_reduce(axis: str = ROW_AXIS):
    return lambda g: lax.psum(g, axis)


def local_diag_block(data_local: jax.Array, offsets: tuple) -> jax.Array:
    """Zero the cross-shard couplings of a row-sharded DIA block: entry
    (i_loc, i_loc + off) belongs to the shard's diagonal block iff the
    column is local. Purely local — no global index needed."""
    nloc = data_local.shape[1]
    i = jnp.arange(nloc)
    out = []
    for d, off in enumerate(offsets):
        valid = (i + off >= 0) & (i + off < nloc)
        out.append(jnp.where(valid, data_local[d], 0.0))
    return jnp.stack(out)


def schwarz_inverse_t(
    data_local: jax.Array,
    offsets: tuple,
    apply_a,
    gram_reduce,
    rtol: float = 1e-6,
    maxiter: int = 200,
    C: int = 256,
):
    """Additive-Schwarz (non-overlapping block-Jacobi) inverse for the
    sharded solvers: each shard factorizes ITS diagonal band block with the
    device block-banded engine (factorize/banded.py) and the global CG uses
    the exact local solves as its (fixed, SPD) preconditioner — the TPU
    analogue of domain decomposition, and the distributed replacement for
    the reference's global direct factorization (umfpacktools.hh:16-220).
    Convergence then depends on the subdomain coupling, not the local
    condition number: measured on the 8-device CPU mesh (2D Laplacian,
    rtol 1e-8), the inner iteration count drops ~2.4x vs plain Jacobi-CG
    (tests/test_dist.py) — and each Schwarz iteration's banded scan is
    local MXU work instead of extra global reduction rounds.

    Built INSIDE shard_map: the factorization itself is jitted device code,
    so it fuses into the same XLA computation as the solve. Returns a
    transposed-layout solve callable (marked ``layout_t``).
    """
    from dune_eigensolver_tpu.factorize.banded import (
        banded_solve,
        factorize_banded_device,
    )
    from dune_eigensolver_tpu.factorize.cg import cg_solve_t

    nloc = data_local.shape[1]
    blk = local_diag_block(data_local, offsets)
    A_blk = DIAMatrix(data=blk, offsets=offsets, shape=(nloc, nloc))
    F = factorize_banded_device(A_blk, C=C)

    def precond(R):  # (m, nloc) -> (m, nloc), exact local block solve
        return banded_solve(F, R.T).T

    def solve(X):
        Y, _ = cg_solve_t(
            apply_a,
            X,
            rtol=rtol,
            maxiter=maxiter,
            gram_reduce=gram_reduce,
            precond_apply=precond,
        )
        return Y

    solve.layout_t = True
    return solve


def _shard_dia(A: DIAMatrix, mesh: Mesh, axis: str) -> DIAMatrix:
    data = jax.device_put(A.data, NamedSharding(mesh, P(None, axis)))
    return DIAMatrix(data=data, offsets=A.offsets, shape=A.shape)


def _check_divisible(n: int, mesh: Mesh):
    ndev = mesh.devices.size
    if n % ndev != 0:
        raise ValueError(f"row count {n} not divisible by mesh size {ndev}")


def _random_q0_t(seed, n, m, mesh, axis, dtype):
    """Transposed start block sharded over lanes: (m, n) with rows split."""
    from dune_eigensolver_tpu.solvers.standard import random_multivector_t

    Q0 = random_multivector_t(jax.random.PRNGKey(seed), n, m, dtype)
    return jax.device_put(Q0, NamedSharding(mesh, P(None, axis)))


def sharded_standard_largest(
    A: DIAMatrix,
    nev: int,
    tol: float,
    maxiter: int,
    shift: float = 0.0,
    mesh: Optional[Mesh] = None,
    block: int = 8,
    seed: int = 123,
    ortho_iterations: int = 1,
    axis: str = ROW_AXIS,
):
    """Multi-chip standard_largest: same semantics, rows sharded over mesh."""
    from dune_eigensolver_tpu.solvers.standard import (
        padded_width,
        standard_largest,
    )

    mesh = mesh or make_mesh(axis=axis)
    n = A.shape[0]
    _check_divisible(n, mesh)
    A_sh = A.with_shifted_diagonal(shift) if shift != 0.0 else A
    A_sh = _shard_dia(A_sh, mesh, axis)
    m = padded_width(nev, block)
    Q0 = _random_q0_t(seed, n, m, mesh, axis, A.dtype)

    def local_solver(adata, q0):
        apply_a = partial(dia_spmm_halo_t, adata, A.offsets, axis=axis)
        res = standard_largest(
            _LocalOperand(adata, A.offsets, A.shape, q0.dtype),
            nev,
            tol,
            maxiter,
            shift=shift,
            block=block,
            seed=seed,
            ortho_iterations=ortho_iterations,
            apply_a=apply_a,
            gram_reduce=psum_reduce(axis),
            q0=q0,
        )
        return res

    fn = jax.jit(
        jax.shard_map(
            local_solver,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, axis)),
            out_specs=_result_specs(axis),
        )
    )
    return fn(A_sh.data, Q0)


def sharded_standard_inverse(
    A: DIAMatrix,
    nev: int,
    tol: float,
    maxiter: int,
    shift: float = 0.0,
    mesh: Optional[Mesh] = None,
    block: int = 8,
    seed: int = 123,
    ortho_iterations: int = 1,
    cg_rtol: float = 1e-6,
    cg_maxiter: int = 2000,
    axis: str = ROW_AXIS,
    inner: str = "schwarz",
):
    """Multi-chip standard_inverse: smallest eigenpairs via shift-invert.

    ``inner``: the distributed inverse engine. 'schwarz' (default) runs the
    global CG preconditioned by exact per-shard banded block solves
    (additive Schwarz — see ``schwarz_inverse_t``); 'cg' is plain
    Jacobi-CG. The single-chip global direct solve cannot shard (its block
    recursion is sequential across shards), but its per-shard restriction
    can — that is exactly the Schwarz preconditioner."""
    from dune_eigensolver_tpu.factorize.cg import cg_solve_t
    from dune_eigensolver_tpu.solvers.standard import padded_width

    mesh = mesh or make_mesh(axis=axis)
    n = A.shape[0]
    _check_divisible(n, mesh)
    inner = _pick_inner(inner, A, n // mesh.devices.size)
    A_sh = A.with_shifted_diagonal(shift) if shift != 0.0 else A
    A_shd = _shard_dia(A_sh, mesh, axis)
    m = padded_width(nev, block)
    Q0 = _random_q0_t(seed, n, m, mesh, axis, A.dtype)
    reduce_ = psum_reduce(axis)

    def local_solver(adata, q0):
        apply_a = partial(dia_spmm_halo_t, adata, A.offsets, axis=axis)
        inv_diag_local = 1.0 / adata[A.offsets.index(0)]

        if inner == "schwarz":
            solve = schwarz_inverse_t(
                adata, A.offsets, apply_a, reduce_,
                rtol=cg_rtol, maxiter=cg_maxiter,
            )

            def inv_fn(_aux, X):
                return solve(X)

        else:

            def inv_fn(_aux, X):
                Y, _ = cg_solve_t(
                    apply_a,
                    X,
                    inv_diag=inv_diag_local,
                    rtol=cg_rtol,
                    maxiter=cg_maxiter,
                    gram_reduce=reduce_,
                )
                return Y

        cfg = (
            nev,
            float(tol),
            int(maxiter),
            float(shift),
            int(block),
            int(ortho_iterations),
            jnp.dtype(A.dtype),
        )
        return _sharded_inverse_core(apply_a, inv_fn, q0, reduce_, cfg)

    fn = jax.jit(
        jax.shard_map(
            local_solver,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, axis)),
            out_specs=_result_specs(axis),
        )
    )
    return fn(A_shd.data, Q0)


def _sharded_inverse_core(apply_a, inv_fn, Q0, gram_reduce, cfg):
    """standard_inverse iteration with a caller-supplied operator
    application for the Rayleigh quotients (row-sharded SpMM needs the halo
    exchange, not a local-slice spmm). Transposed layout."""
    from functools import partial as _partial

    from dune_eigensolver_tpu.ops.ortho import (
        dot_products_diagonal_t,
        orthonormalize_blocked_t,
    )
    from dune_eigensolver_tpu.solvers.result import EigenResult, sort_result_t

    nev, tol, maxiter, shift, block, ortho_iterations, dtype = cfg
    shift_ = jnp.asarray(shift, dtype)
    m = Q0.shape[0]
    ortho = _partial(
        orthonormalize_blocked_t,
        block=block,
        gram_reduce=gram_reduce,
        iterations=ortho_iterations,
    )
    Q = ortho(Q0)

    def body(state):
        Q, s_prev, k, _ = state
        Q2 = ortho(inv_fn(None, Q))
        AQ2 = apply_a(Q2)
        s = gram_reduce(dot_products_diagonal_t(Q2, AQ2)) - shift_
        distance = jnp.max(jnp.abs(s - s_prev))
        return Q2, s, k + 1, distance

    def cond(state):
        _, _, k, distance = state
        return (k < maxiter) & ((k < 2) | (distance >= tol))

    s0 = jnp.zeros((m,), dtype)
    Q, s, k, distance = lax.while_loop(
        cond, body, (Q, s0, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, dtype))
    )
    evals, evecs_t = sort_result_t(s, Q, nev, descending=False)
    return EigenResult(
        eigenvalues=evals,
        eigenvectors=evecs_t.T,
        iterations=k,
        converged=distance < tol,
        criterion=distance,
        ortho_monitor=jnp.zeros((), dtype),
    )


def sharded_generalized_inverse(
    A: DIAMatrix,
    B: DIAMatrix,
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
    cg_rtol: float = 1e-6,
    cg_maxiter: int = 2000,
    axis: str = ROW_AXIS,
    inner: str = "schwarz",
):
    """Multi-chip generalized_inverse.

    ``inner='schwarz'`` (default): global CG preconditioned by exact
    per-shard banded block solves of the shifted operator (additive
    Schwarz, ``schwarz_inverse_t``) — the distributed stand-in for the
    reference's global direct factorization. ``inner='cg'``: plain
    Jacobi-CG (round-1 behavior)."""
    from dune_eigensolver_tpu.factorize.cg import cg_solve_t
    from dune_eigensolver_tpu.solvers.generalized import generalized_inverse
    from dune_eigensolver_tpu.solvers.standard import padded_width

    mesh = mesh or make_mesh(axis=axis)
    n = A.shape[0]
    _check_divisible(n, mesh)
    inner = _pick_inner(inner, A, n // mesh.devices.size)

    A_op = A
    if shift != 0.0:
        A_op = A_op.axpy(shift, B)
    if reg != 0.0:
        A_op = A_op.with_shifted_diagonal(reg)
    A_op = _shard_dia(A_op, mesh, axis)
    B_sh = _shard_dia(B, mesh, axis)
    m = padded_width(nev, block)
    Q0 = _random_q0_t(seed, n, m, mesh, axis, A.dtype)

    reduce_ = psum_reduce(axis)

    def local_solver(adata, bdata, q0):
        apply_a = partial(dia_spmm_halo_t, adata, A.offsets, axis=axis)
        apply_b = partial(dia_spmm_halo_t, bdata, B.offsets, axis=axis)
        inv_diag_local = 1.0 / adata[A.offsets.index(0)]

        def inverse(_unused):
            if inner == "schwarz":
                return schwarz_inverse_t(
                    adata, A.offsets, apply_a, reduce_,
                    rtol=cg_rtol, maxiter=cg_maxiter,
                )

            def solve(X):
                Y, _ = cg_solve_t(
                    apply_a,
                    X,
                    inv_diag=inv_diag_local,
                    rtol=cg_rtol,
                    maxiter=cg_maxiter,
                    gram_reduce=reduce_,
                )
                return Y

            solve.layout_t = True
            return solve

        return generalized_inverse(
            _LocalOperand(adata, A.offsets, A.shape, q0.dtype),
            _LocalOperand(bdata, B.offsets, B.shape, q0.dtype),
            nev,
            tol,
            maxiter,
            shift=0.0,  # shift/reg already folded into adata above
            reg=0.0,
            block=block,
            seed=seed,
            min_iter=min_iter,
            ortho_iterations=ortho_iterations,
            inverse=inverse,
            apply_a=apply_a,
            apply_b=apply_b,
            gram_reduce=reduce_,
            q0=q0,
            eval_shift=shift,
        )

    fn = jax.jit(
        jax.shard_map(
            local_solver,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, axis), P(None, axis)),
            out_specs=_result_specs(axis),
        )
    )
    return fn(A_op.data, B_sh.data, Q0)


def sharded_lobpcg_generalized(
    A: DIAMatrix,
    B: DIAMatrix,
    nev: int,
    tol: float,
    maxiter: int,
    shift: float = 0.0,
    reg: float = 0.0,
    mesh: Optional[Mesh] = None,
    block: int = 8,
    seed: int = 123,
    min_iter: int = 3,
    cg_rtol: float = 1e-2,
    cg_maxiter: int = 100,
    axis: str = ROW_AXIS,
):
    """Multi-chip LOBPCG on the reciprocal pencil (solvers/lobpcg.py).

    The preconditioner is a *loose* matrix-free CG on the shifted operator
    (rtol defaults to 1e-2 — LOBPCG only needs an approximate inverse, so
    the inner Krylov runs an order of magnitude shorter than the sharded
    shift-invert solvers' inner solve). All Gram reductions psum over the
    row axis; SpMMs halo-exchange over ICI.
    """
    from dune_eigensolver_tpu.factorize.cg import cg_solve_t
    from dune_eigensolver_tpu.solvers.lobpcg import lobpcg_generalized
    from dune_eigensolver_tpu.solvers.standard import padded_width

    mesh = mesh or make_mesh(axis=axis)
    n = A.shape[0]
    _check_divisible(n, mesh)

    A_op = A
    if shift != 0.0:
        A_op = A_op.axpy(shift, B)
    if reg != 0.0:
        A_op = A_op.with_shifted_diagonal(reg)
    A_op = _shard_dia(A_op, mesh, axis)
    B_sh = _shard_dia(B, mesh, axis)
    m = padded_width(nev, block)
    Q0 = _random_q0_t(seed, n, m, mesh, axis, A.dtype)
    reduce_ = psum_reduce(axis)

    def local_solver(adata, bdata, q0):
        apply_a = partial(dia_spmm_halo_t, adata, A.offsets, axis=axis)
        apply_b = partial(dia_spmm_halo_t, bdata, B.offsets, axis=axis)
        inv_diag_local = 1.0 / adata[A.offsets.index(0)]

        def precond(_unused):
            def solve(X):
                Y, _ = cg_solve_t(
                    apply_a,
                    X,
                    inv_diag=inv_diag_local,
                    rtol=cg_rtol,
                    maxiter=cg_maxiter,
                    gram_reduce=reduce_,
                )
                return Y

            solve.layout_t = True
            return solve

        return lobpcg_generalized(
            _LocalOperand(adata, A.offsets, A.shape, q0.dtype),
            _LocalOperand(bdata, B.offsets, B.shape, q0.dtype),
            nev,
            tol,
            maxiter,
            shift=0.0,  # shift/reg already folded into adata above
            reg=0.0,
            block=block,
            seed=seed,
            min_iter=min_iter,
            precond=precond,
            apply_a=apply_a,
            apply_b=apply_b,
            gram_reduce=reduce_,
            q0=q0,
            eval_shift=shift,
        )

    fn = jax.jit(
        jax.shard_map(
            local_solver,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, axis), P(None, axis)),
            out_specs=_result_specs(axis),
        )
    )
    return fn(A_op.data, B_sh.data, Q0)


def _pick_inner(inner: str, A, nloc: int) -> str:
    """Validate/auto-downgrade the distributed inverse engine: the Schwarz
    block factorization needs the band inside the shard and inside the
    device engine's block-size ceiling."""
    from dune_eigensolver_tpu.factorize.banded import _DEVICE_BW_MAX

    if inner not in ("schwarz", "cg"):
        raise ValueError(f"unknown inner engine {inner!r} (schwarz|cg)")
    if inner == "schwarz":
        bw = max((abs(o) for o in A.offsets), default=0)
        if bw > min(nloc, _DEVICE_BW_MAX):
            return "cg"
    return inner


class _LocalOperand:
    """Minimal duck-typed operand for solver internals that only need
    .shape/.dtype when apply_a/apply_b/q0 are all supplied."""

    def __init__(self, data, offsets, shape, dtype):
        self._data = data
        self.offsets = offsets
        self.shape = shape
        self.dtype = dtype

    def diagonal(self):
        return self._data[self.offsets.index(0)]


def _result_specs(axis: str):
    from dune_eigensolver_tpu.solvers.result import EigenResult

    return EigenResult(
        eigenvalues=P(),
        eigenvectors=P(axis, None),
        iterations=P(),
        converged=P(),
        criterion=P(),
        ortho_monitor=P(),
    )
