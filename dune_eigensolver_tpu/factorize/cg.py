"""Matrix-free multi-RHS conjugate-gradient inverse application.

The reference applies ``A'^-1`` through an externalized UMFPACK LU
factorization (umfpacktools.hh + kernels_cpp.hh:660-755). A sparse triangular
solve is row-sequential and fights the TPU's wide-vector model (SURVEY.md §7
"hard parts"), so the TPU-native default for SPD shifted operators is an
inner Krylov solve: Jacobi-preconditioned CG run simultaneously on all m
right-hand sides (per-column step lengths), entirely under ``jit`` with
``lax.while_loop``. Inverse iteration tolerates inexact inverse applications,
so ``rtol`` can be far looser than the eigensolver tolerance.

The level-scheduled direct solve (host_lu.py) remains available as the
correctness-spec alternative.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from dune_eigensolver_tpu.sparse.spmm import spmm


def cg_solve(
    apply_a: Callable,
    B: jax.Array,
    diag: Optional[jax.Array] = None,
    rtol: float = 1e-6,
    maxiter: int = 1000,
    gram_reduce: Optional[Callable] = None,
    x0: Optional[jax.Array] = None,
):
    """Solve ``A X = B`` for SPD A, all columns simultaneously.

    apply_a: X -> A @ X. diag: diagonal of A for Jacobi preconditioning.
    gram_reduce: allreduce for row-sharded operands (dots become psums).
    Returns (X, iterations).
    """
    reduce_ = gram_reduce or (lambda g: g)
    inv_diag = None if diag is None else 1.0 / diag

    def precond(R):
        return R if inv_diag is None else R * inv_diag[:, None]

    def coldot(U, V):
        return reduce_(jnp.sum(U * V, axis=0))

    X = jnp.zeros_like(B) if x0 is None else x0
    R = B - apply_a(X) if x0 is not None else B
    Z = precond(R)
    P = Z
    rz = coldot(R, Z)
    bnorm = jnp.sqrt(coldot(B, B))
    # columns with zero rhs are converged by definition
    target = rtol * jnp.where(bnorm > 0, bnorm, 1.0)

    def cond(state):
        X, R, P, rz, k = state
        rnorm = jnp.sqrt(coldot(R, R))
        return (k < maxiter) & jnp.any(rnorm > target)

    def body(state):
        X, R, P, rz, k = state
        AP = apply_a(P)
        pap = coldot(P, AP)
        alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
        X = X + P * alpha[None, :]
        R = R - AP * alpha[None, :]
        Z = precond(R)
        rz_new = coldot(R, Z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        P = Z + P * beta[None, :]
        return X, R, P, rz_new, k + 1

    X, R, P, rz, k = lax.while_loop(
        cond, body, (X, R, P, rz, jnp.zeros((), jnp.int32))
    )
    return X, k


def cg_inverse_factory(
    rtol: float = 1e-6,
    maxiter: int = 1000,
    gram_reduce: Optional[Callable] = None,
    apply_a: Optional[Callable] = None,
):
    """Factory of factories: returns an ``inverse=`` argument for the solvers.

    ``inverse(A_shifted)`` yields a jittable ``X -> A_shifted^-1 X``.
    ``apply_a`` overrides the operator application (e.g. a sharded SpMM).
    """

    def inverse(A_sh):
        if apply_a is not None:
            # caller-supplied operator (e.g. sharded SpMM closing over local
            # shards inside shard_map): keep the plain-callable convention
            diag = A_sh.diagonal() if hasattr(A_sh, "diagonal") else None

            def solve(X):
                Y, _ = cg_solve(
                    apply_a, X, diag=diag, rtol=rtol, maxiter=maxiter,
                    gram_reduce=gram_reduce,
                )
                return Y

            return solve

        # closure-free pair: the operand is threaded through jit as an
        # argument (a closure would serialize it into every compile RPC),
        # and the solve fn is memoized so the solver cores' jit caches
        # (keyed on the fn's identity) hit across factory calls
        diag = A_sh.diagonal() if hasattr(A_sh, "diagonal") else None
        return (A_sh, diag), _cg_solve_fn(rtol, maxiter, gram_reduce)

    return inverse


_CG_SOLVE_FNS = {}


def _cg_solve_fn(rtol, maxiter, gram_reduce):
    key = (float(rtol), int(maxiter), id(gram_reduce) if gram_reduce else None)
    if key not in _CG_SOLVE_FNS:

        def solve_pair(aux, X, _rtol=rtol, _maxiter=maxiter, _gr=gram_reduce):
            A_, d_ = aux
            Y, _ = cg_solve(
                lambda V: spmm(A_, V), X, diag=d_, rtol=_rtol,
                maxiter=_maxiter, gram_reduce=_gr,
            )
            return Y

        _CG_SOLVE_FNS[key] = solve_pair
    return _CG_SOLVE_FNS[key]
