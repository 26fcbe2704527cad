"""Generalized eigenproblem solver: smallest eigenpairs of ``A x = lambda B x``
by shift-invert inverse iteration with B-orthonormalization.

Reference semantics: ``GeneralizedInverse`` (dune/eigensolver/
eigensolver.hh:204-351), the flagship solver (GenEO coarse-space setup):

  A' = A + shift*B + reg*I  (pattern(B) must be within pattern(A),
                             eigensolver.hh:241-252)
  factorize A' once; B-orthonormalize Q
  loop:  Q2 = B Q1;  Q1 = A'^-1 Q2;  B-orthonormalize Q1
         rayleigh: ra_i = (Q1^T A' Q1)_ii - shift
         relerror = max_i |ra1_i - ra2_i| / max_i ra1_i
         stop when iter > min_iter and relerror < tol

The reference's stopping test uses bitwise `&` at eigensolver.hh:323 (a bug
that still forces >= 11 iterations because of the iter>10 clause); we use the
intended logical AND with configurable ``min_iter`` defaulting to the same 10.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from dune_eigensolver_tpu.ops.ortho import (
    b_orthonormalize_blocked,
    dot_products_diagonal,
)
from dune_eigensolver_tpu.solvers.result import EigenResult, sort_result
from dune_eigensolver_tpu.solvers.standard import padded_width, random_multivector
from dune_eigensolver_tpu.sparse.spmm import spmm


def generalized_inverse(
    A,
    B,
    nev: int,
    tol: float,
    maxiter: int,
    shift: float = 0.0,
    reg: float = 0.0,
    block: int = 8,
    seed: int = 123,
    min_iter: int = 10,
    ortho_iterations: int = 1,
    inverse: Optional[Callable] = None,
    apply_a: Optional[Callable] = None,
    apply_b: Optional[Callable] = None,
    gram_reduce: Optional[Callable] = None,
    q0: Optional[jax.Array] = None,
    eval_shift: Optional[float] = None,
    dtype=None,
) -> EigenResult:
    """Smallest-nev eigenpairs of ``A x = lambda B x``.

    ``inverse``: factory mapping the shifted operator A' = A + shift*B +
    reg*I to a jittable multi-RHS solve ``X -> A'^-1 X`` (host-LU trisolve by
    default; CG for the matrix-free TPU path).

    ``apply_a``/``apply_b``/``gram_reduce``/``q0`` let the distributed layer
    inject halo-exchange SpMMs, a psum, and a pre-sharded start block. When a
    caller pre-folds the shift into ``apply_a`` (sharded path), pass
    ``shift=0`` and the original shift as ``eval_shift`` so the Rayleigh
    quotients are un-shifted correctly (eigensolver.hh:311-312).
    """
    A_sh = A
    if shift != 0.0:
        A_sh = A_sh.axpy(shift, B)
    if reg != 0.0:
        A_sh = A_sh.with_shifted_diagonal(reg)
    if inverse is None:
        from dune_eigensolver_tpu.factorize.host_lu import lu_inverse_factory

        inverse = lu_inverse_factory
    apply_inv = inverse(A_sh)
    if apply_a is None:
        apply_a = lambda X: spmm(A_sh, X)
    if apply_b is None:
        apply_b = lambda X: spmm(B, X)

    dtype = dtype or A.dtype
    m = padded_width(nev, block)
    shift_ = jnp.asarray(shift if eval_shift is None else eval_shift, dtype)
    reduce_ = gram_reduce or (lambda g: g)
    b_ortho = partial(
        b_orthonormalize_blocked,
        apply_b,
        block=block,
        gram_reduce=gram_reduce,
        iterations=ortho_iterations,
    )

    Q = (
        q0
        if q0 is not None
        else random_multivector(jax.random.PRNGKey(seed), A.shape[0], m, dtype)
    )
    Q, norm0 = b_ortho(Q)
    sA = reduce_(dot_products_diagonal(apply_a(Q), Q))
    ra2 = sA - shift_

    def body(state):
        Q, ra2, it, _, _ = state
        Q2 = apply_b(Q)
        Q1 = apply_inv(Q2)
        Q1, norm = b_ortho(Q1)
        sA = reduce_(dot_products_diagonal(apply_a(Q1), Q1))
        ra1 = sA - shift_
        relerror = jnp.max(jnp.abs(ra1 - ra2)) / jnp.max(ra1)
        return Q1, ra1, it + 1, relerror, norm

    def cond(state):
        _, _, it, relerror, _ = state
        return (it < maxiter) & ((it <= min_iter) | (relerror >= tol))

    state = (
        Q,
        ra2,
        jnp.zeros((), jnp.int32),
        jnp.asarray(jnp.inf, dtype),
        norm0,
    )
    Q, ra, it, relerror, norm = lax.while_loop(cond, body, state)
    evals, evecs = sort_result(ra, Q, nev, descending=False)
    return EigenResult(
        eigenvalues=evals,
        eigenvectors=evecs,
        iterations=it,
        converged=relerror < tol,
        criterion=relerror,
        ortho_monitor=norm,
    )
