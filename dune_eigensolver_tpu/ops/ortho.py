"""Blocked multivector orthonormalization and dot products.

TPU-native reformulation of the reference kernels
(dune/eigensolver/kernels_cpp.hh):

* ``dot_products_diagonal`` — per-column dots, the Rayleigh-quotient kernel
  (reference :24-55).
* ``dot_products_all`` — full m x m Gram (reference :58-96); one MXU matmul.
* ``orthonormalize_blocked`` — the reference orthonormalizes each b-column
  block by LU-factorizing its Gram matrix and right-multiplying by
  ``U^-1 . D^-1/2`` (reference :231-306), which is exactly Cholesky-QR
  (``Q = X @ chol(X^T X)^-T``), then projects all later blocks against the
  finished block with rank-b updates (reference :308-349). Here every piece
  is a dense matmul/triangular-solve on the MXU, and the Gram matrices can be
  all-reduced across a device mesh via ``gram_reduce`` (the collective
  orthogonalization the single-process reference lacks).
* ``b_orthonormalize_blocked`` — B-inner-product variant that keeps
  ``P = B @ (current block)`` resident (reference :356-591) and returns the
  max |R_kj| loss-of-orthogonality monitor exactly like the reference
  (reference :369,466,568,590).

For f32/bf16 on TPU (f64 is emulated and slow), pass ``iterations=2`` to run
the sweep twice (CholeskyQR2), which restores orthogonality to machine
precision as long as the first pass succeeds.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

# Gram matrices feed Cholesky: always use full-precision MXU passes.
_PREC = lax.Precision.HIGHEST


def dot_products_diagonal(Q1: jax.Array, Q2: jax.Array) -> jax.Array:
    """diag(Q1^T @ Q2): dot of each column of Q1 with same column of Q2."""
    return jnp.sum(Q1 * Q2, axis=0)


def dot_products_all(Q1: jax.Array, Q2: jax.Array) -> jax.Array:
    """Full Gram matrix Q1^T @ Q2 (m x m)."""
    return jnp.dot(Q1.T, Q2, precision=_PREC)


def _small_chol(G: jax.Array) -> jax.Array:
    """Lower Cholesky of a block Gram matrix; fully unrolled for the static
    small block sizes (8x8 jnp.linalg.cholesky lowers to a serialized XLA
    loop on TPU — see ops/smalllinalg.py)."""
    from dune_eigensolver_tpu.ops.smalllinalg import _UNROLL_MAX, cholesky_unrolled

    if G.shape[0] <= _UNROLL_MAX:
        return cholesky_unrolled(G)
    return jnp.linalg.cholesky(G)


def _right_lower_t_solve(Xk: jax.Array, R: jax.Array) -> jax.Array:
    """Xk @ R^-T for lower-triangular R (unrolled for small blocks)."""
    from dune_eigensolver_tpu.ops.smalllinalg import (
        _UNROLL_MAX,
        solve_lower_transpose_right,
    )

    if R.shape[0] <= _UNROLL_MAX:
        return solve_lower_transpose_right(Xk, R)
    return lax.linalg.triangular_solve(
        R, Xk, left_side=False, lower=True, transpose_a=True
    )


def _right_chol_solve(Xk: jax.Array, G: jax.Array, eps: float) -> jax.Array:
    """Return Xk @ chol(G)^-T for symmetric positive definite G."""
    G = 0.5 * (G + G.T)
    # tiny relative regularization guards chol against rank deficiency of a
    # random block; mirrors the reference's reliance on benign Gram matrices.
    G = G + eps * jnp.trace(G) / G.shape[0] * jnp.eye(G.shape[0], dtype=G.dtype)
    return _right_lower_t_solve(Xk, _small_chol(G))


def orthonormalize_blocked(
    X: jax.Array,
    block: int = 8,
    gram_reduce: Optional[Callable[[jax.Array], jax.Array]] = None,
    iterations: int = 1,
    eps: float = 0.0,
) -> jax.Array:
    """Orthonormalize the columns of X block by block (Cholesky-QR per block
    + projection of later blocks). Semantics match the reference's
    orthonormalize_blocked (kernels_cpp.hh:180-351): after the call the
    columns are orthonormal and span the same nested subspaces.

    gram_reduce: optional allreduce (e.g. ``lambda g: psum(g, 'rows')``)
    applied to every Gram/projection matrix for row-sharded X.
    """
    n, m = X.shape
    if m % block != 0:
        raise ValueError(f"orthonormalize_blocked: m={m} not multiple of {block}")
    reduce_ = gram_reduce or (lambda g: g)

    for _ in range(iterations):
        cols = []
        done = None  # (n, processed) orthonormal prefix
        for bk in range(0, m, block):
            Xk = X[:, bk : bk + block]
            if done is not None:
                # project against all finished blocks (rank-b updates,
                # reference kernels_cpp.hh:308-349)
                S = reduce_(jnp.dot(done.T, Xk, precision=_PREC))
                Xk = Xk - jnp.dot(done, S, precision=_PREC)
            G = reduce_(jnp.dot(Xk.T, Xk, precision=_PREC))
            Xk = _right_chol_solve(Xk, G, eps)
            cols.append(Xk)
            done = Xk if done is None else jnp.concatenate([done, Xk], axis=1)
        X = done
    return X


def b_orthonormalize_blocked(
    b_op,
    X: jax.Array,
    block: int = 8,
    gram_reduce: Optional[Callable[[jax.Array], jax.Array]] = None,
    iterations: int = 1,
    eps: float = 0.0,
    return_mass: bool = False,
):
    """B-orthonormalize the columns of X: on return X^T B X = I.

    ``b_op`` is either a sparse container (anything ``spmm`` accepts) or a
    callable ``X -> B @ X``. Returns ``(X, norm)`` where ``norm`` is the
    maximum absolute off-diagonal Gram/projection coefficient observed — the
    loss-of-orthogonality monitor of the reference
    (kernels_cpp.hh:369,466,568,590).

    ``return_mass=True`` additionally returns the per-column B-mass
    ``diag(Gram)`` measured after projection but before normalization, on
    the FIRST sweep: for a singular B (the GenEO partition-of-unity mass,
    src/dune-eigensolver.cc:124-143) a column in null(B) has mass ~ eps and
    only survives normalization through the regularization floor — callers
    (LOBPCG) use the mass to identify and deflate such junk directions.

    Like the reference (:379-395), ``P = B @ (pivot block)`` is recomputed per
    block so it reflects earlier projections, then kept consistent through
    the block's normalization.
    """
    from dune_eigensolver_tpu.sparse.spmm import spmm

    apply_b = b_op if callable(b_op) else (lambda V: spmm(b_op, V))
    n, m = X.shape
    if m % block != 0:
        raise ValueError(f"b_orthonormalize_blocked: m={m} not multiple of {block}")
    reduce_ = gram_reduce or (lambda g: g)

    norm = jnp.zeros((), dtype=X.dtype)
    offdiag = ~jnp.eye(block, dtype=bool)
    mass = None  # first-sweep pre-normalization diag(G), per column
    for sweep in range(iterations):
        done_x = None  # orthonormal prefix
        done_p = None  # B @ prefix
        masses = []
        for bk in range(0, m, block):
            Xk = X[:, bk : bk + block]
            if done_x is not None:
                # project against finished blocks via their B-images
                # (reference kernels_cpp.hh:542-584)
                S = reduce_(jnp.dot(done_p.T, Xk, precision=_PREC))
                norm = jnp.maximum(norm, jnp.max(jnp.abs(S)))
                Xk = Xk - jnp.dot(done_x, S, precision=_PREC)
            Pk = apply_b(Xk)
            G = reduce_(jnp.dot(Pk.T, Xk, precision=_PREC))
            norm = jnp.maximum(norm, jnp.max(jnp.abs(jnp.where(offdiag, G, 0))))
            masses.append(jnp.diag(G))
            G = 0.5 * (G + G.T)
            Gr = G + eps * jnp.trace(G) / block * jnp.eye(block, dtype=G.dtype)
            R = _small_chol(Gr)
            Xk = _right_lower_t_solve(Xk, R)
            Pk = _right_lower_t_solve(Pk, R)
            done_x = Xk if done_x is None else jnp.concatenate([done_x, Xk], 1)
            done_p = Pk if done_p is None else jnp.concatenate([done_p, Pk], 1)
        X = done_x
        if sweep == 0:
            mass = jnp.concatenate(masses)
    if return_mass:
        return X, norm, mass
    return X, norm
