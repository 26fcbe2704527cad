"""LOBPCG: locally-optimal block preconditioned conjugate gradient.

A TPU-first *addition* beyond the reference's solver set: the reference
computes the smallest eigenpairs of ``A x = lambda B x`` by shift-invert
subspace iteration (``GeneralizedInverse``, dune/eigensolver/
eigensolver.hh:204-351), which applies a full direct solve every iteration
and converges at the subspace-iteration rate. LOBPCG (Knyazev 2001) reaches
the same eigenpairs with a three-term locally-optimal subspace
``[X, T r, P]`` and typically fewer operator applications; every step is
tall-skinny dense algebra (Gram matrices, small eigh, block rotations) that
maps straight onto the MXU, plus one SpMM per operator. The shifted direct
factorization the reference builds anyway (our block-banded partitioned
inverse) slots in as the preconditioner ``T ~ (A + shift*B)^-1``.

Formulation note (why the *reciprocal* pencil): the GenEO mass matrix B is
positive **semi**-definite (partition-of-unity masked, zero near the
boundary — src/dune-eigensolver.cc:124-143), so minimizing the Rayleigh
quotient x^T A x / x^T B x directly is numerically treacherous: directions
with vanishing B-mass have 0/0 quotients and stall or poison the Ritz step.
Instead we use that A' = A + shift*B is positive definite (the same
assumption the reference's factorization makes, eigensolver.hh:241-256) and
seek the LARGEST eigenvalues nu of the reciprocal pencil

    B y = nu A' y,    nu = 1 / (lambda + shift),

with an A'-orthonormal basis. B-null junk directions then sit harmlessly at
nu ~ 0, the opposite end of the spectrum from what Rayleigh-Ritz selects.

Structure mirrors the other solvers: a module-level jitted core with all
large operands (matrices, preconditioner aux, Q0) as explicit arguments, and
``apply_a``/``apply_b``/``gram_reduce`` hooks so the distributed layer can
inject halo-exchange SpMMs and psum reductions.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from dune_eigensolver_tpu.ops.ortho import b_orthonormalize_blocked
from dune_eigensolver_tpu.solvers.result import EigenResult, sort_result
from dune_eigensolver_tpu.solvers.standard import (
    normalize_inverse,
    padded_width,
    random_multivector,
)
from dune_eigensolver_tpu.sparse.spmm import spmm

_PREC = lax.Precision.HIGHEST


def _lobpcg_core(A_sh, B, prec_aux, Q0, hooks, cfg):
    apply_a_h, apply_b_h, gram_reduce, prec_fn = hooks
    (nev, tol, maxiter, shift_eval, block, min_iter, ortho_eps, dtype) = cfg
    apply_a = apply_a_h or (lambda X: spmm(A_sh, X))
    apply_b = apply_b_h or (lambda X: spmm(B, X))
    reduce_ = gram_reduce or (lambda g: g)
    shift_ = jnp.asarray(shift_eval, dtype)
    n, m = Q0.shape
    tiny = jnp.asarray(1e-30, dtype)

    def a_ortho(S):
        # CholeskyQR2 in the A'-inner product; A' is PD so no junk handling
        # is needed (the eps floor only guards W -> 0 at convergence).
        S, _ = b_orthonormalize_blocked(
            apply_a, S, block=block, gram_reduce=gram_reduce, iterations=2,
            eps=ortho_eps,
        )
        return S

    def ritz(S, k):
        """Rayleigh-Ritz for the largest-k of ``B y = nu A' y`` on an
        A'-orthonormal basis S: returns (nu, V) with nu descending."""
        BS = apply_b(S)
        G = reduce_(jnp.dot(BS.T, S, precision=_PREC))
        G = 0.5 * (G + G.T)
        nu, V = jnp.linalg.eigh(G)  # ascending
        return nu[::-1][:k], V[:, ::-1][:, :k]

    def lam_of(nu):
        return 1.0 / jnp.maximum(nu, tiny) - shift_

    # --- iteration 0: Rayleigh-Ritz on the start block alone ---
    X = a_ortho(Q0)
    nu, V = ritz(X, m)
    X = jnp.dot(X, V, precision=_PREC)
    lam = lam_of(nu)
    P = jnp.zeros_like(X)
    have_p = jnp.zeros((), jnp.bool_)

    def body(state):
        X, P, have_p, lam_prev, it, _ = state
        AX = apply_a(X)
        BX = apply_b(X)
        nu = reduce_(jnp.sum(X * BX, axis=0))  # X is A'-orthonormal
        R = BX - AX * nu[None, :]
        W = prec_fn(prec_aux, R)
        # P is zero on the first pass; the filler is projected to noise by
        # the orthonormalization (eps floor) and never selected by RR.
        P_eff = jnp.where(have_p, P, W * 0.5)
        S = jnp.concatenate([X, W, P_eff], axis=1)  # (n, 3m)
        S = a_ortho(S)
        nu_all, Vx = ritz(S, m)
        Xn = jnp.dot(S, Vx, precision=_PREC)
        # LOBPCG direction: the Ritz rotation restricted to the [W, P] block
        Vp = Vx.at[:m, :].set(0.0)
        Pn = jnp.dot(S, Vp, precision=_PREC)
        # A'-normalize P columns (guard against zero columns)
        APn = apply_a(Pn)
        pn = reduce_(jnp.sum(Pn * APn, axis=0))
        Pn = Pn / jnp.sqrt(jnp.maximum(pn, tiny))[None, :]
        lam_n = lam_of(nu_all)
        relerror = jnp.max(jnp.abs(lam_n - lam_prev)) / jnp.maximum(
            jnp.max(jnp.abs(lam_n)), tiny
        )
        return Xn, Pn, jnp.ones((), jnp.bool_), lam_n, it + 1, relerror

    def cond(state):
        _, _, _, _, it, relerror = state
        return (it < maxiter) & ((it <= min_iter) | (relerror >= tol))

    state = (X, P, have_p, lam, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, dtype))
    X, P, _, lam, it, relerror = lax.while_loop(cond, body, state)
    # X columns are A'-orthonormal; rescale to B-normalized eigenvectors the
    # way the reference returns them (unit B-norm up to convergence).
    BX = apply_b(X)
    bmass = reduce_(jnp.sum(X * BX, axis=0))
    X = X / jnp.sqrt(jnp.maximum(bmass, tiny))[None, :]
    evals, evecs = sort_result(lam, X, nev, descending=False)
    return EigenResult(
        eigenvalues=evals,
        eigenvectors=evecs,
        iterations=it,
        converged=relerror < tol,
        criterion=relerror,
        ortho_monitor=jnp.zeros((), dtype),
    )


_lobpcg_core_jit = jax.jit(_lobpcg_core, static_argnums=(4, 5))


def lobpcg_generalized(
    A,
    B,
    nev: int,
    tol: float,
    maxiter: int,
    shift: float = 0.0,
    reg: float = 0.0,
    block: int = 8,
    seed: int = 123,
    min_iter: int = 3,
    ortho_eps: float = 1e-9,
    precond: Optional[Callable] = None,
    apply_a: Optional[Callable] = None,
    apply_b: Optional[Callable] = None,
    gram_reduce: Optional[Callable] = None,
    q0: Optional[jax.Array] = None,
    eval_shift: Optional[float] = None,
    dtype=None,
) -> EigenResult:
    """Smallest-nev eigenpairs of ``A x = lambda B x`` by preconditioned
    LOBPCG on the reciprocal pencil (module docstring). Same problem and
    operand contract as ``generalized_inverse`` (reference
    eigensolver.hh:204-351) with typically fewer operator applications.

    Requires A' = A + shift*B + reg*I positive definite — the same
    assumption the reference's no-pivot factorization path makes; pass a
    positive ``shift`` (reference default 1e-3) and/or ``reg``.

    ``precond``: factory mapping A' to an (approximate) inverse apply; same
    conventions as the ``inverse=`` factories (plain callable or
    closure-free ``(aux, fn)``). Defaults to
    ``factorize.default_inverse_factory`` — the same engine the shift-invert
    solvers use, here only needed approximately. Pass ``precond=False`` for
    unpreconditioned LOBPCG (matrix-free end to end).
    """
    from dune_eigensolver_tpu.solvers.standard import shifted_operand

    A_sh = shifted_operand(A, B, shift, reg)

    if precond is False:
        prec_aux, prec_fn = None, (lambda _aux, X: X)
    else:
        if precond is None:
            from dune_eigensolver_tpu.factorize import default_inverse_factory

            precond = default_inverse_factory
        prec_aux, prec_fn = normalize_inverse(precond(A_sh))

    dtype = dtype or A.dtype
    m = padded_width(nev, block)
    Q0 = (
        q0
        if q0 is not None
        else random_multivector(jax.random.PRNGKey(seed), A.shape[0], m, dtype)
    )
    cfg = (
        nev,
        float(tol),
        int(maxiter),
        float(shift if eval_shift is None else eval_shift),
        int(block),
        int(min_iter),
        float(ortho_eps),
        jnp.dtype(dtype),
    )
    hooks = (apply_a, apply_b, gram_reduce, prec_fn)
    if apply_a is None and apply_b is None and gram_reduce is None:
        return _lobpcg_core_jit(A_sh, B, prec_aux, Q0, hooks, cfg)
    return _lobpcg_core(A_sh, B, prec_aux, Q0, hooks, cfg)
