"""Solver engine: guarded transposed internal layout + hook fallbacks.

Covers VERDICT round-1 items: the partial-hooks crash (passing only
gram_reduce used to TypeError at trace time) and the Pallas-padded hot path
actually running inside the solver loops (forced on the CPU backend via
interpret mode with ``force_padded=True``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dune_eigensolver_tpu.oracle import eigenvalues_laplace_dirichlet_2d
from dune_eigensolver_tpu.solvers import (
    generalized_inverse,
    lobpcg_generalized,
    standard_largest,
)
from dune_eigensolver_tpu.sparse import problems


def _gen_problem(N=24, dtype=np.float32):
    A = problems.laplacian_neumann_2d(N, dtype=dtype)
    B = problems.laplacian_b_2d(N, 3, dtype=dtype)
    return A, B


def test_generalized_partial_hooks_gram_reduce_only():
    # round 1 crashed whenever ANY hook was set: apply_b defaulted to
    # spmm(None, X). Only gram_reduce set must fall back per-hook.
    A, B = _gen_problem()
    res = generalized_inverse(
        A, B, nev=4, tol=1e-2, maxiter=30, shift=1e-3, min_iter=2,
        gram_reduce=lambda g: g,
    )
    ref = generalized_inverse(A, B, nev=4, tol=1e-2, maxiter=30, shift=1e-3, min_iter=2)
    np.testing.assert_allclose(
        np.asarray(res.eigenvalues), np.asarray(ref.eigenvalues), rtol=1e-4, atol=1e-6
    )


def test_lobpcg_partial_hooks_gram_reduce_only():
    A, B = _gen_problem()
    from dune_eigensolver_tpu.factorize import cg_inverse_factory

    prec = cg_inverse_factory(rtol=1e-2, maxiter=30)
    res = lobpcg_generalized(
        A, B, nev=4, tol=1e-3, maxiter=40, shift=1e-3, precond=prec,
        gram_reduce=lambda g: g,
    )
    ref = lobpcg_generalized(
        A, B, nev=4, tol=1e-3, maxiter=40, shift=1e-3, precond=prec
    )
    np.testing.assert_allclose(
        np.asarray(res.eigenvalues), np.asarray(ref.eigenvalues), rtol=1e-3, atol=1e-6
    )


def test_standard_largest_padded_engine_matches_plain():
    # force the guarded Pallas layout on CPU (interpret mode): the full
    # while-loop runs on the persistent padded multivector
    A = problems.laplacian_dirichlet_2d(12, dtype=np.float32)
    res_p = standard_largest(
        A, nev=4, tol=1e-8, maxiter=600, rayleigh_ritz=True, force_padded=True
    )
    res = standard_largest(
        A, nev=4, tol=1e-8, maxiter=600, rayleigh_ritz=True, force_padded=False
    )
    np.testing.assert_allclose(
        np.asarray(res_p.eigenvalues), np.asarray(res.eigenvalues), rtol=1e-4
    )
    exact = eigenvalues_laplace_dirichlet_2d(12)[::-1][:4]
    np.testing.assert_allclose(np.asarray(res_p.eigenvalues), exact, rtol=1e-2)
    # eigenvectors come back unpadded in the public column layout
    assert res_p.eigenvectors.shape == (A.shape[0], 4)


def test_generalized_padded_engine_matches_plain():
    A, B = _gen_problem(N=16)
    kw = dict(nev=4, tol=1e-3, maxiter=40, shift=1e-3, min_iter=3)
    res_p = generalized_inverse(A, B, force_padded=True, **kw)
    res = generalized_inverse(A, B, force_padded=False, **kw)
    np.testing.assert_allclose(
        np.asarray(res_p.eigenvalues), np.asarray(res.eigenvalues),
        rtol=1e-3, atol=1e-7,
    )


def test_lobpcg_padded_engine_matches_plain():
    from dune_eigensolver_tpu.factorize import cg_inverse_factory

    A, B = _gen_problem(N=16)
    prec = cg_inverse_factory(rtol=1e-2, maxiter=25)
    kw = dict(nev=4, tol=1e-3, maxiter=40, shift=1e-3, precond=prec)
    res_p = lobpcg_generalized(A, B, force_padded=True, **kw)
    res = lobpcg_generalized(A, B, force_padded=False, **kw)
    np.testing.assert_allclose(
        np.asarray(res_p.eigenvalues), np.asarray(res.eigenvalues),
        rtol=1e-3, atol=1e-7,
    )
