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


def test_memoized_setup_identity_and_eviction():
    import gc
    import numpy as np

    from dune_eigensolver_tpu.solvers.engine import _SETUP_MEMO, memoized_setup

    class Op:  # weakref-able stand-in for an operand container
        pass

    a, b = Op(), Op()
    calls = []
    out1 = memoized_setup((a, b), ("k", 1.0), lambda: calls.append(1) or 42)
    out2 = memoized_setup((a, b), ("k", 1.0), lambda: calls.append(2) or 43)
    assert out1 == out2 == 42 and calls == [1]  # second call hits
    out3 = memoized_setup((a, b), ("k", 2.0), lambda: 99)
    assert out3 == 99  # params distinguish
    key_alive = [k for k, v in _SETUP_MEMO.items() if v[0] == 42]
    assert key_alive
    del a
    gc.collect()
    assert all(_SETUP_MEMO.get(k) is None for k in key_alive)  # evicted
    # unweakrefable operands are not cached (stale-id aliasing unsound)
    r = memoized_setup((1.5,), ("k",), lambda: "fresh")
    assert r == "fresh" and not any(
        v[0] == "fresh" for v in _SETUP_MEMO.values()
    )


def test_repeated_generalized_solve_reuses_setup(monkeypatch):
    # two calls on the SAME pencil objects must build the engine once and
    # return identical eigenvalues
    import numpy as np

    from dune_eigensolver_tpu.solvers import generalized_inverse
    from dune_eigensolver_tpu.solvers import engine as eng
    from dune_eigensolver_tpu.sparse import problems

    A = problems.laplacian_neumann_2d(24, dtype=np.float32)
    B = problems.laplacian_b_2d(24, 3, dtype=np.float32)
    builds = []
    orig = eng.make_engine

    def counting(*a, **k):
        builds.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(eng, "make_engine", counting)
    import dune_eigensolver_tpu.solvers.generalized as gmod

    monkeypatch.setattr(gmod, "make_engine", counting)
    r1 = generalized_inverse(A, B, nev=4, tol=1e-6, maxiter=80, shift=1e-3)
    r2 = generalized_inverse(A, B, nev=4, tol=1e-6, maxiter=80, shift=1e-3)
    assert len(builds) == 1
    np.testing.assert_array_equal(
        np.asarray(r1.eigenvalues), np.asarray(r2.eigenvalues)
    )
