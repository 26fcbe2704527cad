"""Tight-accuracy path: compensated f32 arithmetic + Rayleigh-Ritz
refinement must reproduce the 1e-14 oracle to <= 1e-6 from a pure-f32
iteration — the f32-storage equivalent of the reference's f64 protocol
(src/dune-eigensolver.cc:559-614).
"""

import numpy as np

import jax
import jax.numpy as jnp

from dune_eigensolver_tpu.ops.compensated import (
    dot2_rows,
    gram2_t,
    spmm2_dia_t,
    sum2,
    twoprod,
    twosum,
)
from dune_eigensolver_tpu.oracle import (
    eigenvalues_laplace_dirichlet_2d,
    smallest_generalized,
)
from dune_eigensolver_tpu.solvers import (
    generalized_inverse,
    refine_eigenpairs,
    standard_largest,
)
from dune_eigensolver_tpu.sparse import problems


def test_twosum_twoprod_exact(rng):
    a = jnp.asarray(rng.normal(size=1000).astype(np.float32)) * 1e3
    b = jnp.asarray(rng.normal(size=1000).astype(np.float32)) * 1e-3
    s, e = twosum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    assert np.abs(got - exact).max() == 0.0
    p, ep = twoprod(a, b)
    exactp = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    gotp = np.asarray(p, np.float64) + np.asarray(ep, np.float64)
    assert np.abs(gotp - exactp).max() == 0.0  # f32 products are exact in f64


def test_sum2_dot2_f64_grade(rng):
    # an adversarial sum: large cancellation that plain f32 gets wrong
    n = 4096
    x = rng.normal(size=n).astype(np.float32) * 1e4
    x64 = np.asarray(x, np.float64)
    hi, lo = sum2(jnp.asarray(x))
    got = float(np.asarray(hi, np.float64) + np.asarray(lo, np.float64))
    exact = float(x64.sum())
    assert abs(got - exact) <= 1e-6 * np.abs(x64).sum() * 1e-7  # ~u^2 n level
    plain = float(jnp.sum(jnp.asarray(x)))
    assert abs(got - exact) < abs(plain - exact) or plain == exact

    X = rng.normal(size=(4, n)).astype(np.float32)
    Y = rng.normal(size=(4, n)).astype(np.float32)
    hi, lo = dot2_rows(jnp.asarray(X), jnp.asarray(Y))
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    exact = np.einsum("mn,mn->m", X.astype(np.float64), Y.astype(np.float64))
    assert np.abs(got - exact).max() < 1e-10 * np.abs(exact).max() + 1e-12


def test_spmm2_gram2_vs_f64(rng):
    A = problems.laplacian_dirichlet_2d(24, dtype=np.float32)
    n = A.shape[0]
    Xt = jnp.asarray(rng.normal(size=(8, n)).astype(np.float32))
    hi, lo = spmm2_dia_t(A, Xt)
    As = A.to_scipy().astype(np.float64)
    exact = (As @ np.asarray(Xt, np.float64).T).T
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    assert np.abs(got - exact).max() < 1e-12 * np.abs(exact).max() + 1e-13

    Gh, Gl = gram2_t(Xt, Xt)
    G = np.asarray(Gh, np.float64) + np.asarray(Gl, np.float64)
    Gex = np.asarray(Xt, np.float64) @ np.asarray(Xt, np.float64).T
    assert np.abs(G - Gex).max() < 1e-9 * np.abs(Gex).max()


def test_refined_generalized_hits_1e6_vs_oracle():
    """Full f32 GenEO-style solve + refinement vs the 1e-14 oracle: the
    reference protocol's tight row, achieved with f32 storage only."""
    N, overlap, shift = 24, 3, 1e-3
    A = problems.laplacian_neumann_2d(N, dtype=np.float32)
    B = problems.laplacian_b_2d(N, overlap, dtype=np.float32)
    res = generalized_inverse(A, B, nev=4, tol=1e-7, maxiter=800, shift=shift)
    truth, _ = smallest_generalized(A, B, 4, sigma=-shift, tol=1e-14)
    raw_err = np.abs(np.asarray(res.eigenvalues, np.float64)[:4] - truth).max()
    w, _ = refine_eigenpairs(A, B, res.eigenvectors, nev=4)
    ref_err = np.abs(w - truth).max()
    assert ref_err < 1e-6, (ref_err, raw_err)
    assert ref_err <= raw_err + 1e-12


def test_refined_largest_vs_analytic():
    """f32 standard_largest + refinement against the closed-form 2D
    Dirichlet spectrum (src/dune-eigensolver.cc:437-446): <= 1e-6."""
    N = 20
    A = problems.laplacian_dirichlet_2d(N, dtype=np.float32)
    res = standard_largest(A, nev=4, tol=1e-7, maxiter=2000)
    w, _ = refine_eigenpairs(A, None, res.eigenvectors, nev=4)
    ana = np.sort(eigenvalues_laplace_dirichlet_2d(N))[-4:]
    assert np.abs(np.sort(w) - ana).max() < 1e-6


def test_refine_rotation_residual():
    N = 16
    A = problems.laplacian_dirichlet_2d(N, dtype=np.float32)
    res = standard_largest(A, nev=4, tol=1e-7, maxiter=2000)
    w, Vr = refine_eigenpairs(A, None, res.eigenvectors, nev=4,
                              rotate_vectors=True)
    As = A.to_scipy().astype(np.float64)
    V = np.asarray(Vr, np.float64)
    for j in range(4):
        v = V[:, j] / np.linalg.norm(V[:, j])
        r = As @ v - w[j] * v
        assert np.linalg.norm(r) < 5e-5
