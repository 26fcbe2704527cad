"""Chebyshev polynomial inverse / preconditioner engine.

Approximation quality on a known SPD operator, SPD-ness of the
preconditioning operator, and end-to-end LOBPCG parity with the analytic
2D Dirichlet-Laplacian spectrum (src/dune-eigensolver.cc:437-446).
"""

import numpy as np

import jax.numpy as jnp

from dune_eigensolver_tpu.factorize import chebyshev_inverse_factory
from dune_eigensolver_tpu.factorize.chebyshev import chebyshev_apply
from dune_eigensolver_tpu.oracle import eigenvalues_laplace_dirichlet_2d
from dune_eigensolver_tpu.solvers import lobpcg_generalized
from dune_eigensolver_tpu.solvers.standard import normalize_inverse
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.spmm import spmm

TOL = 2e-3  # reference working tolerance (src/dune-eigensolver.ini:20)


def test_chebyshev_apply_well_conditioned(rng):
    # On an interval that truly brackets the spectrum, the residual must
    # decay at the Chebyshev rate: k = lmax/lmin = 4 -> factor 1/3 per
    # degree -> degree 16 is ~1e-8.
    n = 300
    d = jnp.asarray(1.0 + 3.0 * rng.uniform(size=n))  # spectrum in [1, 4]
    apply_a = lambda X: X * d[:, None]
    R = jnp.asarray(rng.normal(size=(n, 4)))
    W = chebyshev_apply(apply_a, R, 1.0, 4.0, degree=16)
    err = np.abs(np.asarray(W) - np.asarray(R) / np.asarray(d)[:, None]).max()
    assert err < 1e-6


def test_chebyshev_factory_residual(rng):
    # Factory path (power-iteration bounds + Jacobi scaling) on the shifted
    # 2D Laplacian: a degree-24 application must beat the loose-CG quality
    # bar (relative residual well under 1e-1) used for preconditioning.
    N = 24
    A = problems.laplacian_dirichlet_2d(N).with_shifted_diagonal(1e-3)
    aux, fn = normalize_inverse(
        chebyshev_inverse_factory(degree=24, cond_target=50.0)(A)
    )
    X = jnp.asarray(rng.normal(size=(A.shape[0], 8)))
    W = fn(aux, X.T).T  # factory fns use the transposed internal layout
    R = np.asarray(spmm(A, W)) - np.asarray(X)
    rel = np.linalg.norm(R) / np.linalg.norm(np.asarray(X))
    assert rel < 5e-2


def test_chebyshev_operator_is_spd(rng):
    # LOBPCG requires an SPD preconditioner: check symmetry and positivity
    # of the dense matrix of X -> cheb(A) X.
    N = 8
    A = problems.laplacian_dirichlet_2d(N).with_shifted_diagonal(1e-3)
    n = A.shape[0]
    aux, fn = normalize_inverse(chebyshev_inverse_factory(degree=8)(A))
    T = np.asarray(fn(aux, jnp.eye(n)).T)  # transposed layout: rows in, rows out
    assert np.abs(T - T.T).max() < 1e-10 * np.abs(T).max()
    w = np.linalg.eigvalsh(0.5 * (T + T.T))
    assert w.min() > 0


def test_cheb_cg_solve_accuracy(rng):
    # Chebyshev-preconditioned CG (the wide-band default engine) must hit
    # its rtol on the shifted 2D Laplacian in far fewer outer iterations
    # than plain Jacobi-CG would need.
    from dune_eigensolver_tpu.factorize import cheb_cg_inverse_factory

    N = 24
    A = problems.laplacian_dirichlet_2d(N).with_shifted_diagonal(1e-3)
    aux, fn = normalize_inverse(
        cheb_cg_inverse_factory(degree=7, rtol=1e-8, maxiter=100)(A)
    )
    X = jnp.asarray(rng.normal(size=(A.shape[0], 8)))
    W = fn(aux, X.T).T
    R = np.asarray(spmm(A, W)) - np.asarray(X)
    rel = np.linalg.norm(R) / np.linalg.norm(np.asarray(X))
    assert rel < 1e-6


def test_cheb_cg_fewer_iterations_than_jacobi(rng):
    # the point of the engine: dot-bearing outer iterations drop ~degree-fold
    from dune_eigensolver_tpu.factorize.cg import cg_solve_t, _inv_diag_of
    from dune_eigensolver_tpu.factorize.chebyshev import (
        _cg_cheb_run,
        _estimate_lmax_jit,
    )
    from dune_eigensolver_tpu.sparse.spmm import spmm_t

    N = 32
    A = problems.laplacian_dirichlet_2d(N).with_shifted_diagonal(1e-3)
    inv_diag = _inv_diag_of(A)
    B = jnp.asarray(rng.normal(size=(4, A.shape[0])))
    apply_a = lambda V: spmm_t(A, V)
    _, k_jac = cg_solve_t(apply_a, B, inv_diag=inv_diag, rtol=1e-6, maxiter=2000)
    lmax = float(_estimate_lmax_jit(A, inv_diag, 40)) * 1.1
    _, k_cheb = _cg_cheb_run(
        apply_a, B, inv_diag, lmax / 30.0, lmax, 7, 1e-6, 2000, None
    )
    assert int(k_cheb) * 3 < int(k_jac)


def test_default_factory_wide_band_routes_cheb_cg():
    # 3D stencils (bandwidth N^2 > _DEVICE_BW_MAX) must route to the
    # Chebyshev-CG engine and still solve accurately
    from dune_eigensolver_tpu.factorize import default_inverse_factory

    N = 48  # bw = N^2 = 2304 > 2048
    A = problems.laplacian_dirichlet_3d(N=N, dtype=np.float64)
    # keep it small: 3D assembly at N=48 is 110k rows — fine on CPU
    aux, fn = normalize_inverse(default_inverse_factory(A))
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(2, A.shape[0])))
    W = fn(aux, X)
    R = np.asarray(spmm_t_residual(A, W, X))
    assert np.linalg.norm(R) / np.linalg.norm(np.asarray(X)) < 1e-4


def spmm_t_residual(A, W, X):
    from dune_eigensolver_tpu.sparse.spmm import spmm_t

    return np.asarray(spmm_t(A, W)) - np.asarray(X)


def test_lobpcg_chebyshev_vs_analytic():
    N = 20
    A = problems.laplacian_dirichlet_2d(N)
    B = problems.identity_on_pattern(A)
    prec = chebyshev_inverse_factory(degree=12, cond_target=30.0)
    res = lobpcg_generalized(
        A, B, nev=4, tol=1e-6, maxiter=200, shift=1e-3, precond=prec
    )
    ana = eigenvalues_laplace_dirichlet_2d(N)[:4]
    got = np.asarray(res.eigenvalues)[:4]
    assert res.converged
    assert np.abs(got - ana).max() < TOL


def test_lobpcg_chebyshev_bf16():
    """bf16-streamed Chebyshev preconditioner (dtype= on the factory): the
    outer Rayleigh-Ritz stays f32, so eigenvalues still match the analytic
    spectrum — same bandwidth optimization as cg_inverse_factory(dtype=)."""
    import jax.numpy as jnp

    N = 20
    A = problems.laplacian_dirichlet_2d(N, dtype=np.float32)
    B = problems.identity_on_pattern(A)
    prec = chebyshev_inverse_factory(
        degree=12, cond_target=30.0, dtype=jnp.bfloat16
    )
    res = lobpcg_generalized(
        A, B, nev=4, tol=1e-6, maxiter=300, shift=1e-3, precond=prec
    )
    ana = eigenvalues_laplace_dirichlet_2d(N)[:4]
    got = np.sort(np.asarray(res.eigenvalues))[:4]
    assert bool(res.converged)
    assert np.abs(got - ana).max() < TOL


def test_lobpcg_chebyshev_geneo_pair():
    # flagship GenEO-style pair (semidefinite B): Chebyshev-preconditioned
    # LOBPCG must agree with the subspace-iteration solver's oracle protocol
    from dune_eigensolver_tpu.oracle import smallest_generalized

    N = 24
    A = problems.laplacian_neumann_2d(N)
    B = problems.laplacian_b_2d(N, overlap=3)
    prec = chebyshev_inverse_factory(degree=16, cond_target=40.0)
    res = lobpcg_generalized(
        A, B, nev=4, tol=1e-8, maxiter=300, shift=1e-3, precond=prec
    )
    ref, _ = smallest_generalized(A, B, nev=4, sigma=-1e-3)
    got = np.asarray(res.eigenvalues)[:4]
    assert np.abs(got - ref[:4]).max() < TOL
