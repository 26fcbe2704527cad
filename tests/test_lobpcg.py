"""LOBPCG solver tests: same oracle protocol as the subspace-iteration
solvers (tests/test_solvers.py), on the problems of the reference driver
(src/dune-eigensolver.cc:98-156). LOBPCG is a beyond-reference capability;
its results must match the reference-protocol oracles all the same.
"""

import numpy as np

from dune_eigensolver_tpu.oracle import (
    eigenvalues_laplace_dirichlet_2d,
    smallest_generalized,
)
from dune_eigensolver_tpu.solvers import generalized_inverse, lobpcg_generalized
from dune_eigensolver_tpu.sparse import problems

TOL = 2e-3  # reference working tolerance (src/dune-eigensolver.ini:20)


def test_lobpcg_standard_vs_analytic():
    # B = I makes it the standard problem; smallest eigenvalues of the
    # Dirichlet Laplacian have a closed form (cc:437-446).
    N = 20
    A = problems.laplacian_dirichlet_2d(N)
    B = problems.identity_on_pattern(A)
    res = lobpcg_generalized(A, B, nev=4, tol=1e-6, maxiter=200, shift=1e-3)
    ana = eigenvalues_laplace_dirichlet_2d(N)[:4]
    got = np.asarray(res.eigenvalues)[:4]
    assert res.converged
    assert np.abs(got - ana).max() < TOL


def test_lobpcg_geneo_pair_vs_oracle():
    # the flagship GenEO protocol: Neumann A, partition-of-unity B (cc:475-479)
    N = 24
    A = problems.laplacian_neumann_2d(N)
    B = problems.laplacian_b_2d(N, overlap=3)
    res = lobpcg_generalized(
        A, B, nev=4, tol=1e-6, maxiter=300, shift=1e-3, reg=0.0
    )
    truth, _ = smallest_generalized(A, B, 4, sigma=-1e-3, tol=1e-14)
    got = np.asarray(res.eigenvalues)[:4]
    assert np.abs(got - truth).max() < TOL


def test_lobpcg_matches_generalized_inverse():
    N = 24
    A = problems.laplacian_neumann_2d(N)
    B = problems.laplacian_b_2d(N, overlap=3)
    kw = dict(nev=4, tol=1e-6, maxiter=400, shift=1e-3)
    r1 = lobpcg_generalized(A, B, **kw)
    r2 = generalized_inverse(A, B, **kw)
    e1 = np.asarray(r1.eigenvalues)[:4]
    e2 = np.asarray(r2.eigenvalues)[:4]
    assert np.abs(e1 - e2).max() < TOL


def test_lobpcg_unpreconditioned_converges():
    # matrix-free end to end (precond=False): slower but must still converge
    N = 12
    A = problems.laplacian_dirichlet_2d(N)
    B = problems.identity_on_pattern(A)
    res = lobpcg_generalized(
        A, B, nev=2, tol=1e-6, maxiter=2000, precond=False
    )
    ana = eigenvalues_laplace_dirichlet_2d(N)[:2]
    got = np.asarray(res.eigenvalues)[:2]
    assert np.abs(got - ana).max() < TOL


def test_lobpcg_iteration_advantage():
    # the reason LOBPCG exists here: fewer iterations than subspace
    # iteration at equal tolerance on the GenEO pair
    N = 24
    A = problems.laplacian_neumann_2d(N)
    B = problems.laplacian_b_2d(N, overlap=3)
    kw = dict(nev=4, tol=1e-6, maxiter=500, shift=1e-3)
    r_lo = lobpcg_generalized(A, B, min_iter=1, **kw)
    r_gi = generalized_inverse(A, B, **kw)
    assert int(r_lo.iterations) <= int(r_gi.iterations)


def test_lobpcg_b_identity_and_ortho_block():
    # north-star fast-path flags: b_identity skips the B applies (caller
    # asserts B = I) and ortho_block sets the CholeskyQR sweep width
    # (including the whole-basis 'full' single-block fast path). All
    # variants must agree with the analytic spectrum.
    N = 20
    A = problems.laplacian_dirichlet_2d(N)
    B = problems.identity_on_pattern(A)
    ana = eigenvalues_laplace_dirichlet_2d(N)[:4]
    kw = dict(nev=4, tol=1e-6, maxiter=200, shift=1e-3)
    for extra in (
        dict(b_identity=True),
        dict(b_identity=True, ortho_block="full", ortho_iterations=1),
        dict(ortho_block=4),
    ):
        res = lobpcg_generalized(A, B, **kw, **extra)
        got = np.asarray(res.eigenvalues)[:4]
        assert res.converged, extra
        assert np.abs(got - ana).max() < TOL, extra
