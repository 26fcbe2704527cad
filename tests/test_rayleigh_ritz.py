"""Rayleigh-Ritz acceleration (beyond-reference capability).

With ``rayleigh_ritz=True`` the solvers diagonalize the m x m projected
operator each iteration and rotate Q into the Ritz basis. Checks: same
answers, and at least as fast convergence (iteration count) as the plain
per-column Rayleigh quotients of the reference.
"""

import numpy as np

from dune_eigensolver_tpu.oracle.analytic import eigenvalues_laplace_dirichlet_2d
from dune_eigensolver_tpu.sparse import problems


def test_standard_largest_rr_accuracy_and_speed():
    from dune_eigensolver_tpu.solvers import standard_largest

    N = 20
    A = problems.laplacian_dirichlet_2d(N, dtype=np.float64)
    anal = eigenvalues_laplace_dirichlet_2d(N)[::-1][:8]
    r_plain = standard_largest(A, nev=8, tol=1e-9, maxiter=5000)
    r_rr = standard_largest(A, nev=8, tol=1e-9, maxiter=5000, rayleigh_ritz=True)
    np.testing.assert_allclose(np.asarray(r_rr.eigenvalues), anal, atol=1e-5)
    # RR converges in no more iterations than the plain quotients
    assert int(r_rr.iterations) <= int(r_plain.iterations)


def test_generalized_rr_matches_oracle():
    from dune_eigensolver_tpu.oracle.scipy_oracle import smallest_generalized
    from dune_eigensolver_tpu.solvers import generalized_inverse

    N = 24
    A = problems.laplacian_neumann_2d(N, dtype=np.float64)
    B = problems.laplacian_b_2d(N, 3, dtype=np.float64)
    kw = dict(nev=8, tol=1e-8, maxiter=400, shift=1e-3, min_iter=3)
    r_plain = generalized_inverse(A, B, **kw)
    r_rr = generalized_inverse(A, B, rayleigh_ritz=True, **kw)
    ev_ref, _ = smallest_generalized(A, B, nev=8, sigma=-1e-3)
    np.testing.assert_allclose(np.asarray(r_rr.eigenvalues), ev_ref, atol=2e-5)
    assert int(r_rr.iterations) <= int(r_plain.iterations)


def test_standard_inverse_rr():
    from dune_eigensolver_tpu.solvers import standard_inverse

    N = 20
    A = problems.laplacian_dirichlet_2d(N, dtype=np.float64)
    anal = eigenvalues_laplace_dirichlet_2d(N)[:4]
    r = standard_inverse(
        A, nev=4, tol=1e-10, maxiter=500, shift=-1e-3, rayleigh_ritz=True
    )
    np.testing.assert_allclose(np.asarray(r.eigenvalues), anal, atol=1e-6)
