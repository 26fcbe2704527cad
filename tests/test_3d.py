"""3D 7-point Laplacian problems end-to-end (the north-star configuration,
BASELINE.md): wide-bandwidth operators route to the CG inverse
automatically; spectra check against the closed-form 3D eigenvalues."""

import numpy as np

from dune_eigensolver_tpu.oracle.analytic import eigenvalues_laplace_dirichlet_3d
from dune_eigensolver_tpu.sparse import problems


def test_3d_problem_matches_scipy():
    A = problems.laplacian_dirichlet_3d(5, dtype=np.float64)
    S = A.to_scipy()
    assert S.shape == (125, 125)
    # symmetric, 7 diagonals, row sums zero only in the interior
    assert (abs(S - S.T)).sum() == 0.0
    assert S.diagonal().max() == 6.0


def test_3d_standard_largest_vs_analytic():
    from dune_eigensolver_tpu.solvers import standard_largest

    N = 6
    A = problems.laplacian_dirichlet_3d(N, dtype=np.float64)
    res = standard_largest(A, nev=4, tol=1e-11, maxiter=5000)
    anal = eigenvalues_laplace_dirichlet_3d(N)[::-1][:4]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), anal, atol=1e-5)


def test_3d_smallest_routes_to_cg():
    # bw = N^2 = 4096 > _DEVICE_BW_MAX would hold at production N; at test
    # scale verify the identity-B generalized path end-to-end instead
    from dune_eigensolver_tpu.factorize import default_inverse_factory
    from dune_eigensolver_tpu.solvers import generalized_inverse

    N = 6
    A = problems.laplacian_dirichlet_3d(N, dtype=np.float64)
    B = problems.identity_on_pattern(A, dtype=np.float64)
    res = generalized_inverse(
        A, B, nev=4, tol=1e-9, maxiter=500, shift=1e-3, min_iter=3
    )
    anal = eigenvalues_laplace_dirichlet_3d(N)[:4]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), anal, atol=1e-6)


def test_wide_bandwidth_routes_to_cg():
    from dune_eigensolver_tpu.factorize import default_inverse_factory
    from dune_eigensolver_tpu.factorize.banded import _DEVICE_BW_MAX
    from dune_eigensolver_tpu.sparse.formats import DIAMatrix
    import jax.numpy as jnp

    n = 2 * (_DEVICE_BW_MAX + 128)
    bw = _DEVICE_BW_MAX + 128
    data = jnp.stack(
        [jnp.full((n,), -0.1), jnp.full((n,), 4.0), jnp.full((n,), -0.1)]
    )
    A = DIAMatrix(data=data, offsets=(-bw, 0, bw), shape=(n, n))
    inv = default_inverse_factory(A)
    # CG factory returns the closure-free (aux, fn) pair with the DIA
    # operand as aux (banded engines return a BandedFactorization aux)
    from dune_eigensolver_tpu.sparse.formats import DIAMatrix as _DIA

    assert isinstance(inv, tuple) and callable(inv[1])
    assert isinstance(inv[0][0], _DIA)
