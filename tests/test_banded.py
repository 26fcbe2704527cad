"""Block-banded partitioned-inverse factorization (factorize/banded.py).

Covers: Cholesky and no-pivot-LU host paths, partial last blocks, k > 1
(bandwidth > block size), f32/f64, and solver integration as the default
shift-invert engine. Reference correctness spec: the externalized-LU solve
semantics of umfpacktools.hh + kernels_cpp.hh:660-755 (here P=Q=identity by
natural ordering).
"""

import numpy as np
import pytest
import scipy.sparse.linalg as spl

import jax

from dune_eigensolver_tpu.factorize.banded import (
    banded_solve,
    factorize_banded,
)
from dune_eigensolver_tpu.sparse import problems


def _solve_err(A, C, dtype, m=8, seed=0):
    F = factorize_banded(A, C=C, dtype=dtype)
    n = A.shape[0]
    B = np.random.default_rng(seed).standard_normal((n, m)).astype(dtype)
    X = np.asarray(jax.jit(lambda b: banded_solve(F, b))(B))
    Xref = spl.spsolve(A.to_scipy().tocsc().astype(np.float64), B.astype(np.float64))
    return np.abs(X - Xref).max() / np.abs(Xref).max(), F


@pytest.mark.parametrize("N,C", [(16, 128), (40, 128), (40, 256), (33, 128)])
def test_cholesky_path_f64(N, C):
    A = problems.laplacian_dirichlet_2d(N, dtype=np.float64).with_shifted_diagonal(0.1)
    err, F = _solve_err(A, C, np.float64)
    assert F.stats[3] == "cholesky"
    assert err < 1e-12


def test_lu_path_indefinite():
    # negative shift makes the operator indefinite -> Cholesky fails -> LU
    A = problems.laplacian_dirichlet_2d(30, dtype=np.float64).with_shifted_diagonal(
        -0.5
    )
    err, F = _solve_err(A, 128, np.float64)
    assert F.stats[3] == "lu"
    assert err < 1e-8


def test_bandwidth_exceeds_block():
    # N=200 -> bw=200 > C=128 -> k=2 subdiagonal block columns
    A = problems.laplacian_dirichlet_2d(200, dtype=np.float64).with_shifted_diagonal(
        0.05
    )
    err, F = _solve_err(A, 128, np.float64)
    assert F.fwd.k == 2
    assert err < 1e-11


def test_f32_accuracy():
    A = problems.laplacian_dirichlet_2d(32, dtype=np.float32).with_shifted_diagonal(0.1)
    err, _ = _solve_err(A, 128, np.float32)
    assert err < 5e-4  # f32 partitioned inverse


@pytest.mark.parametrize("method", ["cholesky", "lu"])
def test_device_factorization(method):
    # the fully device-resident setup path (block-tridiag extraction + scan)
    from dune_eigensolver_tpu.factorize.banded import factorize_banded_device

    A = problems.laplacian_dirichlet_2d(40, dtype=np.float64).with_shifted_diagonal(
        0.1
    )
    F = factorize_banded_device(A, C=128, dtype=np.float64, method=method)
    n = A.shape[0]
    B = np.random.default_rng(0).standard_normal((n, 8))
    X = np.asarray(banded_solve(F, B))
    Xref = spl.spsolve(A.to_scipy().tocsc(), B)
    assert np.abs(X - Xref).max() / np.abs(Xref).max() < 1e-12


def test_device_lu_indefinite():
    from dune_eigensolver_tpu.factorize.banded import factorize_banded_device

    A = problems.laplacian_dirichlet_2d(50, dtype=np.float64).with_shifted_diagonal(
        -0.5
    )
    F = factorize_banded_device(A, C=128, dtype=np.float64)  # auto -> lu
    assert F.stats[3] == "lu"
    n = A.shape[0]
    B = np.random.default_rng(0).standard_normal((n, 8))
    X = np.asarray(banded_solve(F, B))
    Xref = spl.spsolve(A.to_scipy().tocsc(), B)
    assert np.abs(X - Xref).max() / np.abs(Xref).max() < 1e-10


def test_device_vs_host_factor_parity():
    # same operator through both setup paths -> same solve
    from dune_eigensolver_tpu.factorize.banded import factorize_banded_device

    A = problems.laplacian_dirichlet_2d(33, dtype=np.float64).with_shifted_diagonal(
        0.2
    )
    n = A.shape[0]
    B = np.random.default_rng(3).standard_normal((n, 8))
    Fh = factorize_banded(A, C=128, dtype=np.float64)
    Fd = factorize_banded_device(A, C=128, dtype=np.float64, method="cholesky")
    Xh = np.asarray(banded_solve(Fh, B))
    Xd = np.asarray(banded_solve(Fd, B))
    np.testing.assert_allclose(Xh, Xd, atol=1e-10)


def test_standard_inverse_uses_banded_default():
    # default inverse for a DIA operand is the banded engine; smallest
    # eigenvalues of the Dirichlet Laplacian vs analytic values
    from dune_eigensolver_tpu.oracle.analytic import (
        eigenvalues_laplace_dirichlet_2d,
    )
    from dune_eigensolver_tpu.solvers import standard_inverse

    N = 24
    A = problems.laplacian_dirichlet_2d(N, dtype=np.float64)
    res = standard_inverse(A, nev=4, tol=1e-10, maxiter=500, shift=-1e-3)
    anal = eigenvalues_laplace_dirichlet_2d(N)[:4]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), anal, atol=1e-6)


def test_generalized_inverse_banded_vs_scipy():
    from dune_eigensolver_tpu.oracle.scipy_oracle import smallest_generalized

    N = 24
    A = problems.laplacian_neumann_2d(N, dtype=np.float64)
    B = problems.laplacian_b_2d(N, 3, dtype=np.float64)
    from dune_eigensolver_tpu.solvers import generalized_inverse

    res = generalized_inverse(
        A, B, nev=4, tol=1e-8, maxiter=300, shift=1e-3, min_iter=3
    )
    ev = np.asarray(res.eigenvalues)
    ev_ref, _ = smallest_generalized(A, B, nev=4, sigma=-1e-3)
    np.testing.assert_allclose(ev, ev_ref, atol=2e-5)
