"""Host-LU factorization + level-scheduled device trisolve vs scipy."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from dune_eigensolver_tpu.factorize.cg import cg_solve
from dune_eigensolver_tpu.factorize.host_lu import factorize, lu_solve
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.spmm import spmm


def test_lu_solve_laplacian(rng):
    N = 16
    A = problems.laplacian_dirichlet_2d(N)
    F = factorize(A, chunk=64, dtype=np.float64)
    X = jnp.asarray(rng.normal(size=(N * N, 8)))
    Y = lu_solve(F, X)
    ref = sp.linalg.splu(sp.csc_matrix(A.to_scipy())).solve(np.asarray(X))
    assert np.abs(np.asarray(Y) - ref).max() < 1e-10


def test_lu_solve_unsymmetric(rng):
    n = 80
    A = sp.random(n, n, density=0.08, random_state=np.random.RandomState(3))
    A = sp.csc_matrix(A + sp.eye(n) * 4.0)
    F = factorize(A, chunk=32, symmetric=False, permc_spec="COLAMD", dtype=np.float64)
    X = jnp.asarray(rng.normal(size=(n, 4)))
    Y = np.asarray(lu_solve(F, X))
    assert np.abs(A @ Y - np.asarray(X)).max() < 1e-9


def test_lu_solve_jittable(rng):
    N = 8
    A = problems.laplacian_dirichlet_2d(N)
    F = factorize(A, chunk=16, dtype=np.float64)
    X = jnp.asarray(rng.normal(size=(N * N, 8)))
    Y = jax.jit(lu_solve)(F, X)
    assert np.abs(np.asarray(spmm(A, Y)) - np.asarray(X)).max() < 1e-9


def test_lu_singular_raises():
    n = 10
    A = sp.eye(n, format="csc").tolil()
    A[5, 5] = 0.0
    with pytest.raises(Exception):
        factorize(sp.csc_matrix(A))


def test_cg_solve_spd(rng):
    N = 14
    A = problems.laplacian_dirichlet_2d(N)
    B = jnp.asarray(rng.normal(size=(N * N, 8)))
    X, iters = cg_solve(lambda V: spmm(A, V), B, diag=A.diagonal(), rtol=1e-12)
    assert np.abs(np.asarray(spmm(A, X)) - np.asarray(B)).max() < 1e-8
    assert int(iters) < N * N
