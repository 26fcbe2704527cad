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


def test_lu_equilibration_ill_scaled():
    """UMFPACK-parity row scaling (Rs, umfpacktools.hh:170-186): an operator
    whose rows span ~16 orders of magnitude must still solve accurately with
    f32-externalized factors, because the factors hold the equilibrated
    matrix and Rs is applied to the RHS (kernels_cpp.hh:682-705)."""
    import numpy as np
    import scipy.sparse as sp

    import jax.numpy as jnp

    from dune_eigensolver_tpu.sparse import problems

    rng = np.random.default_rng(3)
    A = problems.laplacian_dirichlet_2d(24, dtype=np.float64).to_scipy()
    n = A.shape[0]
    d = 10.0 ** rng.uniform(-8, 8, size=n)
    As = sp.csr_matrix(sp.diags(d) @ A @ sp.diags(d))
    F = factorize(As, dtype=np.float64)
    assert F.rs is not None
    x_true = rng.normal(size=(n, 4))
    b = As @ x_true
    x = np.asarray(lu_solve(F, jnp.asarray(b)))
    # compare through the residual (columns of x_true are wildly scaled)
    r = As @ x - b
    rel = np.linalg.norm(r) / np.linalg.norm(b)
    assert rel < 1e-10

    # without equilibration the f32-factor route degrades on this operator
    F32 = factorize(As, dtype=np.float32, equilibrate=True)
    x32 = np.asarray(lu_solve(F32, jnp.asarray(b).astype(np.float32)))
    rel32 = np.linalg.norm(As @ x32.astype(np.float64) - b) / np.linalg.norm(b)
    assert rel32 < 1e-4
