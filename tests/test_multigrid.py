"""Geometric multigrid (factorize/multigrid.py): grid detection, transfer
adjointness, V-cycle contraction, mg-CG convergence, and solver integration
(incl. the guarded Pallas layout via force_padded interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dune_eigensolver_tpu.factorize import (
    default_inverse_factory,
    mg_cg_inverse_factory,
    mg_inverse_factory,
)
from dune_eigensolver_tpu.factorize.multigrid import (
    _prolong,
    _restrict,
    detect_grid_dims,
)
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix
from dune_eigensolver_tpu.sparse.spmm import spmm_t


def test_detect_grid_dims():
    A3 = problems.laplacian_dirichlet_3d(12, dtype=np.float64)
    assert detect_grid_dims(A3.offsets, A3.shape[0]) == (12, 12, 12)
    A2 = problems.laplacian_dirichlet_2d(20, dtype=np.float64)
    assert detect_grid_dims(A2.offsets, A2.shape[0]) == (20, 20)
    Ar = problems.laplacian_dirichlet_rect(16, 10, dtype=np.float64)
    assert detect_grid_dims(Ar.offsets, Ar.shape[0]) == (10, 16)
    # asymmetric / unstructured patterns are rejected
    assert detect_grid_dims((-3, 0, 1), 30) is None
    assert detect_grid_dims((0, 1, 2, -1, -2), 16) is None
    assert detect_grid_dims((-25, -1, 0, 1, 24), 576) is None


@pytest.mark.parametrize("dims", [(16, 16), (13, 9), (10, 11, 12)])
def test_transfer_adjointness(dims, rng):
    """R = 2^-d P^T: <R r, c> == 2^-d <r, P c> for random r, c — the
    symmetry requirement that keeps the V-cycle SPD inside CG/LOBPCG."""
    d = len(dims)
    cdims = tuple(x // 2 for x in dims)
    r = jnp.asarray(rng.standard_normal((2,) + dims))
    c = jnp.asarray(rng.standard_normal((2,) + cdims))
    lhs = float(jnp.sum(_restrict(r) * c))
    rhs = float(jnp.sum(r * _prolong(c, dims))) * 0.5**d
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))


def test_vcycle_contracts_3d(rng):
    """Stationary V(2,2) iteration contracts the residual at the damped-
    Jacobi textbook rate (~0.55/cycle in 3D), mesh-independently."""
    A = problems.laplacian_dirichlet_3d(16, dtype=np.float64)
    b = jnp.asarray(rng.standard_normal((4, A.shape[0])))
    aux, fn = mg_inverse_factory()(A)
    x = jnp.zeros_like(b)
    for _ in range(8):
        x = x + fn(aux, b - spmm_t(A, x))
    rho = (
        float(jnp.linalg.norm(b - spmm_t(A, x)) / jnp.linalg.norm(b))
        ** (1 / 8)
    )
    assert rho < 0.7


def test_vcycle_contracts_2d_odd_levels(rng):
    """2D with odd level sizes (27 -> 13 -> 6) exercises the 2M+1
    prolongation tail branch."""
    A = problems.laplacian_dirichlet_2d(27, dtype=np.float64)
    b = jnp.asarray(rng.standard_normal((2, A.shape[0])))
    aux, fn = mg_inverse_factory()(A)
    x = jnp.zeros_like(b)
    for _ in range(8):
        x = x + fn(aux, b - spmm_t(A, x))
    rho = (
        float(jnp.linalg.norm(b - spmm_t(A, x)) / jnp.linalg.norm(b))
        ** (1 / 8)
    )
    assert rho < 0.7


def test_mg_cg_solves_shifted(rng):
    """V-cycle-preconditioned CG hits a tight tolerance on the shifted
    operator (sigma held fixed across levels)."""
    A = problems.laplacian_dirichlet_3d(12, dtype=np.float64)
    A = A.with_shifted_diagonal(0.37)  # sigma = 0.37
    b = jnp.asarray(rng.standard_normal((4, A.shape[0])))
    aux, fn = mg_cg_inverse_factory(rtol=1e-10, maxiter=60)(A)
    Y = fn(aux, b)
    rel = float(jnp.linalg.norm(spmm_t(A, Y) - b) / jnp.linalg.norm(b))
    assert rel < 1e-8


def test_mg_rejects_unstructured():
    # non-DIA operand (ELL)
    A_ell = problems.unstructured_laplacian(200, seed=3, dtype=np.float64)
    with pytest.raises(ValueError):
        mg_inverse_factory()(A_ell)
    # DIA but a plain 1D penta-band, not a grid stencil
    n = 64
    A_band = DIAMatrix(
        data=jnp.ones((5, n)), offsets=(-2, -1, 0, 1, 2), shape=(n, n)
    )
    with pytest.raises(ValueError):
        mg_inverse_factory()(A_band)


def test_lobpcg_mg_matches_analytic():
    from dune_eigensolver_tpu.oracle.analytic import (
        eigenvalues_laplace_dirichlet_3d,
    )
    from dune_eigensolver_tpu.solvers import lobpcg_generalized

    N = 16
    A = problems.laplacian_dirichlet_3d(N, dtype=np.float32)
    n = A.shape[0]
    B = DIAMatrix(data=jnp.ones((1, n), np.float32), offsets=(0,), shape=A.shape)
    res = lobpcg_generalized(
        A, B, nev=8, tol=2e-3, maxiter=200, shift=0.0,
        precond=mg_inverse_factory(), min_iter=3,
    )
    ana = eigenvalues_laplace_dirichlet_3d(N, count=8)
    ev = np.asarray(res.eigenvalues)
    assert bool(res.converged)
    assert np.max(np.abs(ev - ana) / ana) < 5e-3


def test_lobpcg_mg_padded_layout():
    """force_padded=True runs the guarded PaddedDIA engine (Pallas interpret
    mode): the fine level smooths through the guarded layout (G > 0) and the
    restriction slices logical rows out of it."""
    from dune_eigensolver_tpu.oracle.analytic import (
        eigenvalues_laplace_dirichlet_3d,
    )
    from dune_eigensolver_tpu.solvers import lobpcg_generalized

    N = 10
    A = problems.laplacian_dirichlet_3d(N, dtype=np.float32)
    n = A.shape[0]
    B = DIAMatrix(data=jnp.ones((1, n), np.float32), offsets=(0,), shape=A.shape)
    res = lobpcg_generalized(
        A, B, nev=4, tol=2e-3, maxiter=200, shift=0.0,
        precond=mg_inverse_factory(), min_iter=3, force_padded=True,
    )
    ana = eigenvalues_laplace_dirichlet_3d(N, count=4)
    ev = np.asarray(res.eigenvalues)
    assert bool(res.converged)
    assert np.max(np.abs(ev - ana) / ana) < 5e-3


def test_default_factory_routes_structured_wide_band():
    """Wide-band structured stencils route to mg-CG in the default factory
    and the shift-invert solver still converges through it."""
    from dune_eigensolver_tpu.oracle.analytic import (
        eigenvalues_laplace_dirichlet_3d,
    )
    from dune_eigensolver_tpu.solvers import generalized_inverse

    N = 12
    A = problems.laplacian_dirichlet_3d(N, dtype=np.float64)
    n = A.shape[0]
    B = DIAMatrix(data=jnp.ones((1, n), np.float64), offsets=(0,), shape=A.shape)
    res = generalized_inverse(
        A, B, nev=4, tol=1e-6, maxiter=200, shift=1e-3,
        inverse=default_inverse_factory,
    )
    ana = eigenvalues_laplace_dirichlet_3d(N, count=4)
    ev = np.asarray(res.eigenvalues)
    assert np.max(np.abs(ev - ana) / ana) < 1e-4
