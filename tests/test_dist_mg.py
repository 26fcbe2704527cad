"""Distributed geometric-multigrid preconditioner (dist/mg.py) on the
simulated 8-device CPU mesh: the sharded V-cycle is mathematically identical
to the single-chip cycle (partitioned fine smoothing + local semi-coarsening
+ one all_gather + replicated coarse levels), so the MG-preconditioned
sharded LOBPCG must agree with the single-chip MG solve and the oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from dune_eigensolver_tpu.dist import make_mesh, sharded_lobpcg_generalized
from dune_eigensolver_tpu.factorize import mg_inverse_factory
from dune_eigensolver_tpu.oracle import eigenvalues_laplace_dirichlet_2d
from dune_eigensolver_tpu.oracle.analytic import (
    eigenvalues_laplace_dirichlet_3d,
)
from dune_eigensolver_tpu.solvers import lobpcg_generalized
from dune_eigensolver_tpu.sparse import problems

TOL = 2e-3


def _identity_b(A):
    return problems.identity_on_pattern(A)


def test_sharded_mg_3d_matches_analytic_and_single_chip():
    # N=32 -> n=32768, 4 z-planes per shard on the 8-device mesh
    N = 32
    A = problems.laplacian_dirichlet_3d(N, dtype=np.float32)
    B = _identity_b(A)
    kw = dict(nev=4, tol=1e-5, maxiter=200, shift=1e-3)
    res_s = sharded_lobpcg_generalized(
        A, B, mesh=make_mesh(8), precond="mg", **kw
    )
    res_1 = lobpcg_generalized(
        A, B, precond=mg_inverse_factory(nu1=1, nu2=1), **kw
    )
    ana = eigenvalues_laplace_dirichlet_3d(N, count=4)
    ev_s = np.sort(np.asarray(res_s.eigenvalues))[:4]
    ev_1 = np.sort(np.asarray(res_1.eigenvalues))[:4]
    assert np.abs(ev_s - ana).max() < TOL
    assert np.abs(ev_s - ev_1).max() < TOL


def test_sharded_mg_2d_bf16_smoothing():
    # 2D slab partitioning (y-axis), bf16 fine smoothing — the pod-scale
    # form of the north-star recipe knobs (prec_dtype + ortho_block)
    N = 32
    A = problems.laplacian_dirichlet_2d(N, dtype=np.float32)
    B = _identity_b(A)
    res = sharded_lobpcg_generalized(
        A,
        B,
        nev=4,
        tol=1e-5,
        maxiter=300,
        shift=1e-3,
        mesh=make_mesh(8),
        precond="mg",
        prec_dtype=jnp.bfloat16,
        ortho_block=8,
    )
    ana = eigenvalues_laplace_dirichlet_2d(N)[:4]
    ev = np.sort(np.asarray(res.eigenvalues))[:4]
    assert np.abs(ev - ana).max() < TOL


def test_sharded_mg_rejects_bad_geometry():
    # unstructured offsets -> clean ValueError (not a shard_map trace error)
    N = 16
    A = problems.laplacian_neumann_2d(N, dtype=np.float32)
    B = problems.laplacian_b_2d(N, 3, dtype=np.float32)
    # 2D grid is structured, but 16 planes over 8 shards = 2 < 4 per shard
    with pytest.raises(ValueError, match="planes"):
        sharded_lobpcg_generalized(
            A, B, nev=4, tol=1e-4, maxiter=50, shift=1e-3,
            mesh=make_mesh(8), precond="mg",
        )
    # non-divisible n -> identity pad rows would break the grid
    A3 = problems.laplacian_dirichlet_3d(9, dtype=np.float32)  # n=729
    with pytest.raises(ValueError, match="pad|planes"):
        sharded_lobpcg_generalized(
            A3, _identity_b(A3), nev=2, tol=1e-4, maxiter=50, shift=1e-3,
            mesh=make_mesh(8), precond="mg",
        )
