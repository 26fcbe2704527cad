"""Distributed GENERAL-sparsity execution (dist/windowed.py): the windowed
vreg-gather kernel under shard_map — the reference's native CSR/BCRS operand
class (kernels_cpp.hh:626-657) at multi-chip scale (a capability the
reference lacks entirely: MPI disabled, src/dune-eigensolver.cc:742-748)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dune_eigensolver_tpu.dist import (
    make_mesh,
    sharded_lobpcg_general,
    sharded_standard_largest_general,
    windowed_shard_plan,
)
from dune_eigensolver_tpu.dist.mesh import ROW_AXIS
from dune_eigensolver_tpu.dist.windowed import (
    _plan_arrays,
    _plan_specs,
    _shard_container,
    _shard_diag,
    windowed_spmm_halo_t,
)
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import ell_from_scipy


def _random_sym_csr(n, avg_nnz, seed, bw=200):
    """Random banded symmetric diagonally-dominant SPD matrix — the shape
    a general FEM/graph operator takes AFTER an RCM ordering (bounded
    bandwidth, irregular within-band pattern)."""
    g = np.random.default_rng(seed)
    nnz = avg_nnz * n // 2
    r = g.integers(0, n, nnz)
    c = np.clip(r + g.integers(-bw, bw + 1, nnz), 0, n - 1)
    v = -np.abs(g.normal(size=nnz))
    # a path graph underneath keeps the operator connected (no isolated
    # rows -> no high-multiplicity degenerate eigenvalues that iterative
    # solvers cannot fully resolve)
    i = np.arange(n - 1)
    r = np.concatenate([r, i])
    c = np.concatenate([c, i + 1])
    v = np.concatenate([v, -np.ones(n - 1)])
    S = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
    S = S + S.T
    S = S - sp.diags(S.diagonal())
    S = S + sp.diags(np.asarray(-S.sum(axis=1)).ravel() + 0.5)
    return sp.csr_matrix(S).astype(np.float32)


@pytest.mark.parametrize("ndev", [1, 2, 4])
def test_windowed_shard_spmm_matches_global(ndev):
    n = 4096
    S = _random_sym_csr(n, 7, seed=2)
    plan = windowed_shard_plan(S, ndev, tile=512)
    mesh = make_mesh(ndev)
    axis = ROW_AXIS
    rng = np.random.default_rng(0)
    m = 8
    Xt = rng.normal(size=(m, n)).astype(np.float32)
    Xsh = jax.device_put(
        jnp.asarray(Xt), NamedSharding(mesh, P(None, axis))
    )

    def local(x, *arrs):
        op = _shard_container(plan, arrs)
        return windowed_spmm_halo_t(plan, op, x, axis=axis, interpret=True)

    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis),) + _plan_specs(axis),
            out_specs=P(None, axis),
            check_vma=False,
        )
    )
    Y = np.asarray(fn(Xsh, *_plan_arrays(plan)))
    Yref = (S @ Xt.T).T
    assert np.abs(Y - Yref).max() / np.abs(Yref).max() < 1e-5


def test_windowed_shard_diag():
    n = 2048
    S = _random_sym_csr(n, 6, seed=3)
    ndev = 4
    plan = windowed_shard_plan(S, ndev, tile=512)
    d_ref = S.diagonal()
    for i in range(ndev):
        arrs = tuple(np.asarray(a)[i : i + 1] for a in _plan_arrays(plan))
        op = _shard_container(plan, tuple(jnp.asarray(a) for a in arrs))
        d = np.asarray(_shard_diag(plan, op))
        np.testing.assert_allclose(
            d, d_ref[i * plan.nloc : (i + 1) * plan.nloc], rtol=1e-6
        )


def test_sharded_largest_general_matches_single_chip():
    # same seed/semantics as the single-chip solver on the same operator
    from dune_eigensolver_tpu.solvers import standard_largest

    n = 2048
    S = _random_sym_csr(n, 6, seed=4)
    A = ell_from_scipy(S, dtype=np.float32)
    res_s = sharded_standard_largest_general(
        S, nev=4, tol=1e-10, maxiter=800, mesh=make_mesh(4), tile=512
    )
    res_1 = standard_largest(
        A, nev=4, tol=1e-10, maxiter=800, force_padded=False
    )
    ev_s = np.asarray(res_s.eigenvalues)
    ev_1 = np.asarray(res_1.eigenvalues)
    assert res_s.eigenvectors.shape == (n, 4)
    assert np.abs(ev_s - ev_1).max() < 1e-4, (ev_s, ev_1)


def test_sharded_lobpcg_general_vs_oracle():
    from dune_eigensolver_tpu.oracle.scipy_oracle import smallest_standard

    n = 2000
    S = _random_sym_csr(n, 6, seed=5)
    ref, _ = smallest_standard(S, nev=4, sigma=-1e-3, tol=1e-10)
    res = sharded_lobpcg_general(
        S, nev=4, tol=1e-5, maxiter=300, shift=1e-3, mesh=make_mesh(4),
        tile=512, cg_rtol=1e-2, cg_maxiter=25,
    )
    ev = np.sort(np.asarray(res.eigenvalues))[:4]
    assert np.abs(ev - ref).max() / np.abs(ref).max() < 5e-3, (ev, ref)


def test_sharded_lobpcg_general_with_mass_matrix():
    # generalized pencil: GenEO pair converted to the general containers
    from dune_eigensolver_tpu.oracle.scipy_oracle import smallest_generalized
    from dune_eigensolver_tpu.sparse.formats import dia_from_scipy

    N = 32
    A = problems.laplacian_neumann_2d(N, dtype=np.float32)
    B = problems.laplacian_b_2d(N, 3, dtype=np.float32)
    Sa, Sb = A.to_scipy(), B.to_scipy()
    ref, _ = smallest_generalized(A, B, nev=4, sigma=-1e-3, tol=1e-10)
    res = sharded_lobpcg_general(
        Sa, Sb, nev=4, tol=1e-6, maxiter=400, shift=1e-3, mesh=make_mesh(4),
        tile=128, cg_rtol=1e-3, cg_maxiter=100,
    )
    ev = np.sort(np.asarray(res.eigenvalues))[:4]
    scale = max(abs(float(ref.max())), 1e-12)
    assert np.abs(ev - ref).max() / scale < 2e-2, (ev, ref)


def test_windowed_shard_plan_validation():
    S = _random_sym_csr(1000, 6, seed=6)
    with pytest.raises(ValueError, match="divisible"):
        windowed_shard_plan(S, 3)
    # bandwidth > nloc
    i = np.arange(1024)
    Sw = sp.coo_matrix(
        (
            np.ones(2 * 1024, np.float32),
            (
                np.concatenate([i, i]),
                np.concatenate([i, np.clip(i + 700, 0, 1023)]),
            ),
        ),
        shape=(1024, 1024),
    ).tocsr()
    with pytest.raises(ValueError, match="bandwidth"):
        windowed_shard_plan(Sw, 4)


def test_sharded_generalized_inverse_general_vs_oracle():
    from dune_eigensolver_tpu.dist import sharded_generalized_inverse_general
    from dune_eigensolver_tpu.oracle.scipy_oracle import smallest_generalized

    N = 32
    A = problems.laplacian_neumann_2d(N, dtype=np.float32)
    B = problems.laplacian_b_2d(N, 3, dtype=np.float32)
    Sa, Sb = A.to_scipy(), B.to_scipy()
    ref, _ = smallest_generalized(A, B, nev=4, sigma=-1e-3, tol=1e-10)
    res = sharded_generalized_inverse_general(
        Sa, Sb, nev=4, tol=1e-5, maxiter=60, shift=1e-3, mesh=make_mesh(4),
        tile=128, cg_rtol=1e-8, cg_maxiter=400,
    )
    ev = np.sort(np.asarray(res.eigenvalues))[:4]
    scale = max(abs(float(ref.max())), 1e-12)
    assert np.abs(ev - ref).max() / scale < 2e-2, (ev, ref)
    # matches the single-chip generalized_inverse on the same pencil
    from dune_eigensolver_tpu.solvers import generalized_inverse

    res_1 = generalized_inverse(
        A, B, nev=4, tol=1e-5, maxiter=60, shift=1e-3
    )
    ev_1 = np.sort(np.asarray(res_1.eigenvalues))[:4]
    assert np.abs(ev - ev_1).max() / scale < 2e-2, (ev, ev_1)
