"""Sparse containers + SpMM vs dense/scipy reference.

Mirrors the reference's kernel cross-checking-by-redundancy strategy
(SURVEY.md §4: naive vs blocked vs SIMD on identical seeded input) — here
each container's SpMM is checked against the dense matmul.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from dune_eigensolver_tpu.sparse.formats import (
    bsr_from_scipy,
    dia_from_scipy,
    ell_from_scipy,
)
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.spmm import spmm


def _random_sparse(rng, n, density=0.05):
    A = sp.random(n, n, density=density, random_state=np.random.RandomState(7))
    A = A + sp.eye(n) * 2.0
    return sp.csr_matrix(A)


def test_dia_roundtrip_and_spmm(rng):
    A = _random_sparse(rng, 64)
    Ad = dia_from_scipy(A)
    assert np.allclose(Ad.to_scipy().toarray(), A.toarray())
    X = rng.normal(size=(64, 8))
    Y = spmm(Ad, jnp.asarray(X))
    assert np.allclose(np.asarray(Y), A @ X)


def test_ell_roundtrip_and_spmm(rng):
    A = _random_sparse(rng, 96)
    Ae = ell_from_scipy(A)
    assert np.allclose(Ae.to_scipy().toarray(), A.toarray())
    assert Ae.nnz == A.nnz
    X = rng.normal(size=(96, 16))
    Y = spmm(Ae, jnp.asarray(X))
    assert np.allclose(np.asarray(Y), A @ X)


@pytest.mark.parametrize("block", [(2, 2), (3, 3), (4, 4)])
def test_bsr_roundtrip_and_spmm(rng, block):
    br = block[0]
    nb = 24
    n = nb * br
    # block-structured elasticity-type operator
    dense = np.zeros((n, n))
    for i in range(nb):
        dense[i * br : (i + 1) * br, i * br : (i + 1) * br] = (
            rng.normal(size=(br, br)) + np.eye(br) * 5
        )
        if i + 1 < nb:
            blk = rng.normal(size=(br, br)) * 0.3
            dense[i * br : (i + 1) * br, (i + 1) * br : (i + 2) * br] = blk
            dense[(i + 1) * br : (i + 2) * br, i * br : (i + 1) * br] = blk.T
    A = sp.csr_matrix(dense)
    Ab = bsr_from_scipy(A, block)
    assert np.allclose(Ab.to_scipy().toarray(), dense)
    X = rng.normal(size=(n, 8))
    Y = spmm(Ab, jnp.asarray(X))
    assert np.allclose(np.asarray(Y), dense @ X)


def test_laplacian_2d_matches_kron():
    N = 13
    A = problems.laplacian_dirichlet_2d(N)
    T = sp.diags([-1, 2, -1], [-1, 0, 1], shape=(N, N))
    ref = sp.kron(sp.eye(N), T) + sp.kron(T, sp.eye(N))
    assert np.allclose(A.to_scipy().toarray(), ref.toarray())


def test_laplacian_neumann_diag():
    N = 9
    A = problems.laplacian_neumann_2d(N).to_scipy().toarray()
    off = A - np.diag(np.diag(A))
    assert np.allclose(np.diag(A), np.abs(off.sum(axis=1)))


def test_laplacian_b_partition_of_unity():
    N, overlap = 12, 3
    B = problems.laplacian_b_2d(N, overlap)
    A = problems.laplacian_dirichlet_2d(N).to_scipy().toarray()
    pu = problems.partition_of_unity_2d(N, overlap)
    assert np.allclose(B.to_scipy().toarray(), A * np.outer(pu, pu))
    # boundary rows are identically zero (the reference notes "WHY IS B
    # MATRIX ZERO?" near boundaries, src/dune-eigensolver.cc:542)
    assert np.allclose(B.to_scipy().toarray()[0], 0.0)


def test_identity_on_pattern():
    A = problems.laplacian_dirichlet_2d(7)
    I = problems.identity_on_pattern(A)
    assert np.allclose(I.to_scipy().toarray(), np.eye(49))


def test_laplacian_3d_matches_kron():
    N = 5
    A = problems.laplacian_dirichlet_3d(N, dtype=np.float64)
    T = sp.diags([-1, 2, -1], [-1, 0, 1], shape=(N, N))
    I = sp.eye(N)
    ref = (
        sp.kron(sp.kron(I, I), T)
        + sp.kron(sp.kron(I, T), I)
        + sp.kron(sp.kron(T, I), I)
    )
    assert np.allclose(A.to_scipy().toarray(), ref.toarray())


def test_dia_axpy_and_shift():
    N = 8
    A = problems.laplacian_neumann_2d(N)
    B = problems.laplacian_b_2d(N, 2)
    C = A.axpy(0.1, B)
    assert np.allclose(
        C.to_scipy().toarray(), A.to_scipy().toarray() + 0.1 * B.to_scipy().toarray()
    )
    D = A.with_shifted_diagonal(2.5)
    assert np.allclose(D.to_scipy().toarray(), A.to_scipy().toarray() + 2.5 * np.eye(64))
