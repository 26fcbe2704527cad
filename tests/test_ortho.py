"""Orthonormalization property tests: ||Q^T Q - I||, ||Q^T B Q - I||, span
preservation, and the loss-of-orthogonality monitor (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dune_eigensolver_tpu.ops.ortho import (
    b_orthonormalize_blocked,
    dot_products_all,
    dot_products_diagonal,
    orthonormalize_blocked,
)
from dune_eigensolver_tpu.sparse import problems


def test_dot_products(rng):
    Q1 = jnp.asarray(rng.normal(size=(50, 16)))
    Q2 = jnp.asarray(rng.normal(size=(50, 16)))
    d = dot_products_diagonal(Q1, Q2)
    assert np.allclose(np.asarray(d), np.diag(np.asarray(Q1).T @ np.asarray(Q2)))
    G = dot_products_all(Q1, Q2)
    assert np.allclose(np.asarray(G), np.asarray(Q1).T @ np.asarray(Q2))


@pytest.mark.parametrize("m,block", [(8, 8), (16, 8), (32, 8), (24, 4)])
def test_orthonormalize_blocked(rng, m, block):
    X = jnp.asarray(rng.normal(size=(200, m)))
    Q = orthonormalize_blocked(X, block=block)
    G = np.asarray(Q).T @ np.asarray(Q)
    assert np.abs(G - np.eye(m)).max() < 1e-12
    # same progressive span: each block of Q spans the same space as X's
    for bk in range(0, m, block):
        PX = np.linalg.qr(np.asarray(X)[:, : bk + block])[0]
        proj = PX @ (PX.T @ np.asarray(Q)[:, : bk + block])
        assert np.abs(proj - np.asarray(Q)[:, : bk + block]).max() < 1e-10


def test_orthonormalize_equals_qr_sign(rng):
    # blocked Cholesky-QR must equal the thin-QR Q factor up to column signs
    # chosen positive-diagonal (the reference's U D^-1/2 trick gives the same)
    X = jnp.asarray(rng.normal(size=(64, 8)))
    Q = np.asarray(orthonormalize_blocked(X, block=8))
    Qr, Rr = np.linalg.qr(np.asarray(X))
    signs = np.sign(np.diag(Rr))
    assert np.abs(Qr * signs - Q).max() < 1e-10


def test_orthonormalize_f32_two_iterations(rng):
    X = jnp.asarray(rng.normal(size=(5000, 32)), dtype=jnp.float32)
    # make it ill-conditioned
    X = X.at[:, 1].set(X[:, 0] + 1e-3 * X[:, 1])
    Q = orthonormalize_blocked(X, block=8, iterations=2)
    G = np.asarray(Q, dtype=np.float64).T @ np.asarray(Q, dtype=np.float64)
    assert np.abs(G - np.eye(32)).max() < 1e-5


def test_b_orthonormalize(rng):
    N = 12
    B = problems.laplacian_neumann_2d(N)  # SPD-ish; strictly s.p.s.d with pos diag
    Bd = B.to_scipy().toarray() + np.eye(N * N) * 0.1
    import scipy.sparse as sp

    from dune_eigensolver_tpu.sparse.formats import dia_from_scipy

    Bm = dia_from_scipy(sp.csr_matrix(Bd))
    X = jnp.asarray(rng.normal(size=(N * N, 16)))
    Q, norm = b_orthonormalize_blocked(Bm, X, block=8)
    G = np.asarray(Q).T @ Bd @ np.asarray(Q)
    assert np.abs(G - np.eye(16)).max() < 1e-10
    assert float(norm) > 0.0  # monitor saw nonzero off-diagonal couplings


def test_b_orthonormalize_identity_matches_plain(rng):
    n, m = 120, 16
    X = jnp.asarray(rng.normal(size=(n, m)))
    Q1 = orthonormalize_blocked(X, block=8)
    Q2, _ = b_orthonormalize_blocked(lambda V: V, X, block=8)
    assert np.abs(np.asarray(Q1) - np.asarray(Q2)).max() < 1e-10


def test_orthonormalize_under_jit(rng):
    X = jnp.asarray(rng.normal(size=(100, 16)))
    Q = jax.jit(lambda x: orthonormalize_blocked(x, block=8))(X)
    G = np.asarray(Q).T @ np.asarray(Q)
    assert np.abs(G - np.eye(16)).max() < 1e-12


def test_b_orthonormalize_single_block_fast_path(rng):
    # nb == 1 takes the whole-multivector CholeskyQR fast path (no prefix
    # buffer); it must produce B-orthonormal vectors and the same first-sweep
    # mass diagnostics as the definitionally-equivalent m == block sweep.
    from dune_eigensolver_tpu.ops.ortho import b_orthonormalize_blocked_t
    from dune_eigensolver_tpu.sparse import problems

    B = problems.laplacian_b_2d(10, overlap=3)
    n = B.shape[0]
    Xt = jnp.asarray(rng.normal(size=(8, n)))
    Q, norm, mass = b_orthonormalize_blocked_t(
        B, Xt, block=8, iterations=2, eps=1e-12, return_mass=True
    )
    Bd = B.to_scipy().toarray().astype(np.float64)
    Qn = np.asarray(Q, dtype=np.float64)
    G = Qn @ Bd @ Qn.T
    # B is semidefinite: only rows with real B-mass must be orthonormal
    live = np.asarray(mass) > 1e-8
    Gl = G[np.ix_(live, live)]
    assert np.abs(Gl - np.eye(Gl.shape[0])).max() < 1e-8
    assert float(norm) >= 0.0
