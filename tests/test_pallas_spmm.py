"""Pallas DIA SpMM kernels vs the XLA reference (interpret mode on CPU).

Kernel cross-checking by redundancy, the reference's own verification style
(src/dune-eigensolver.cc:186-288 runs naive vs blocked vs SIMD variants on
identical seeded input).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dune_eigensolver_tpu.kernels.dia_spmm import (
    PaddedLayout,
    dia_spmm_t_pallas,
    dia_spmm_t_pallas_padded,
    dia_spmm_t_xla,
)
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix
from dune_eigensolver_tpu.sparse.spmm import spmm


def _problem(N=24, m=8, dtype=np.float32):
    A = problems.laplacian_dirichlet_2d(N, dtype=dtype)
    n = A.shape[0]
    Xt = jax.random.normal(jax.random.PRNGKey(3), (m, n), dtype=dtype)
    return A, Xt


def test_xla_t_matches_spmm():
    A, Xt = _problem()
    Y1 = dia_spmm_t_xla(A, Xt)
    Y2 = spmm(A, Xt.T).T
    np.testing.assert_allclose(np.asarray(Y1), np.asarray(Y2), rtol=1e-5, atol=1e-5)


def test_pallas_matches_xla_interpret():
    A, Xt = _problem()
    Y1 = dia_spmm_t_pallas(A, Xt, tile=256, interpret=True)
    Y2 = dia_spmm_t_xla(A, Xt)
    np.testing.assert_allclose(np.asarray(Y1), np.asarray(Y2), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("tile", [256, 512])
def test_pallas_padded_matches_xla_interpret(tile):
    A, Xt = _problem()
    m, n = Xt.shape
    L = PaddedLayout(n, m, A.offsets, tile=tile)
    Xp = L.pad(Xt)
    Yp = dia_spmm_t_pallas_padded(A, Xp, L, interpret=True)
    Y2 = dia_spmm_t_xla(A, Xt)
    np.testing.assert_allclose(
        np.asarray(L.unpad(Yp)), np.asarray(Y2), rtol=1e-5, atol=1e-5
    )
    # halo and tail stay zero so applications chain without re-padding
    Yp_np = np.asarray(Yp)
    interior = np.zeros(Yp_np.shape, dtype=bool)
    interior[:m, L.G : L.G + n] = True
    assert np.all(Yp_np[~interior] == 0.0)


def test_padded_operator_persistent():
    # the hot-path API: pad the operator once, chain padded_spmm calls
    from dune_eigensolver_tpu.kernels.dia_spmm import padded_spmm

    A, Xt = _problem(N=16)
    m, n = Xt.shape
    L = PaddedLayout(n, m, A.offsets, tile=256)
    Ap = L.pad_operator(A)
    Yp = padded_spmm(Ap, L.pad(Xt), interpret=True)
    Zp = padded_spmm(Ap, Yp, interpret=True)
    Z2 = dia_spmm_t_xla(A, dia_spmm_t_xla(A, Xt))
    np.testing.assert_allclose(
        np.asarray(L.unpad(Zp)), np.asarray(Z2), rtol=1e-4, atol=1e-4
    )
    # diagonal helpers
    np.testing.assert_allclose(
        np.asarray(Ap.diagonal()), np.asarray(A.diagonal()), rtol=1e-6
    )
    pd = np.asarray(Ap.padded_diagonal(fill=1.0))
    assert pd.shape == (L.width,)
    np.testing.assert_allclose(pd[L.G : L.G + n], np.asarray(A.diagonal()), rtol=1e-6)
    assert np.all(pd[: L.G] == 1.0) and np.all(pd[L.G + n :] == 1.0)


def test_padded_layout_shared_between_operators():
    # generalized solve: A' and B share one layout built from offset union
    A, Xt = _problem(N=16)
    m, n = Xt.shape
    B = problems.laplacian_b_2d(16, 3, dtype=np.float32)
    from dune_eigensolver_tpu.kernels.dia_spmm import padded_spmm

    union = tuple(sorted(set(A.offsets) | set(B.offsets)))
    L = PaddedLayout(n, m, union, tile=256)
    Ap, Bp = L.pad_operator(A), L.pad_operator(B)
    Xp = L.pad(Xt)
    for op, ref in ((Ap, A), (Bp, B)):
        Yp = padded_spmm(op, Xp, interpret=True)
        np.testing.assert_allclose(
            np.asarray(L.unpad(Yp)),
            np.asarray(dia_spmm_t_xla(ref, Xt)),
            rtol=1e-5,
            atol=1e-5,
        )


def test_pallas_padded_chains():
    # Y = A (A X): chain two padded applications, compare against XLA twice
    A, Xt = _problem(N=16)
    m, n = Xt.shape
    L = PaddedLayout(n, m, A.offsets, tile=256)
    Yp = dia_spmm_t_pallas_padded(A, L.pad(Xt), L, interpret=True)
    Zp = dia_spmm_t_pallas_padded(A, Yp, L, interpret=True)
    Z2 = dia_spmm_t_xla(A, dia_spmm_t_xla(A, Xt))
    np.testing.assert_allclose(
        np.asarray(L.unpad(Zp)), np.asarray(Z2), rtol=1e-4, atol=1e-4
    )


def test_pallas_padded_odd_n():
    # n not a multiple of the tile: tail padding must stay inert
    dtype = np.float32
    rng = np.random.default_rng(0)
    n, m = 300, 8
    import scipy.sparse as sp

    from dune_eigensolver_tpu.sparse.formats import dia_from_scipy

    S = sp.diags(
        [rng.standard_normal(n - 2), rng.standard_normal(n), rng.standard_normal(n - 2)],
        [-2, 0, 2],
    ).tocsr()
    A = dia_from_scipy(S, dtype=dtype)
    Xt = jax.random.normal(jax.random.PRNGKey(7), (m, n), dtype=dtype)
    L = PaddedLayout(n, m, A.offsets, tile=128)
    Yp = dia_spmm_t_pallas_padded(A, L.pad(Xt), L, interpret=True)
    Y2 = dia_spmm_t_xla(A, Xt)
    np.testing.assert_allclose(
        np.asarray(L.unpad(Yp)), np.asarray(Y2), rtol=1e-4, atol=1e-4
    )


def test_pallas_grouped_matches_xla_2d():
    from dune_eigensolver_tpu.kernels.dia_spmm import dia_spmm_t_pallas_grouped

    A, Xt = _problem(N=24)
    Y1 = dia_spmm_t_pallas_grouped(A, Xt, tile=256, interpret=True)
    Y2 = dia_spmm_t_xla(A, Xt)
    np.testing.assert_allclose(np.asarray(Y1), np.asarray(Y2), rtol=1e-5, atol=1e-5)


def test_pallas_grouped_matches_xla_3d():
    # wide-band clusters: offsets {-N^2}, {-N..N}, {+N^2}
    from dune_eigensolver_tpu.kernels.dia_spmm import dia_spmm_t_pallas_grouped

    N, m = 8, 8
    A = problems.laplacian_dirichlet_3d(N, dtype=np.float32)
    n = A.shape[0]
    Xt = jax.random.normal(jax.random.PRNGKey(5), (m, n), dtype=np.float32)
    Y1 = dia_spmm_t_pallas_grouped(A, Xt, tile=128, interpret=True)
    Y2 = dia_spmm_t_xla(A, Xt)
    np.testing.assert_allclose(np.asarray(Y1), np.asarray(Y2), rtol=1e-5, atol=1e-5)


def test_pallas_grouped_odd_sizes():
    from dune_eigensolver_tpu.kernels.dia_spmm import dia_spmm_t_pallas_grouped

    N, m = 7, 8  # n = 343, not tile-aligned
    A = problems.laplacian_dirichlet_3d(N, dtype=np.float32)
    n = A.shape[0]
    Xt = jax.random.normal(jax.random.PRNGKey(6), (m, n), dtype=np.float32)
    Y1 = dia_spmm_t_pallas_grouped(A, Xt, tile=128, interpret=True)
    Y2 = dia_spmm_t_xla(A, Xt)
    np.testing.assert_allclose(np.asarray(Y1), np.asarray(Y2), rtol=1e-4, atol=1e-4)
