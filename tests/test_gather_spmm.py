"""Windowed-gather Pallas SpMM (general ELL / block-ELL sparsity) and the
non-stencil end-to-end solves it enables.

The reference's kernels stream arbitrary CSR/BCRS patterns
(kernels_cpp.hh:626-657, blocks umfpacktools.hh:57-95); these tests pin the
TPU equivalent: kernel-vs-XLA equality on RCM-ordered unstructured
operators, container round-trips, operand-pair width matching, and
eigen-solves on elasticity (BSR 2x2) and unstructured-graph (ELL) operators
validated against the scipy/ARPACK oracle — the reference's three-way
protocol (src/dune-eigensolver.cc:528-617) on non-stencil operands.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from dune_eigensolver_tpu.kernels.gather_spmm import (
    WindowedBSR,
    WindowedELL,
    make_windowed_operands,
    windowed_from_bsr,
    windowed_from_ell,
    windowed_spmm_t,
)
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import (
    bsr_from_scipy,
    dia_from_scipy,
    ell_from_scipy,
)
from dune_eigensolver_tpu.sparse.reorder import rcm_pencil, unpermute_vectors
from dune_eigensolver_tpu.sparse.spmm import bsr_spmm_t, ell_spmm_t

TOL = 2e-3


def _random_sym_csr(n, avg_nnz, seed):
    """Random sparse SPD (weighted-graph-Laplacian-like: -|w| off-diagonal,
    diagonally dominant), RCM-ordered — the solver/oracle smallest-set
    semantics agree only for definite operators."""
    S = sp.random(n, n, density=avg_nnz / n, random_state=seed, format="csr")
    S = S + S.T
    S.data = -np.abs(S.data)
    S = S - sp.diags(S.diagonal())
    S = S + sp.diags(np.asarray(-S.sum(axis=1)).ravel() + 0.5)
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    perm = reverse_cuthill_mckee(sp.csr_matrix(S), symmetric_mode=True)
    return sp.csr_matrix(S)[perm][:, perm]


def test_windowed_ell_matches_xla(rng):
    S = _random_sym_csr(1500, 7, seed=0)
    A = ell_from_scipy(S, dtype=np.float32)
    W = windowed_from_ell(A, tile=512)
    m = 8
    Xt = jnp.asarray(rng.normal(size=(m, A.shape[0])).astype(np.float32))
    Xp = jnp.pad(Xt, ((0, 0), (0, W.width - A.shape[0])))
    Y = np.asarray(windowed_spmm_t(W, Xp, interpret=True))
    Yref = np.asarray(ell_spmm_t(A, Xt))
    assert np.abs(Y[:, : A.shape[0]] - Yref).max() < 1e-4
    assert np.abs(Y[:, A.shape[0] :]).max() == 0.0  # pad columns stay zero


def test_windowed_ell_out_buf_donation(rng):
    """The out_buf donation path (ping-pong buffers, no per-call copy in
    while-loop carries) must be numerically identical to the plain call."""
    S = _random_sym_csr(1000, 7, seed=3)
    A = ell_from_scipy(S, dtype=np.float32)
    W = windowed_from_ell(A, tile=512)
    Xt = jnp.asarray(rng.normal(size=(8, A.shape[0])).astype(np.float32))
    Xp = jnp.pad(Xt, ((0, 0), (0, W.width - A.shape[0])))
    dead = jnp.full_like(Xp, jnp.nan)  # donated storage; contents ignored
    Y0 = np.asarray(windowed_spmm_t(W, Xp, interpret=True))
    Y1 = np.asarray(windowed_spmm_t(W, Xp, interpret=True, out_buf=dead))
    assert np.array_equal(Y0, Y1)


@pytest.mark.parametrize("block", [(2, 2), (3, 3)])
def test_windowed_bsr_matches_xla(rng, block):
    br, _ = block
    nb = 400
    Sb = _random_sym_csr(nb, 5, seed=1)
    blockmat = rng.normal(size=(br, br))
    S = sp.csr_matrix(sp.kron(Sb, blockmat + blockmat.T + 4 * np.eye(br)))
    A = bsr_from_scipy(S, block=block, dtype=np.float32)
    W = windowed_from_bsr(A, tile=1024)
    n = A.shape[0]
    m = 8
    Xt = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    Xp = jnp.pad(Xt, ((0, 0), (0, W.width - n)))
    Y = np.asarray(windowed_spmm_t(W, Xp, interpret=True))
    Yref = np.asarray(bsr_spmm_t(A, Xt))
    assert np.abs(Y[:, :n] - Yref).max() < 1e-4
    assert np.abs(Y[:, n:]).max() == 0.0


def test_windowed_round_trip_and_diagonal(rng):
    S = _random_sym_csr(900, 6, seed=2)
    A = ell_from_scipy(S, dtype=np.float64)
    W = windowed_from_ell(A, tile=256)
    assert np.abs(np.asarray(W.diagonal()) - S.diagonal()).max() < 1e-12
    d = np.asarray(W.padded_diagonal(fill=1.0))
    assert np.all(d[A.shape[0] :] == 1.0)
    L = W.to_logical()
    Xt = jnp.asarray(rng.normal(size=(4, A.shape[0])))
    assert np.allclose(
        np.asarray(ell_spmm_t(L, Xt)), np.asarray(ell_spmm_t(A, Xt))
    )


def test_make_windowed_operands_width_match():
    # mixed pair: BSR stiffness + DIA-convertible mass must land on one width
    A, B = problems.elasticity_2d(12, dtype=np.float32)
    A_int, B_int, L = make_windowed_operands(A, B)
    assert isinstance(A_int, WindowedBSR) and isinstance(B_int, WindowedBSR)
    assert A_int.width == B_int.width == L.width
    # ELL + DIA mix
    S = _random_sym_csr(600, 5, seed=3)
    Ae = ell_from_scipy(S, dtype=np.float32)
    Bd = dia_from_scipy(sp.eye(600), dtype=np.float32)
    A2, B2, L2 = make_windowed_operands(Ae, Bd)
    assert isinstance(A2, WindowedELL) and isinstance(B2, WindowedELL)
    assert A2.width == B2.width == L2.width


def test_hybrid_tail_and_window_overflow():
    # a dense-ish random pattern (no RCM) has unbounded tile support: the
    # hybrid planner must route its entries through the COO tail (no
    # window blow-up) and stay exact
    n = 30_000
    g = np.random.default_rng(9)
    nnz = 2 * n
    S = sp.coo_matrix(
        (g.normal(size=nnz), (g.integers(0, n, nnz), g.integers(0, n, nnz))),
        shape=(n, n),
    ).tocsr()
    S = S + S.T + sp.eye(n)
    A = ell_from_scipy(S, dtype=np.float32)
    W = windowed_from_ell(A, tile=512)
    assert W.far_nnz > A.nnz // 2  # random long-range entries ride the tail
    assert W.window < 16 * 1024  # kept slots keep the window VMEM-sized
    Xt = jnp.asarray(g.normal(size=(8, n)).astype(np.float32))
    Xp = jnp.pad(Xt, ((0, 0), (0, W.width - n)))
    Y = np.asarray(windowed_spmm_t(W, Xp, interpret=True))
    Yref = np.asarray(ell_spmm_t(A, Xt))
    assert np.abs(Y[:, :n] - Yref).max() < 1e-3
    # the VMEM window cap still raises (for the XLA fallback) when the
    # NEAR support itself cannot fit — m no longer moves the cap (any m is
    # served in mb blocks), so build a full-coverage wide band whose
    # window span exceeds the mb=8 floor cap (~50k lanes)
    nw, bw = 120_000, 55_000
    i = np.arange(nw)
    Sw = sp.coo_matrix(
        (
            np.ones(3 * nw),
            (
                np.concatenate([i, i, i]),
                np.concatenate(
                    [i, np.clip(i - bw, 0, nw - 1), np.clip(i + bw, 0, nw - 1)]
                ),
            ),
        ),
        shape=(nw, nw),
    ).tocsr()
    Aw = ell_from_scipy(Sw, dtype=np.float32)
    with pytest.raises(ValueError, match="window"):
        windowed_from_ell(Aw, tile=512, m=8)


def test_generalized_inverse_elasticity_bsr_vs_oracle():
    # flagship non-stencil end-to-end: clamped-plate elasticity pencil,
    # windowed-gather engine (force_padded exercises the Pallas path in
    # interpret mode) + RCM-banded direct inverse, vs the scipy oracle
    from dune_eigensolver_tpu.oracle import smallest_generalized
    from dune_eigensolver_tpu.solvers import generalized_inverse

    A, B = problems.elasticity_2d(10, dtype=np.float64)
    res = generalized_inverse(
        A, B, nev=4, tol=1e-8, maxiter=300, shift=1e-3, force_padded=True
    )
    ref, _ = smallest_generalized(A, B, nev=4, sigma=-1e-3)
    got = np.asarray(res.eigenvalues)[:4]
    assert np.abs(got - ref) .max() / np.abs(ref).max() < TOL


def test_lobpcg_unstructured_ell_vs_oracle():
    from dune_eigensolver_tpu.factorize import cg_inverse_factory
    from dune_eigensolver_tpu.oracle import smallest_standard
    from dune_eigensolver_tpu.solvers import lobpcg_generalized

    n = 800
    S = problems.unstructured_laplacian(n, extra_edges=40, seed=5, fmt="scipy")
    A, _, perm = rcm_pencil(S, dtype=np.float64)
    B = ell_from_scipy(sp.eye(n), dtype=np.float64)
    res = lobpcg_generalized(
        A, B, nev=4, tol=1e-9, maxiter=300, shift=0.0,
        precond=cg_inverse_factory(rtol=1e-2, maxiter=25),
        force_padded=True,
    )
    ref, refv = smallest_standard(S, nev=4, sigma=-1e-3)
    got = np.asarray(res.eigenvalues)[:4]
    assert np.abs(got - ref).max() < TOL
    # eigenvectors transform back with the permutation
    V = unpermute_vectors(np.asarray(res.eigenvectors)[:, :1], perm)
    r = S @ V[:, 0] - got[0] * V[:, 0]
    assert np.linalg.norm(r) / np.linalg.norm(V[:, 0]) < 5e-3


def test_standard_inverse_windowed_ell():
    # standard shift-invert on an ELL operand routes through the windowed
    # engine + RCM-banded factorization (B = None path)
    from dune_eigensolver_tpu.oracle import smallest_standard
    from dune_eigensolver_tpu.solvers import standard_inverse

    S = _random_sym_csr(700, 6, seed=7)
    A = ell_from_scipy(S, dtype=np.float64)
    res = standard_inverse(A, nev=4, tol=1e-9, maxiter=300, shift=1e-3,
                           force_padded=True)
    ref, _ = smallest_standard(S, nev=4, sigma=-1e-3)
    got = np.asarray(res.eigenvalues)[:4]
    assert np.abs(got - ref).max() / np.abs(ref).max() < TOL


@pytest.mark.parametrize("m", [16, 32, 64, 128])
def test_windowed_wide_m_tiling_matches_xla(rng, m):
    """m-tiling (VERDICT r3 ask #2): wide multivectors are served in
    mb-row blocks on a second grid axis; any m multiple of 8 must match
    the XLA formulation with no window overflow."""
    from dune_eigensolver_tpu.kernels.gather_spmm import _pick_mb

    S = _random_sym_csr(1500, 7, seed=1)
    A = ell_from_scipy(S, dtype=np.float32)
    W = windowed_from_ell(A, tile=512, m=m)
    Xt = jnp.asarray(rng.normal(size=(m, A.shape[0])).astype(np.float32))
    Xp = jnp.pad(Xt, ((0, 0), (0, W.width - A.shape[0])))
    Y = np.asarray(windowed_spmm_t(W, Xp, interpret=True))
    Yref = np.asarray(ell_spmm_t(A, Xt))
    assert np.abs(Y[:, : A.shape[0]] - Yref).max() < 1e-4
    assert np.abs(Y[:, A.shape[0] :]).max() == 0.0
    # the picked block divides m and is a multiple of 8
    mb = _pick_mb(m, W.window, W.data.shape[0], W.tile)
    assert m % mb == 0 and mb % 8 == 0


def test_windowed_wide_m_out_buf_donation(rng):
    S = _random_sym_csr(900, 6, seed=5)
    A = ell_from_scipy(S, dtype=np.float32)
    m = 32
    W = windowed_from_ell(A, tile=512, m=m)
    Xt = jnp.asarray(rng.normal(size=(m, A.shape[0])).astype(np.float32))
    Xp = jnp.pad(Xt, ((0, 0), (0, W.width - A.shape[0])))
    dead = jnp.full_like(Xp, jnp.nan)
    Y0 = np.asarray(windowed_spmm_t(W, Xp, interpret=True))
    Y1 = np.asarray(windowed_spmm_t(W, Xp, interpret=True, out_buf=dead))
    assert np.array_equal(Y0, Y1)


def test_windowed_elasticity_m128_engine_no_fallback(capfd):
    """The production GenEO block size (m=128, TPU_LARGE_M_r03) must get
    the windowed engine — no silent (or loud) XLA fallback."""
    from dune_eigensolver_tpu.solvers.engine import make_engine

    Ab, _ = problems.elasticity_2d(24, dtype=np.float32)
    capfd.readouterr()
    A_int, B_int, layout, spec = make_engine(
        Ab, m=128, force_padded=True
    )
    assert "FALLBACK" not in capfd.readouterr().err
    assert layout is not None and spec.padded
    assert isinstance(A_int, (WindowedELL, WindowedBSR))


def test_blocked_bsr_equals_scalar_expansion(rng):
    """Block-aware planner (VERDICT r4 ask #1): one gather + rolls per
    block rank must agree with the scalar-expanded layout and the XLA
    formulation; the gather count (segment count) must drop by roughly
    the block factor."""
    from dune_eigensolver_tpu.kernels.gather_spmm import BlockedWindowedBSR

    A, _ = problems.elasticity_2d(24, dtype=np.float32)
    n = A.shape[0]
    Wb = windowed_from_bsr(A, tile=512)  # auto -> blocked for 2x2
    Ws = windowed_from_bsr(A, tile=512, blocked=False)
    assert isinstance(Wb, BlockedWindowedBSR)
    assert not isinstance(Ws, BlockedWindowedBSR)
    # gather count per subgroup = segment count: blocked must be well
    # under the scalar count (ideally ~1/b)
    assert Wb.blanes.shape[0] < Ws.data.shape[0]
    m = 8
    Xt = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    Yb = np.asarray(
        windowed_spmm_t(
            Wb, jnp.pad(Xt, ((0, 0), (0, Wb.width - n))), interpret=True
        )
    )[:, :n]
    Ys = np.asarray(
        windowed_spmm_t(
            Ws, jnp.pad(Xt, ((0, 0), (0, Ws.width - n))), interpret=True
        )
    )[:, :n]
    Yref = np.asarray(bsr_spmm_t(A, Xt))
    assert np.abs(Yb - Yref).max() < 1e-4
    assert np.abs(Yb - Ys).max() < 1e-5


@pytest.mark.parametrize("b", [2, 4])
def test_blocked_bsr_blocks_and_wide_m(rng, b):
    nb = 300
    Sb = _random_sym_csr(nb, 5, seed=7)
    blockmat = rng.normal(size=(b, b))
    S = sp.csr_matrix(sp.kron(Sb, blockmat + blockmat.T + 4 * np.eye(b)))
    A = bsr_from_scipy(S, block=(b, b), dtype=np.float32)
    from dune_eigensolver_tpu.kernels.gather_spmm import BlockedWindowedBSR

    m = 32
    W = windowed_from_bsr(A, tile=512, m=m)
    assert isinstance(W, BlockedWindowedBSR)
    n = A.shape[0]
    Xt = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    Xp = jnp.pad(Xt, ((0, 0), (0, W.width - n)))
    Y = np.asarray(windowed_spmm_t(W, Xp, interpret=True))
    Yref = np.asarray(bsr_spmm_t(A, Xt))
    assert np.abs(Y[:, :n] - Yref).max() < 1e-4
    assert np.abs(Y[:, n:]).max() == 0.0
    # diagonal + round trip on the blocked container
    assert np.abs(np.asarray(W.diagonal()) - S.diagonal()).max() < 1e-4
    L = W.to_logical().to_scipy().tocsr()
    assert abs(L - sp.csr_matrix(S).astype(np.float32)).max() < 1e-5


def test_blocked_bsr_coo_tail(rng):
    # a few long-range blocks on one block row land in low-coverage slots
    # -> scalar COO tail; equality must hold through the hybrid path
    b = 2
    nb = 256
    Sb = _random_sym_csr(nb, 5, seed=9).tolil()
    Sb[0, nb // 2] = -1.0
    Sb[nb // 2, 0] = -1.0
    Sb[3, nb - 5] = -0.5
    Sb[nb - 5, 3] = -0.5
    blockmat = rng.normal(size=(b, b))
    S = sp.csr_matrix(
        sp.kron(Sb.tocsr(), blockmat + blockmat.T + 4 * np.eye(b))
    )
    A = bsr_from_scipy(S, block=(b, b), dtype=np.float32)
    W = windowed_from_bsr(A, tile=256)
    assert W.far_nnz > 0
    n = A.shape[0]
    Xt = jnp.asarray(rng.normal(size=(8, n)).astype(np.float32))
    Xp = jnp.pad(Xt, ((0, 0), (0, W.width - n)))
    Y = np.asarray(windowed_spmm_t(W, Xp, interpret=True))
    Yref = np.asarray(bsr_spmm_t(A, Xt))
    assert np.abs(Y[:, :n] - Yref).max() < 1e-4


def test_blocked_bsr_out_buf_and_pair_width(rng):
    A, B = problems.elasticity_2d(16, dtype=np.float32)
    A_int, B_int, L = make_windowed_operands(A, B)
    from dune_eigensolver_tpu.kernels.gather_spmm import BlockedWindowedBSR

    assert isinstance(A_int, BlockedWindowedBSR)
    assert isinstance(B_int, BlockedWindowedBSR)
    assert A_int.width == B_int.width == L.width
    n = A.shape[0]
    m = 8
    Xt = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    Xp = L.pad(Xt)
    dead = jnp.full_like(Xp, jnp.nan)
    Y0 = np.asarray(windowed_spmm_t(A_int, Xp, interpret=True))
    Y1 = np.asarray(windowed_spmm_t(A_int, Xp, interpret=True, out_buf=dead))
    assert np.array_equal(Y0, Y1)
