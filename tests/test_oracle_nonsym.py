"""Non-symmetric ARPACK oracle modes (reference arpack_geneo_wrapper.hh:
428-578): validated against dense numpy eigenvalues on a convection-
diffusion operator (Laplacian + skew advection)."""

import numpy as np
import scipy.sparse as sp

from dune_eigensolver_tpu.oracle import (
    smallest_generalized_nonsym,
    smallest_standard_nonsym,
)
from dune_eigensolver_tpu.sparse import problems


def _convection_diffusion(N, beta=0.4):
    A = problems.laplacian_dirichlet_2d(N).to_scipy()
    n = A.shape[0]
    # skew first-derivative term in x: beta/2 * (u_{i+1} - u_{i-1})
    i = np.arange(n)
    up = sp.diags(np.where((i % N) != N - 1, beta / 2, 0.0)[:-1], 1)
    lo = sp.diags(np.where((i % N) != 0, -beta / 2, 0.0)[1:], -1)
    return sp.csr_matrix(A + up + lo)


def _nearest_dense(M, B, k, sigma):
    import scipy.linalg as sla

    if B is None:
        w = np.linalg.eigvals(M.toarray())
    else:
        w = sla.eig(M.toarray(), B.toarray(), right=False)
    return w[np.argsort(np.abs(w - sigma))][:k]


def test_std_nonsym_vs_dense():
    N, sigma = 12, 0.05
    A = _convection_diffusion(N)
    vals, vecs = smallest_standard_nonsym(A, nev=4, sigma=sigma)
    dense = _nearest_dense(A, None, 4, sigma)
    assert np.abs(np.sort_complex(vals) - np.sort_complex(dense)).max() < 1e-8
    # residual check on the first pair
    r = A @ vecs[:, 0] - vals[0] * vecs[:, 0]
    assert np.linalg.norm(r) < 1e-8


def test_std_nonsym_own_shift_mode():
    # reference OwnShiftMode (arpack_geneo_wrapper.hh:92-107, 428-499):
    # standard Arnoldi on (A - sigma*B)^-1 B solves the PENCIL A x = l B x
    # without B-inner products; un-shift l = sigma + 1/nu.
    N, sigma = 10, 0.05
    A = _convection_diffusion(N)
    n = A.shape[0]
    rng = np.random.default_rng(1)
    B = sp.diags(1.0 + rng.uniform(size=n)).tocsr()
    vals, _ = smallest_standard_nonsym(A, nev=3, sigma=sigma, shift_b=B)
    dense = _nearest_dense(A, B, 3, sigma)
    assert np.abs(np.sort_complex(vals) - np.sort_complex(dense)).max() < 1e-6


def test_gen_nonsym_vs_dense():
    N, sigma = 10, 0.02
    A = _convection_diffusion(N)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    B = sp.diags(1.0 + rng.uniform(size=n)).tocsr()  # SPD mass
    vals, vecs = smallest_generalized_nonsym(A, B, nev=4, sigma=sigma)
    dense = _nearest_dense(A, B, 4, sigma)
    assert np.abs(np.sort_complex(vals) - np.sort_complex(dense)).max() < 1e-7
    r = A @ vecs[:, 0] - vals[0] * (B @ vecs[:, 0])
    assert np.linalg.norm(r) < 1e-7
