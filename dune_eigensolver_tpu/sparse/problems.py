"""Test-problem generators.

Re-implements the *math* of the reference driver's problem builders
(src/dune-eigensolver.cc:98-156): 2D 5-point Laplacian (ISTL
``setupLaplacian``: 4 on the diagonal, -1 for grid neighbors), the Neumann
variant (diagonal := |sum of off-diagonals|), the GenEO-style B matrix
(Laplacian masked by a partition-of-unity that vanishes within ``overlap`` of
the boundary), and the identity on the Laplacian pattern. Adds the 3D 7-point
Laplacian required by the north-star configs (BASELINE.md).

Matrices are built directly in DIA form with numpy (vectorized, no
scipy intermediates) so 10M-dof 3D problems assemble in milliseconds.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dune_eigensolver_tpu.sparse.formats import DIAMatrix


def _dia(data: np.ndarray, offsets, n, dtype) -> DIAMatrix:
    return DIAMatrix(
        data=jnp.asarray(data.astype(dtype)),
        offsets=tuple(int(o) for o in offsets),
        shape=(n, n),
    )


def _laplacian_dirichlet_2d_np(N: int):
    """Assembly stays in numpy; jnp conversion happens only at the public
    boundary (_dia) — composing builders must never round-trip through the
    device (a device->host fetch can stall under forced multi-device CPU)."""
    n = N * N
    offsets = (-N, -1, 0, 1, N)
    data = np.zeros((5, n))
    i = np.arange(n)
    data[0] = np.where(i >= N, -1.0, 0.0)  # -N
    data[1] = np.where(i % N != 0, -1.0, 0.0)  # -1 (not across grid rows)
    data[2] = 4.0
    data[3] = np.where(i % N != N - 1, -1.0, 0.0)  # +1
    data[4] = np.where(i < n - N, -1.0, 0.0)  # +N
    return data, offsets, n


def laplacian_dirichlet_2d(N: int, dtype=np.float64) -> DIAMatrix:
    """2D 5-point Laplacian on an N x N grid, lexicographic ordering.

    Reference: get_laplacian_dirichlet (src/dune-eigensolver.cc:98-103),
    which delegates to dune-istl's setupLaplacian (4 on diag, -1 neighbors).
    """
    data, offsets, n = _laplacian_dirichlet_2d_np(N)
    return _dia(data, offsets, n, dtype)


def laplacian_neumann_2d(N: int, dtype=np.float64) -> DIAMatrix:
    """Neumann-type variant: diagonal := |sum of off-diagonal entries|.

    Reference: get_laplacian_neumann (src/dune-eigensolver.cc:105-121).
    """
    data, offsets, n = _laplacian_dirichlet_2d_np(N)
    d0 = offsets.index(0)
    off_sum = data.sum(axis=0) - data[d0]
    data[d0] = np.abs(off_sum)
    return _dia(data, offsets, n, dtype)


def partition_of_unity_2d(N: int, overlap: int) -> np.ndarray:
    """pu[k] = 0 within ``overlap`` of the grid boundary, else 1.

    Reference: src/dune-eigensolver.cc:129-138.
    """
    i = np.arange(N * N) // N
    j = np.arange(N * N) % N
    near = (
        (i < overlap)
        | (i > N - 1 - overlap)
        | (j < overlap)
        | (j > N - 1 - overlap)
    )
    return np.where(near, 0.0, 1.0)


def laplacian_b_2d(N: int, overlap: int, dtype=np.float64) -> DIAMatrix:
    """GenEO-style B: Laplacian entries masked by the partition of unity,
    B_ij = A_ij * pu_i * pu_j.

    Reference: get_laplacian_B (src/dune-eigensolver.cc:124-143).
    """
    data, offsets, n = _laplacian_dirichlet_2d_np(N)
    pu = partition_of_unity_2d(N, overlap)
    i = np.arange(n)
    for d, off in enumerate(offsets):
        col = i + off
        pu_col = np.where((col >= 0) & (col < n), pu[np.clip(col, 0, n - 1)], 0.0)
        data[d] = data[d] * pu * pu_col
    return _dia(data, offsets, n, dtype)


def identity_on_pattern(A: DIAMatrix, dtype=None) -> DIAMatrix:
    """Identity matrix stored on A's diagonal pattern.

    Reference: get_identity (src/dune-eigensolver.cc:145-156).
    """
    dtype = dtype or A.data.dtype
    n = A.shape[0]
    data = np.zeros((len(A.offsets), n))
    data[A.offsets.index(0)] = 1.0
    return _dia(data, A.offsets, n, dtype)


def laplacian_islands_2d(N: int, islands: int, dtype=np.float64) -> DIAMatrix:
    """``islands`` decoupled N x N Dirichlet Laplacians in one operator.

    The matrix the reference's disabled SpMM benchmark calls for ("islands
    matrix", src/dune-eigensolver.cc:421-425): constant per-partition work
    with no cross-partition coupling — ideal for weak-scaling measurements.
    """
    data, offsets, n = _laplacian_dirichlet_2d_np(N)
    tiled = np.tile(data, (1, islands))
    return _dia(tiled, offsets, n * islands, dtype)


def _laplacian_3d_device(N: int, dtype) -> jnp.ndarray:
    """Device-side assembly of the 3D diagonals: at 10M dof the (7, n) data
    is ~280 MB, and a tunneled TPU uploads host arrays at ~1 MB/s — the
    formulas below run as one jit with nothing shipped from the host."""
    import jax
    from functools import partial

    @partial(jax.jit, static_argnums=(0, 1))
    def build(N, dtype):
        n = N * N * N
        i = jnp.arange(n, dtype=jnp.int32)
        one = jnp.asarray(-1.0, dtype)
        zero = jnp.asarray(0.0, dtype)
        rows = [
            jnp.where(i >= N * N, one, zero),
            jnp.where((i // N) % N != 0, one, zero),
            jnp.where(i % N != 0, one, zero),
            jnp.full((n,), 6.0, dtype),
            jnp.where(i % N != N - 1, one, zero),
            jnp.where((i // N) % N != N - 1, one, zero),
            jnp.where(i < n - N * N, one, zero),
        ]
        return jnp.stack(rows)

    return build(N, jnp.dtype(dtype))


def laplacian_dirichlet_3d(N: int, dtype=np.float32) -> DIAMatrix:
    """3D 7-point Laplacian on an N^3 grid (north-star problem, BASELINE.md).
    Assembled on device (see _laplacian_3d_device)."""
    n = N * N * N
    offsets = (-N * N, -N, -1, 0, 1, N, N * N)
    return DIAMatrix(
        data=_laplacian_3d_device(N, dtype), offsets=offsets, shape=(n, n)
    )
