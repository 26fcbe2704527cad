"""TPU probe: does the padded rolling-cache DIA SpMM lower and run fast in
bfloat16? Motivation: the north-star LOBPCG spends ~85% of each iteration in
the loose-CG preconditioner, which is pure HBM-bound vector traffic — a bf16
inner CG would halve it. The kernel already accumulates in f32
(kernels/dia_spmm.py:322-347), so bf16 only changes the streamed dtype.

    python experiments/bf16_spmm_probe.py [N2D]

Checks: (1) correctness vs f32 on a small 3D operator, (2) throughput at
production scale vs the f32 kernel.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dune_eigensolver_tpu.bench.timing import bench_loop
from dune_eigensolver_tpu.kernels.dia_spmm import (
    PaddedDIA,
    PaddedLayout,
    padded_spmm,
)
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix


def cast_padded(Ap, dt):
    return PaddedDIA(
        data=Ap.data.astype(dt), offsets=Ap.offsets, shape=Ap.shape,
        tile=Ap.tile, guard=Ap.guard,
    )


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    m = 24

    # --- correctness: small 3D operator, bf16 vs f32 ---
    A0 = problems.laplacian_dirichlet_3d(32, dtype=np.float32)
    n0 = A0.shape[0]
    L0 = PaddedLayout(n0, m, A0.offsets)
    Ap0 = L0.pad_operator(A0)
    X0 = L0.pad(jax.random.normal(jax.random.PRNGKey(0), (m, n0), jnp.float32))
    y32 = np.asarray(padded_spmm(Ap0, X0))
    y16 = np.asarray(
        padded_spmm(cast_padded(Ap0, jnp.bfloat16), X0.astype(jnp.bfloat16))
    ).astype(np.float32)
    denom = np.abs(y32).max()
    rel = np.abs(y16 - y32).max() / denom
    print(f"bf16 correctness: max rel err {rel:.3e} (expect ~1e-2, bf16 eps)",
          flush=True)

    # --- throughput at production scale ---
    A = problems.laplacian_dirichlet_2d(N, dtype=np.float32)
    A = DIAMatrix(data=A.data / 8.0, offsets=A.offsets, shape=A.shape)
    n = A.shape[0]
    L = PaddedLayout(n, m, A.offsets)
    Ap = L.pad_operator(A)
    Xp = L.pad(jax.random.normal(jax.random.PRNGKey(1), (m, n), jnp.float32))

    def step32(x, data):
        op = PaddedDIA(data=data, offsets=A.offsets, shape=A.shape,
                       tile=L.T, guard=L.G)
        return padded_spmm(op, x, donate=True)

    Ap16 = cast_padded(Ap, jnp.bfloat16)
    Xp16 = Xp.astype(jnp.bfloat16)

    def step16(x, data):
        op = PaddedDIA(data=data, offsets=A.offsets, shape=A.shape,
                       tile=L.T, guard=L.G)
        return padded_spmm(op, x, donate=True)

    t32 = bench_loop(step32, Xp, K=20, reps=2, op_args=(Ap.data,))
    t16 = bench_loop(step16, Xp16, K=20, reps=2, op_args=(Ap16.data,))
    ndiag = len(A.offsets)
    b32 = (ndiag * n + 2 * n * m) * 4
    b16 = (ndiag * n + 2 * n * m) * 2
    print(
        f"f32 : {t32*1e6:.0f}us {b32/t32/1e9:.1f} GB/s | "
        f"bf16: {t16*1e6:.0f}us {b16/t16/1e9:.1f} GB/s | "
        f"speedup {t32/t16:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
