"""TPU experiment: sweep the Pallas DIA-SpMM tile size T against the
measured copy roofline. Run standalone (one TPU process at a time):

    python experiments_tile_sweep.py [N] [m]

Prints one line per tile size; pick the best and bake it into
kernels/dia_spmm.py's default tile heuristic.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dune_eigensolver_tpu.kernels.dia_spmm import dia_spmm_t_pallas, dia_spmm_t_xla
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix


def bench_loop(step, x0, K=50, reps=4):
    K1 = max(1, K // 5)

    def total(k):
        f = jax.jit(lambda x: lax.fori_loop(0, k, lambda i, s: step(s), x))
        out = f(x0)
        _ = np.asarray(out.ravel()[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(x0)
            _ = np.asarray(out.ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (total(K) - total(K1)) / (K - K1)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtype = np.float32
    A = problems.laplacian_dirichlet_2d(N, dtype=dtype)
    A = DIAMatrix(data=A.data / 8.0, offsets=A.offsets, shape=A.shape)
    n = A.shape[0]
    ndiag = len(A.offsets)
    Xt = jax.random.normal(jax.random.PRNGKey(0), (m, n), dtype=dtype)
    bytes_min = (ndiag * n + 2 * n * m) * 4

    t = bench_loop(lambda x: dia_spmm_t_xla(A, x), Xt)
    print(f"xla_t          : {t*1e6:8.0f}us  {bytes_min/t/1e9:7.1f} GB/s(eff)", flush=True)

    for T in (8192, 32768):
        try:
            t = bench_loop(lambda x, T=T: dia_spmm_t_pallas(A, x, tile=T), Xt)
            print(
                f"pallas T={T:6d}: {t*1e6:8.0f}us  {bytes_min/t/1e9:7.1f} GB/s(eff)",
                flush=True,
            )
        except Exception as e:
            print(f"pallas T={T:6d}: FAILED {type(e).__name__}: {e}", flush=True)

    from dune_eigensolver_tpu.kernels.dia_spmm import (
        PaddedLayout,
        dia_spmm_t_pallas_padded,
    )

    for T in (8192, 16384, 32768, 65536):
        try:
            L = PaddedLayout(n, m, A.offsets, tile=T)
            Xp = L.pad(Xt)
            t = bench_loop(
                lambda x, L=L: dia_spmm_t_pallas_padded(A, x, L), Xp
            )
            print(
                f"padded T={T:6d}: {t*1e6:8.0f}us  {bytes_min/t/1e9:7.1f} GB/s(eff)",
                flush=True,
            )
        except Exception as e:
            print(f"padded T={T:6d}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
