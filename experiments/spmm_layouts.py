"""TPU experiment: (n, m)-layout SpMM strategies at north-star scale.

Compares the XLA slice formulation (current solver path) against the Pallas
transposed kernel wrapped in explicit transposes, for the 3D 7-point
operator at n ~ 10M, m = 24.

    python experiments/spmm_layouts.py [N] [m]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dune_eigensolver_tpu.kernels.dia_spmm import dia_spmm_t_pallas
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix
from dune_eigensolver_tpu.sparse.spmm import dia_spmm


def bench(step, x0, op_args, K=20, reps=3):
    K1 = max(1, K // 5)

    def chain(k):
        f = jax.jit(lambda x, *a: lax.fori_loop(0, k, lambda i, s: step(s, *a), x))
        out = f(x0, *op_args)
        _ = np.asarray(jnp.ravel(out)[0])
        return f

    fK, fK1 = chain(K), chain(K1)
    bK = bK1 = float("inf")
    for _ in range(reps):
        for f, k in ((fK, K), (fK1, K1)):
            t0 = time.perf_counter()
            out = f(x0, *op_args)
            _ = np.asarray(jnp.ravel(out)[0])
            t = time.perf_counter() - t0
            bK, bK1 = (min(bK, t), bK1) if k == K else (bK, min(bK1, t))
    return max((bK - bK1) / (K - K1), 1e-9)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    dtype = np.float32
    A = problems.laplacian_dirichlet_3d(N, dtype=dtype)
    A = DIAMatrix(data=A.data / 8.0, offsets=A.offsets, shape=A.shape)
    n = A.shape[0]
    offsets, shape = A.offsets, A.shape
    X = jax.random.normal(jax.random.PRNGKey(0), (n, m), dtype=dtype)

    def as_op(data):
        return DIAMatrix(data=data, offsets=offsets, shape=shape)

    from dune_eigensolver_tpu.kernels.dia_spmm import dia_spmm_t_pallas_grouped

    t1 = bench(lambda x, d: dia_spmm(as_op(d), x), X, (A.data,))
    print(f"xla (n,m) slices : {t1*1e3:7.2f} ms", flush=True)

    t2 = bench(
        lambda x, d: dia_spmm_t_pallas_grouped(as_op(d), x.T).T, X, (A.data,)
    )
    print(f"grouped + 2transp: {t2*1e3:7.2f} ms", flush=True)

    Xt = jnp.asarray(X.T)
    t3 = bench(lambda x, d: dia_spmm_t_pallas_grouped(as_op(d), x), Xt, (A.data,))
    print(f"grouped transpose: {t3*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
