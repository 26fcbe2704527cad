"""TPU A/B: rolled (fori over subgroups) vs unrolled windowed kernel body —
compile seconds and steady us/apply (VERDICT r3 Weak #4, the 75-79 s
windowed-solve compiles).

    python experiments/roll_ab.py [Nel]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import dune_eigensolver_tpu.kernels.gather_spmm as G
from dune_eigensolver_tpu.bench.timing import bench_loop
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import bsr_from_scipy
from dune_eigensolver_tpu.sparse.spmm import spmm_t


def main():
    Nel = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dt = np.float32
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    Ae, _ = problems.elasticity_2d(Nel, dtype=dt)
    Sa = Ae.to_scipy()
    Sa = Sa / float(np.abs(Sa).sum(axis=1).max())
    Ab = bsr_from_scipy(Sa, block=Ae.block, dtype=dt)
    n, nnz = Ab.shape[0], Ab.nnz
    rng = np.random.default_rng(1)
    m = 8
    X = rng.normal(size=(m, n)).astype(dt)
    Yref = (Sa @ X.T).T
    for rolled in (True, False):
        G._ROLL_G = rolled
        M_int, _, L = G.make_windowed_operands(Ab, m=m)
        Xw = L.pad(jnp.asarray(X))
        f = jax.jit(lambda V, op: spmm_t(op, V))
        t0 = time.perf_counter()
        Y = np.asarray(f(Xw, M_int))
        t_compile = time.perf_counter() - t0
        err = np.abs(Y[:, :n] - Yref).max() / np.abs(Yref).max()
        t = bench_loop(
            lambda V, op: spmm_t(op, V), Xw, K=40, reps=4, op_args=(M_int,)
        )
        print(
            f"ROLL_AB rolled={rolled} compile={t_compile:.1f}s "
            f"t={t*1e6:.0f}us {2.0*m*nnz/t/1e9:.1f} GFLOP/s relerr={err:.2e}",
            flush=True,
        )
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
