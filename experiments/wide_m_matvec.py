"""TPU capture: the m-tiled, int8-lane, Tr-granular windowed-gather kernel
across multivector widths (VERDICT r3 asks #2 and #3).

For each m in the sweep: correctness vs the XLA gather formulation on the
chip (max abs err on one apply), then two-K slope timing of the windowed
kernel; the XLA row is captured once at m=8 for the speedup column.

    python experiments/wide_m_matvec.py [Nel] [m ...]

Greppable rows (same schema as the matvec CLI):
  RESULT <variant> <n> <nnz> <m> <GFLOP/s> <GB/s-effective> [vs_xla]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dune_eigensolver_tpu.bench.timing import bench_loop
from dune_eigensolver_tpu.kernels.gather_spmm import (
    _pick_mb,
    make_windowed_operands,
)
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import bsr_from_scipy, ell_from_scipy
from dune_eigensolver_tpu.sparse.spmm import spmm_t


def main():
    Nel = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ms = [int(a) for a in sys.argv[2:]] or [8, 32, 128]
    dt = np.float32
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    Ae, _ = problems.elasticity_2d(Nel, dtype=dt)
    Sa = Ae.to_scipy()
    Sa = Sa / float(np.abs(Sa).sum(axis=1).max())  # bounded chains
    Ab = bsr_from_scipy(Sa, block=Ae.block, dtype=dt)
    Au = ell_from_scipy(Sa, dtype=dt)
    n, nnz = Ab.shape[0], Ab.nnz
    print(f"elasticity: n={n} nnz={nnz}", flush=True)

    rng = np.random.default_rng(1)
    for name, M in (("bsr", Ab), ("ell", Au)):
        for m in ms:
            M_int, _, L = make_windowed_operands(M, m=m)
            smax = M_int.data.shape[0]
            mb = _pick_mb(m, M_int.window, smax, M_int.tile)
            X = rng.normal(size=(m, n)).astype(dt)
            Xw = L.pad(jnp.asarray(X))
            # correctness vs an exact host (f64-accumulated) reference —
            # the XLA gather formulation OOMs HBM at m >= 32 on this n,
            # and its TPU einsum is only bf16-grade anyway
            Yw = np.asarray(spmm_t(M_int, Xw))[:, :n]
            Yx = (Sa @ X.T).T
            err = np.abs(Yw - Yx).max() / max(np.abs(Yx).max(), 1e-30)
            t_win = bench_loop(
                lambda V, op: spmm_t(op, V), Xw, K=40, reps=4, op_args=(M_int,)
            )
            gf = 2.0 * m * nnz / t_win / 1e9
            bts = (2 * nnz + 2 * n * m) * 4  # effective (speed-of-light f32)
            print(
                f"RESULT {name}_win {n} {nnz} {m} {gf:.2f} GFLOP/s "
                f"{bts / t_win / 1e9:.1f} GB/s mb={mb} smax={smax} "
                f"W={M_int.window} t={t_win*1e6:.0f}us relerr={err:.2e}",
                flush=True,
            )
        # one XLA row per operand at the smallest m for the speedup column
        m0 = ms[0]
        Xt = jax.random.normal(jax.random.PRNGKey(1), (m0, n), dt)
        t_xla = bench_loop(
            lambda V, op: spmm_t(op, V), Xt, K=8, reps=3, op_args=(M,)
        )
        gf = 2.0 * m0 * nnz / t_xla / 1e9
        print(
            f"RESULT {name}_xla {n} {nnz} {m0} {gf:.2f} GFLOP/s "
            f"t={t_xla*1e6:.0f}us",
            flush=True,
        )
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
