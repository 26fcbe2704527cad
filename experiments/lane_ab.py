"""TPU A/B: int8 vs int32 lane streams in the windowed-gather kernel.

The r4 kernel rewrite switched the lane-index stream to int8 (3/8 less
coefficient+lane HBM traffic) and the X pipeline to Tr-granular slabs
(W + Tr fetched per tile instead of 2W). The first hardware row measured
532us at m=8 where the pre-rewrite kernel measured 419us the same evening —
either tunnel drift or the i8 widen costs more than the traffic it saves.
This probe rebuilds the SAME operand with each lane dtype on one run and
times both at m=8 and m=128, plus a host-scipy correctness check.

    python experiments/lane_ab.py [Nel]

Greppable LANE_AB rows.
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
    print(f"elasticity: n={n} nnz={nnz}", flush=True)

    rng = np.random.default_rng(1)
    for m in (8, 128):
        X = rng.normal(size=(m, n)).astype(dt)
        Yref = (Sa @ X.T).T  # host f64 accumulate, exact reference
        for lane_dt, tag in ((np.int8, "i8"), (np.int32, "i32")):
            G._LANE_DTYPE = lane_dt
            M_int, _, L = G.make_windowed_operands(Ab, m=m)
            Xw = L.pad(jnp.asarray(X))
            Yw = np.asarray(spmm_t(M_int, Xw))[:, :n]
            err = np.abs(Yw - Yref).max() / np.abs(Yref).max()
            t = bench_loop(
                lambda V, op: spmm_t(op, V), Xw, K=40, reps=4, op_args=(M_int,)
            )
            gf = 2.0 * m * nnz / t / 1e9
            print(
                f"LANE_AB {tag} m={m} t={t*1e6:.0f}us {gf:.1f} GFLOP/s "
                f"relerr={err:.2e} W={M_int.window} "
                f"mb={G._pick_mb(m, M_int.window, M_int.data.shape[0], M_int.tile)}",
                flush=True,
            )
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
