"""TPU A/B: block-aware vs scalar-expanded windowed-gather kernel on the
elasticity BSR 2x2 operand (VERDICT r4 ask #1).

The scalar-expanded layout spends one tpu.dynamic_gather per scalar column
of a block; gathers are 81% of kernel time (experiments/gather_ablate.py),
so the block-aware planner (one gather per BLOCK rank + static lane rolls,
kernels/gather_spmm.py::_blk_kernel) should cut the dominant cost by ~b.

    python experiments/blocked_ab.py [Nel] [m ...]

Greppable rows:
  BLOCKED_AB <variant> <n> <nnz> <m> <GFLOP/s> t=<us> smax=<segments>
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from dune_eigensolver_tpu.bench.timing import bench_loop
from dune_eigensolver_tpu.kernels.gather_spmm import (
    _pick_mb,
    _pick_mb_blocked,
    windowed_from_bsr,
)
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import bsr_from_scipy
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
    n, nnz = Ab.shape[0], Ab.nnz
    print(f"elasticity: n={n} nnz={nnz} block={Ab.block}", flush=True)

    import time

    from jax import lax

    rng = np.random.default_rng(1)
    for m in ms:
        X = rng.normal(size=(m, n)).astype(dt)
        variants = {}
        for name, blocked in (("blk", True), ("sca", False)):
            M_int = windowed_from_bsr(Ab, m=m, blocked=blocked)
            if blocked:
                smax = M_int.blanes.shape[0]
                b = M_int.block[0]
                mb = _pick_mb_blocked(m, M_int.window, smax, b, M_int.tile)
            else:
                smax = M_int.data.shape[0]
                mb = _pick_mb(m, M_int.window, smax, M_int.tile)
            Xw = jnp.pad(jnp.asarray(X), ((0, 0), (0, M_int.width - n)))
            Yw = np.asarray(spmm_t(M_int, Xw))[:, :n]
            Yx = (Sa @ X.T).T
            err = np.abs(Yw - Yx).max() / max(np.abs(Yx).max(), 1e-30)
            variants[name] = dict(
                op=M_int, Xw=Xw, smax=smax, mb=mb, err=err
            )
        # interleaved two-K rounds: the shared chip's throughput drifts
        # run-to-run (583 -> 343 us observed for the SAME scalar binary
        # minutes apart), so only same-round blk/sca pairs are comparable
        K, K1 = 40, 8
        for v in variants.values():
            for k in (K, K1):
                v[f"f{k}"] = jax.jit(
                    lambda x, op, _k=k: lax.fori_loop(
                        0, _k, lambda i, s: spmm_t(op, s), x
                    )
                )
                _ = np.asarray(
                    jnp.ravel(v[f"f{k}"](v["Xw"], v["op"]))[0]
                )
            v["bK"] = v["bK1"] = float("inf")
        for rep in range(5):
            for name, v in variants.items():
                for k in (K, K1):
                    t0 = time.perf_counter()
                    out = v[f"f{k}"](v["Xw"], v["op"])
                    _ = np.asarray(jnp.ravel(out)[0])
                    t = time.perf_counter() - t0
                    key = "bK" if k == K else "bK1"
                    v[key] = min(v[key], t)
        for name, v in variants.items():
            t = max((v["bK"] - v["bK1"]) / (K - K1), 1e-9)
            gf = 2.0 * m * nnz / t / 1e9
            print(
                f"BLOCKED_AB {name} {n} {nnz} {m} {gf:.2f} GFLOP/s "
                f"t={t*1e6:.0f}us smax={v['smax']} mb={v['mb']} "
                f"W={v['op'].window} relerr={v['err']:.2e}",
                flush=True,
            )
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
