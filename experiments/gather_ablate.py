"""TPU ablation: where do the windowed-gather kernel's microseconds go?

lane_ab.py showed the kernel is NOT HBM-bound (cutting the lane stream 4x
moved nothing). This probe times the real kernel against degraded variants
that remove one mechanism at a time, on the same operand (elasticity n=522k,
m=8), plus a row-tile (Tr) sweep:

  full       the shipped kernel (dynamic scratch load + lane gather + FMA)
  nogather   FMA on the raw scratch block (no take_along_axis)
  nodyn      static scratch block (no dynamic leading-dim load), with gather
  nofma      stage only, write staged block (upper bound on staging+streams)

    python experiments/gather_ablate.py [Nel]

Greppable ABLATE rows. The variants compute WRONG numbers on purpose —
timing only.
"""

import functools
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import dune_eigensolver_tpu.kernels.gather_spmm as G
from dune_eigensolver_tpu.bench.timing import bench_loop
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import bsr_from_scipy


def _variant_kernel(
    variant, offs, smax, Tr, K, mb, acc_dt,
    starts_ref, data_ref, lanes_ref, *rest,
):
    x_refs = rest[:K]
    out_ref, scr = rest[-2], rest[-1]
    t = pl.program_id(0)
    nbt = Tr // 128
    for kk in range(K):
        for b in range(nbt):
            scr[kk * nbt + b] = x_refs[kk][:, 128 * b : 128 * (b + 1)]
    Pblk = (starts_ref[t] // Tr) * nbt
    ng = Tr // 128
    for g in range(ng):
        q0 = t * ng + g - Pblk
        acc = jnp.zeros((mb, 128), acc_dt)
        lanes_g = lanes_ref[:, 128 * g : 128 * (g + 1)].astype(jnp.int32)
        data_g = data_ref[:, 128 * g : 128 * (g + 1)]
        if variant == "nofma":
            out_ref[:, 128 * g : 128 * (g + 1)] = scr[0][:mb].astype(
                out_ref.dtype
            ) + data_g[0:1].astype(out_ref.dtype)
            continue
        for s in range(smax):
            if variant == "nodyn":
                xs = scr[s % (K * nbt)]  # static block select
            else:
                q = jnp.clip(q0 + offs[s], 0, K * nbt - 1)
                xs = scr[q]
            if variant == "nogather":
                g_s = xs
            else:
                idx = jnp.broadcast_to(lanes_g[s : s + 1], (mb, 128))
                g_s = jnp.take_along_axis(xs, idx, axis=1)
            acc = acc + data_g[s : s + 1].astype(acc_dt) * g_s.astype(acc_dt)
        out_ref[:, 128 * g : 128 * (g + 1)] = acc.astype(out_ref.dtype)


def run_variant(A, Xp, variant):
    """Clone of windowed_spmm_t's invocation with a degraded kernel body."""
    Tr, W = A.tile, A.window
    smax = A.data.shape[0]
    mpad, width = Xp.shape
    nbT = width // Tr
    K = W // Tr + 1
    acc_dt = jnp.float32
    mb = G._pick_mb(mpad, W, smax, Tr)
    nm = mpad // mb
    kernel = functools.partial(
        _variant_kernel, variant, A.offs, smax, Tr, K, mb, acc_dt
    )
    in_specs = [
        pl.BlockSpec((smax, Tr), lambda t, j, s: (0, t)),
        pl.BlockSpec((smax, Tr), lambda t, j, s: (0, t)),
    ] + [
        pl.BlockSpec(
            (mb, Tr),
            lambda t, j, s, _k=kk: (j, jnp.minimum(s[t] // Tr + _k, nbT - 1)),
        )
        for kk in range(K)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(width // Tr, nm),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((mb, Tr), lambda t, j, s: (j, t)),
        scratch_shapes=[pltpu.VMEM((K * (Tr // 128), mb, 128), Xp.dtype)],
    )
    def apply_(V, data, lanes, starts):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mpad, width), Xp.dtype),
        )(starts, data, lanes, *([V] * K))

    return bench_loop(
        apply_, Xp, K=40, reps=4, op_args=(A.data, A.lanes, A.starts)
    )


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
    m = 8
    for tile in (1024, 2048, 4096):
        try:
            M_int, _, L = G.make_windowed_operands(Ab, tile=tile, m=m)
        except ValueError as e:
            print(f"ABLATE tile={tile} overflow: {e}", flush=True)
            continue
        Xw = L.pad(jax.random.normal(jax.random.PRNGKey(1), (m, n), dt))
        from dune_eigensolver_tpu.sparse.spmm import spmm_t

        t = bench_loop(
            lambda V, op: spmm_t(op, V), Xw, K=40, reps=4, op_args=(M_int,)
        )
        print(
            f"ABLATE tile={tile} full {t*1e6:.0f}us "
            f"{2.0*m*nnz/t/1e9:.1f} GFLOP/s W={M_int.window} "
            f"smax={M_int.data.shape[0]}",
            flush=True,
        )
    M_int, _, L = G.make_windowed_operands(Ab, m=m)
    Xw = L.pad(jax.random.normal(jax.random.PRNGKey(1), (m, n), dt))
    for variant in ("full", "nogather", "nodyn", "nofma"):
        t = run_variant(M_int, Xw, variant)
        print(f"ABLATE variant={variant} {t*1e6:.0f}us", flush=True)
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
