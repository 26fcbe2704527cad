"""TPU probe: why do all DIA SpMM kernel variants pin at ~1050us for
n=4.2M, m=8, while a 1D copy moves the same bytes in ~410us?

Phases:
  1  1D copy (v + 1.0) on 256MB           — the roofline reference
  2  2D copy (x + 1.0) on (8, width)      — same shape as the multivector
  3  2D copy on (16, width/2), (32, ...)  — sublane occupancy sweep
  4  pallas identity (auto-pipelined blocks, no halo, no data)
  5  pallas identity + data read (adds the (5, T) block stream)
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench_loop(step, x0, op_args=(), K=50, reps=3):
    K1 = max(1, K // 5)

    def total(k):
        f = jax.jit(lambda x, *a: lax.fori_loop(0, k, lambda i, s: step(s, *a), x))
        out = f(x0, *op_args)
        _ = np.asarray(jnp.ravel(out)[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(x0, *op_args)
            _ = np.asarray(jnp.ravel(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (total(K) - total(K1)) / (K - K1)


def ident_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def pallas_ident(T, x):
    mpad, width = x.shape
    return pl.pallas_call(
        ident_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(width // T,),
        in_specs=[pl.BlockSpec((mpad, T), lambda t: (0, t))],
        out_specs=pl.BlockSpec((mpad, T), lambda t: (0, t)),
    )(x)


def identd_kernel(d_ref, x_ref, o_ref):
    o_ref[:] = x_ref[:] + d_ref[0][None, :]


def pallas_identd(T, d, x):
    mpad, width = x.shape
    nd = d.shape[0]
    return pl.pallas_call(
        identd_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(width // T,),
        in_specs=[
            pl.BlockSpec((nd, T), lambda t: (0, t)),
            pl.BlockSpec((mpad, T), lambda t: (0, t)),
        ],
        out_specs=pl.BlockSpec((mpad, T), lambda t: (0, t)),
    )(d, x)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    dtype = np.float32
    width = 4259840
    m = 8

    buf = jnp.ones((256 * 1024 * 1024 // 4,), dtype)
    t = bench_loop(lambda v: v + 1.0, buf, K=30)
    print(f"1d copy 256MB : {t*1e6:7.0f}us {2*buf.size*4/t/1e9:7.1f} GB/s", flush=True)

    for mm in (8, 16, 32, 64):
        w = width * 8 // mm
        x = jnp.ones((mm, w), dtype)
        t = bench_loop(lambda v: v + 1.0, x, K=30)
        print(
            f"2d copy ({mm:3d},{w}): {t*1e6:7.0f}us {2*x.size*4/t/1e9:7.1f} GB/s",
            flush=True,
        )

    x = jnp.ones((m, width), dtype)
    t = bench_loop(lambda v: pallas_ident(T, v), x, K=30)
    print(f"pallas ident T={T}: {t*1e6:7.0f}us {2*x.size*4/t/1e9:7.1f} GB/s", flush=True)

    for TT in (8192, 16384, 65536):
        t = bench_loop(lambda v, TT=TT: pallas_ident(TT, v), x, K=30)
        print(
            f"pallas ident T={TT}: {t*1e6:7.0f}us {2*x.size*4/t/1e9:7.1f} GB/s",
            flush=True,
        )

    d = jnp.ones((5, width), dtype)
    t = bench_loop(lambda v, dd: pallas_identd(T, dd, v), x, (d,), K=30)
    by = (2 * x.size + d.size) * 4
    print(f"pallas ident+d T={T}: {t*1e6:7.0f}us {by/t/1e9:7.1f} GB/s", flush=True)

    # --- aliasing hypothesis: fori_loop donates the carry, so pallas reads
    # and writes the same HBM buffer -> hazard serialization? ---
    def pallas_ident_alias(T, xx):
        mpad, w = xx.shape
        return pl.pallas_call(
            ident_kernel,
            out_shape=jax.ShapeDtypeStruct(xx.shape, xx.dtype),
            grid=(w // T,),
            in_specs=[pl.BlockSpec((mpad, T), lambda t: (0, t))],
            out_specs=pl.BlockSpec((mpad, T), lambda t: (0, t)),
            input_output_aliases={0: 0},
        )(xx)

    t = bench_loop(lambda v: pallas_ident_alias(T, v), x, K=30)
    print(f"pallas ident ALIASED T={T}: {t*1e6:7.0f}us {2*x.size*4/t/1e9:7.1f} GB/s",
          flush=True)

    # de-aliased: keep the input alive so the output must be a fresh buffer;
    # the extra scale pass costs one full copy (~414us at roofline)
    def step2(carry):
        xx, acc = carry
        x2 = xx * 1.0000001
        y = pallas_ident(T, x2)
        return (x2, acc + y[:, :128])

    acc0 = jnp.zeros((m, 128), dtype)
    t = bench_loop(lambda c: step2(c), (x, acc0), K=30)
    print(f"pallas ident DEALIASED(+scale) T={T}: {t*1e6:7.0f}us "
          f"(scale pass ~414us included)", flush=True)


if __name__ == "__main__":
    main()
