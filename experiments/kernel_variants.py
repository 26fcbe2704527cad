"""TPU experiment: isolate why the unified guarded kernel runs at ~356 GB/s
actual while the round-1 plain kernel ran at ~616 GB/s actual.

Variants (all kernel-only, operating on persistent pre-padded buffers):
  A  unified padded_spmm (4D xbuf, clipped DMA starts, guard tiles)
  B  unified specialized: 3D xbuf (single group), no clip (guard handled by
     geometry), otherwise identical
  C  round-1 style plain kernel on a pre-padded (m, n+2H) buffer, compact
     (m, n_pad) output — the reference point
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

from dune_eigensolver_tpu.kernels.dia_spmm import (
    PaddedLayout,
    padded_spmm,
    _round_up,
)
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix


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


# --- variant C: round-1 plain kernel, input pre-padded (no per-call pad) ---
def _kernel_c(offsets, T, H, mpad, ndiag, data_ref, x_hbm, out_ref, xbuf, sems):
    j = pl.program_id(0)
    nt = pl.num_programs(0)

    def dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(tile * T, T + 2 * H)], xbuf.at[slot], sems.at[slot]
        )

    @pl.when(j == 0)
    def _():
        dma(0, 0).start()

    @pl.when(j + 1 < nt)
    def _():
        dma((j + 1) % 2, j + 1).start()

    dma(j % 2, j).wait()
    slot = j % 2
    acc = jnp.zeros((mpad, T), jnp.float32)
    for d in range(ndiag):
        off = offsets[d]
        window = xbuf[slot, :, H + off : H + off + T]
        acc = acc + data_ref[d][None, :] * window
    out_ref[:] = acc


def spmm_c(offsets, shape, T, data, Xpad):
    n = shape[0]
    mpad = Xpad.shape[0]
    halo = max(abs(o) for o in offsets)
    H = _round_up(max(halo, 128), 128)
    n_pad = _round_up(n, T)
    grid = n_pad // T
    ndiag = len(offsets)
    kernel = functools.partial(_kernel_c, offsets, T, H, mpad, ndiag)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mpad, n_pad), Xpad.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ndiag, T), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((mpad, T), lambda j: (0, j), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, mpad, T + 2 * H), Xpad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * n * mpad,
            bytes_accessed=(ndiag * n + 2 * n * mpad) * 4,
            transcendentals=0,
        ),
    )(data, Xpad)


# --- variant B: unified geometry, 3D xbuf, configurable slots/prefetch ---
def _kernel_b(
    fl_base, offs, T, W, width, mpad, nslots, depth,
    data_ref, x_hbm, out_ref, xbuf, sems,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    def dma(slot, tile):
        start = jnp.clip(tile * T + fl_base, 0, width - W)
        start = pl.multiple_of(start, 128)
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(start, W)], xbuf.at[slot], sems.at[slot]
        )

    @pl.when(t == 0)
    def _():
        for k in range(depth):
            dma(k % nslots, k).start()

    @pl.when(t + depth < nt)
    def _():
        dma((t + depth) % nslots, t + depth).start()

    dma(t % nslots, t).wait()
    slot = t % nslots
    acc = jnp.zeros((mpad, T), jnp.float32)
    for d, off in offs:
        rel = off - fl_base
        acc = acc + data_ref[d][None, :] * xbuf[slot, :, rel : rel + T]
    out_ref[:] = acc


def spmm_b(offsets, T, G, width, pdata, Xp, nslots=2, depth=1):
    mpad = Xp.shape[0]
    ndiag = len(offsets)
    first = min(offsets)
    fl_base = (first // 128) * 128
    span = max(offsets) - first
    W = _round_up(T + span + 256, 128)
    grid = width // T
    kernel = functools.partial(
        _kernel_b, fl_base, tuple(enumerate(offsets)), T, W, width, mpad,
        nslots, depth,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mpad, width), Xp.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ndiag, T), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((mpad, T), lambda t: (0, t), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nslots, mpad, W), Xp.dtype),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * 4194304 * mpad,
            bytes_accessed=(ndiag + 2 * mpad) * 4194304 * 4,
            transcendentals=0,
        ),
    )(pdata, Xp)


# --- variant D: rolling 3-tile VMEM cache, fully auto-pipelined ---
def _kernel_d(offs, T, mpad, data_ref, x_ref, out_ref, xroll):
    t = pl.program_id(0)

    # shift the rolling window: xroll[0]=tile t-2, [1]=t-1, [2]=t
    xroll[0] = xroll[1]
    xroll[1] = xroll[2]
    xroll[2] = x_ref[:]

    @pl.when(t > 0)
    def _():  # compute output tile j = t-1 from tiles j-1, j, j+1
        left, center, right = xroll[0], xroll[1], xroll[2]
        acc = jnp.zeros((mpad, T), jnp.float32)
        for d, off in offs:
            if off == 0:
                win = center
            elif off < 0:
                win = jnp.concatenate(
                    [left[:, T + off :], center[:, : T + off]], axis=1
                )
            else:
                win = jnp.concatenate([center[:, off:], right[:, :off]], axis=1)
            acc = acc + data_ref[d][None, :] * win
        out_ref[:] = acc


def spmm_d(offsets, T, width, pdata, Xp, alias=False):
    mpad = Xp.shape[0]
    ndiag = len(offsets)
    ntot = width // T
    kernel = functools.partial(_kernel_d, tuple(enumerate(offsets)), T, mpad)

    def clamp(i, lo, hi):
        return jnp.minimum(jnp.maximum(i, lo), hi)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mpad, width), Xp.dtype),
        grid=(ntot + 1,),
        in_specs=[
            pl.BlockSpec((ndiag, T), lambda t: (0, clamp(t - 1, 0, ntot - 1))),
            pl.BlockSpec((mpad, T), lambda t: (0, clamp(t, 0, ntot - 1))),
        ],
        out_specs=pl.BlockSpec((mpad, T), lambda t: (0, clamp(t - 1, 0, ntot - 1))),
        scratch_shapes=[pltpu.VMEM((3, mpad, T), Xp.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * 4194304 * mpad,
            bytes_accessed=(ndiag + 2 * mpad) * 4194304 * 4,
            transcendentals=0,
        ),
        input_output_aliases={1: 0} if alias else {},
    )(pdata, Xp)


def main():
    N, m = 2048, 8
    dtype = np.float32
    A = problems.laplacian_dirichlet_2d(N, dtype=dtype)
    A = DIAMatrix(data=A.data / 8.0, offsets=A.offsets, shape=A.shape)
    n = A.shape[0]
    ndiag = len(A.offsets)
    bytes_eff = (ndiag * n + 2 * n * m) * 4
    Xt = jax.random.normal(jax.random.PRNGKey(0), (m, n), dtype=dtype)

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 32768

    # copy roofline
    buf = jnp.ones((256 * 1024 * 1024 // 4,), dtype)
    t_copy = bench_loop(lambda v: v + 1.0, buf, K=30)
    print(f"copy: {t_copy*1e6:.0f}us {2*buf.size*4/t_copy/1e9:.1f} GB/s", flush=True)

    L = PaddedLayout(n, m, A.offsets, tile=T)
    Ap = L.pad_operator(A)
    Xp = L.pad(Xt)
    t_a = bench_loop(
        lambda x, d: padded_spmm(
            type(Ap)(data=d, offsets=Ap.offsets, shape=Ap.shape, tile=Ap.tile,
                     guard=Ap.guard), x),
        Xp, (Ap.data,))
    print(f"A unified   T={T}: {t_a*1e6:.0f}us  {bytes_eff/t_a/1e9:.1f} GB/s(eff)",
          flush=True)

    # correctness check for D on CPU-interpret is skipped here (TPU run);
    # validate numerically against A on-device instead
    ya = padded_spmm(Ap, Xp)
    yd = spmm_d(A.offsets, L.T, L.width, Ap.data, Xp)
    err = float(jnp.max(jnp.abs(ya - yd)))
    print(f"D max|err| vs A: {err:.2e}", flush=True)

    t_d = bench_loop(
        lambda x, d: spmm_d(A.offsets, L.T, L.width, d, x), Xp, (Ap.data,))
    print(f"D rolling   T={T}: {t_d*1e6:.0f}us  {bytes_eff/t_d/1e9:.1f} GB/s(eff)",
          flush=True)

    # D in-place (donated carry): validate 2-chain numerics, then bench
    ya2 = padded_spmm(Ap, padded_spmm(Ap, Xp))
    f2 = jax.jit(
        lambda x, d: spmm_d(
            A.offsets, L.T, L.width, d,
            spmm_d(A.offsets, L.T, L.width, d, x, alias=True), alias=True)
    )
    yd2 = f2(Xp, Ap.data)
    err2 = float(jnp.max(jnp.abs(ya2 - yd2)))
    print(f"D-alias 2-chain max|err| vs A: {err2:.2e}", flush=True)

    t_da = bench_loop(
        lambda x, d: spmm_d(A.offsets, L.T, L.width, d, x, alias=True),
        Xp, (Ap.data,))
    print(f"D in-place  T={T}: {t_da*1e6:.0f}us  {bytes_eff/t_da/1e9:.1f} GB/s(eff)",
          flush=True)

    for nslots, depth in ((2, 1), (3, 2), (4, 3)):
        t_b = bench_loop(
            lambda x, d, s=nslots, q=depth: spmm_b(
                A.offsets, L.T, L.G, L.width, d, x, nslots=s, depth=q),
            Xp, (Ap.data,))
        print(
            f"B s={nslots} d={depth} T={T}: {t_b*1e6:.0f}us  "
            f"{bytes_eff/t_b/1e9:.1f} GB/s(eff)",
            flush=True,
        )

    # variant C: persistent (m, n+2H) buffer, compact output
    halo = max(abs(o) for o in A.offsets)
    H = _round_up(max(halo, 128), 128)
    XpC = jnp.pad(Xt, ((0, 0), (H, H + _round_up(n, T) - n)))
    dataC = A.data
    if _round_up(n, T) != n:
        dataC = jnp.pad(A.data, ((0, 0), (0, _round_up(n, T) - n)))
    t_c = bench_loop(
        lambda x, d: jnp.pad(
            spmm_c(A.offsets, A.shape, T, d, x)[:, :n], ((0, 0), (H, H))
        ),
        XpC, (dataC,))
    print(f"C r1-style  T={T}: {t_c*1e6:.0f}us  {bytes_eff/t_c/1e9:.1f} GB/s(eff) "
          "(incl re-pad to chain)", flush=True)


if __name__ == "__main__":
    main()
