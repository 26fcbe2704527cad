"""Pallas TPU kernel: tall-skinny DIA SpMM.

The hot kernel of the framework — TPU-native replacement for the reference's
``matmul_sparse_tallskinny_{blocked,avx2_b8,neon_b8}`` (kernels_cpp.hh:626,
kernels_avx2.hh:1021, kernels_neon.hh:1314). The reference streams the matrix
once per 8-RHS block with the RHS block contiguous in memory; here the
multivector is stored *transposed* as (m, n) — m on sublanes (8 = one f32
sublane group), n on lanes — the direct TPU analogue of that layout, and the
matrix diagonals stream through VMEM exactly once:

* grid over tiles of T columns of the (m, n) multivector;
* the X window [j*T - H, (j+1)*T + H) (H = bandwidth halo) is DMA'd
  HBM->VMEM with double buffering, so each X element is fetched ~(T+2H)/T
  times (vs. ndiag times for the XLA slice formulation);
* each diagonal contributes a static lane-shifted slice of the window times
  the per-row coefficient — pure VPU FMAs, no gathers;
* out-of-range diagonal entries are stored as zeros (format invariant), so
  no masking is needed at the edges.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dune_eigensolver_tpu.sparse.formats import DIAMatrix


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def dia_spmm_t_xla(A: DIAMatrix, Xt: jax.Array) -> jax.Array:
    """XLA reference for the transposed layout: Yt = (A @ Xt.T).T, Xt (m, n)."""
    m, n = Xt.shape
    halo = max((abs(o) for o in A.offsets), default=0)
    Xp = jnp.pad(Xt, ((0, 0), (halo, halo)))
    acc = jnp.zeros_like(Xt)
    for d, off in enumerate(A.offsets):
        acc = acc + A.data[d][None, :] * lax.slice(
            Xp, (0, halo + off), (m, halo + off + n)
        )
    return acc


def _kernel(offsets, T, H, mpad, ndiag, data_ref, x_hbm, out_ref, xbuf, sems):
    j = pl.program_id(0)
    nt = pl.num_programs(0)

    def dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(tile * T, T + 2 * H)],
            xbuf.at[slot],
            sems.at[slot],
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
        window = xbuf[slot, :, H + off : H + off + T]  # (mpad, T) static slice
        acc = acc + data_ref[d][None, :].astype(jnp.float32) * window.astype(
            jnp.float32
        )
    out_ref[:] = acc.astype(out_ref.dtype)


def dia_spmm_t_pallas(
    A: DIAMatrix, Xt: jax.Array, tile: Optional[int] = None, interpret: bool = False
) -> jax.Array:
    """Pallas DIA SpMM in the transposed (m, n) layout. Yt (m, n) = A @ X."""
    m, n = Xt.shape
    if A.shape[1] != n:
        raise ValueError(f"dia_spmm_t_pallas: {A.shape} @ X^T with Xt {Xt.shape}")
    halo = max((abs(o) for o in A.offsets), default=0)
    H = _round_up(max(halo, 128), 128)
    if tile is None:
        # T >= H so neighbors stay within one adjacent window; cap VMEM use.
        tile = max(8192, H)
        tile = min(tile, 65536)
    T = _round_up(max(tile, H), 128)
    mpad = _round_up(m, 8)
    ndiag = len(A.offsets)

    n_pad = _round_up(n, T)
    grid = n_pad // T
    # pad X with H zeros both sides (+ tail to tile multiple)
    Xp = jnp.pad(Xt, ((0, mpad - m), (H, n_pad - n + H)))
    data = A.data
    if n_pad != n:
        data = jnp.pad(data, ((0, 0), (0, n_pad - n)))

    kernel = functools.partial(_kernel, A.offsets, T, H, mpad, ndiag)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mpad, n_pad), Xt.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ndiag, T), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((mpad, T), lambda j: (0, j), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, mpad, T + 2 * H), Xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * n * m,
            bytes_accessed=(ndiag * n + 2 * n * m) * Xt.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(data, Xp)
    return out[:m, :n]


def dia_spmm_best(A: DIAMatrix, X: jax.Array) -> jax.Array:
    """(n, m)-layout convenience wrapper over the Pallas kernel (transposes
    in/out; for the zero-copy hot path use dia_spmm_t_pallas directly)."""
    return dia_spmm_t_pallas(A, X.T).T


# ---------------------------------------------------------------------------
# Grouped-window kernel: wide-band stencils (3D 7-point: offsets +-N^2)
# ---------------------------------------------------------------------------
#
# The single-window kernel above fetches [jT - H, (j+1)T + H) with H =
# max|offset|; for a 3D operator H = N^2 and the window no longer fits VMEM.
# But stencil offsets CLUSTER: {-N^2}, {-N..N}, {+N^2}. This kernel DMAs one
# aligned window per cluster (each only as wide as the cluster's span) and
# applies the same static lane-shifted FMAs within each window.


def _group_offsets(offsets, T):
    """Cluster diagonal offsets so each cluster's span fits a tile.
    Returns list of (base, [(idx, off), ...]) with base 128-aligned <= off."""
    pairs = sorted(enumerate(offsets), key=lambda p: p[1])
    groups = []
    cur = None
    for d, off in pairs:
        if cur is not None and off - cur[1][0][1] <= T:
            cur[1].append((d, off))
        else:
            cur = (off, [(d, off)])
            groups.append(cur)
    out = []
    for first_off, members in groups:
        base = (first_off // 128) * 128  # aligned DMA base (floor)
        out.append((base, members))
    return out


def _kernel_grouped(groups, T, W, mpad, data_ref, x_hbm, out_ref, xbuf, sems):
    j = pl.program_id(0)
    nt = pl.num_programs(0)
    ngroups = len(groups)

    def dma(slot, tile, g):
        base, _ = groups[g]
        start = pl.multiple_of(tile * T + base, 128)
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(start, W)],
            xbuf.at[slot, g],
            sems.at[slot, g],
        )

    @pl.when(j == 0)
    def _():
        for g in range(ngroups):
            dma(0, 0, g).start()

    @pl.when(j + 1 < nt)
    def _():
        for g in range(ngroups):
            dma((j + 1) % 2, j + 1, g).start()

    slot = j % 2
    acc = jnp.zeros((mpad, T), jnp.float32)
    for g, (base, members) in enumerate(groups):
        dma(slot, j, g).wait()
        for d, off in members:
            rel = off - base  # in-window lane offset, [0, T + span)
            window = xbuf[slot, g, :, rel : rel + T]
            acc = acc + data_ref[d][None, :].astype(jnp.float32) * window.astype(
                jnp.float32
            )
    out_ref[:] = acc.astype(out_ref.dtype)


def dia_spmm_t_pallas_grouped(
    A: DIAMatrix, Xt: jax.Array, tile: Optional[int] = None, interpret: bool = False
) -> jax.Array:
    """Pallas DIA SpMM for wide-band (e.g. 3D 7-point) operators in the
    transposed (m, n) layout: one modest VMEM window per diagonal cluster
    instead of one bandwidth-wide window. Yt (m, n) = A @ X."""
    m, n = Xt.shape
    if A.shape[1] != n:
        raise ValueError(f"dia_spmm_t_pallas_grouped: {A.shape} vs Xt {Xt.shape}")
    if tile is None:
        tile = 8192
    T = _round_up(tile, 128)
    groups = _group_offsets(A.offsets, T)
    # uniform window width: tile + max cluster span + alignment slack
    span = max(
        (members[-1][1] - base) for base, members in groups
    )
    W = _round_up(T + span + 128, 128)
    mpad = _round_up(m, 8)
    ndiag = len(A.offsets)

    n_pad = _round_up(n, T)
    grid = n_pad // T
    halo = max(abs(o) for o in A.offsets)
    # left/right guard so every group window [jT + base + G, ... + W) stays
    # inside the padded buffer: start >= G - halo - 128 > 0 and
    # end <= n_pad + halo + T + 256 + G <= n_pad + 2G
    G = _round_up(halo + T + 256, 128)
    Xp = jnp.pad(Xt, ((0, mpad - m), (G, n_pad - n + G)))
    data = A.data
    if n_pad != n:
        data = jnp.pad(data, ((0, 0), (0, n_pad - n)))

    # shift group bases by the guard so DMA starts are >= 0
    groups_sh = [
        (base + G, members) for base, members in groups
    ]
    kernel = functools.partial(_kernel_grouped, tuple(groups_sh), T, W, mpad)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mpad, n_pad), Xt.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ndiag, T), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((mpad, T), lambda j: (0, j), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, len(groups_sh), mpad, W), Xt.dtype),
            pltpu.SemaphoreType.DMA((2, len(groups_sh))),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * n * m,
            bytes_accessed=(ndiag * n + 2 * n * m) * Xt.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(data, Xp)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Persistent padded layout: the zero-copy iteration hot path
# ---------------------------------------------------------------------------
#
# dia_spmm_t_pallas pads X by the halo on every call; inside an iteration
# loop that pad is a full extra multivector copy per SpMM (~40% of the
# kernel's own traffic at m=8). The padded variant keeps the multivector in
# a (mpad, T + n_pad + T) buffer with one full tile of zeros on each side, so
# chained applications Y = A X, X = A Y, ... never touch the halo again:
# edge tiles only rewrite zeros, interior tiles compute. This mirrors how
# the reference streams its MultiVector repeatedly without re-marshalling
# (kernels_cpp.hh:626-657 operate in place on preallocated blocks).


class PaddedLayout:
    """Static geometry of the persistent padded transposed multivector."""

    def __init__(self, n: int, m: int, offsets, tile: Optional[int] = None):
        halo = max((abs(o) for o in offsets), default=0)
        H = _round_up(max(halo, 128), 128)
        if tile is None:
            tile = max(8192, H)
            tile = min(tile, 65536)
        T = _round_up(max(tile, H), 128)
        self.n, self.m = n, m
        self.H, self.T = H, T
        self.mpad = _round_up(m, 8)
        self.n_pad = _round_up(n, T)
        self.nt = self.n_pad // T  # interior tiles
        self.width = self.n_pad + 2 * T

    def pad(self, Xt: jax.Array) -> jax.Array:
        """(m, n) -> padded (mpad, width)."""
        m, n = Xt.shape
        return jnp.pad(
            Xt, ((0, self.mpad - m), (self.T, self.width - n - self.T))
        )

    def unpad(self, Xp: jax.Array) -> jax.Array:
        """padded (mpad, width) -> (m, n)."""
        return Xp[: self.m, self.T : self.T + self.n]


def _kernel_padded(offsets, T, H, mpad, ndiag, data_ref, x_hbm, out_ref, xbuf, sems):
    t = pl.program_id(0)
    nt = pl.num_programs(0)  # interior tiles + 2 edge tiles
    interior = (t > 0) & (t + 1 < nt)

    def dma(slot, tile):
        # window [tile*T - H, tile*T + T + H) of the padded buffer; only
        # issued for interior tiles, where tile >= 1 keeps it in range.
        # T and H are multiples of 128 but Mosaic's divisibility prover does
        # not see through the subtraction — assert it.
        start = pl.multiple_of(tile * T - H, 128)
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(start, T + 2 * H)],
            xbuf.at[slot],
            sems.at[slot],
        )

    @pl.when(t == 0)
    def _():  # prefetch the first interior tile while writing halo zeros
        dma(1 % 2, 1).start()

    @pl.when((t + 2 < nt) & (t > 0))
    def _():
        dma((t + 1) % 2, t + 1).start()

    @pl.when(~interior)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(interior)
    def _():
        dma(t % 2, t).wait()
        slot = t % 2
        acc = jnp.zeros((mpad, T), jnp.float32)
        for d in range(ndiag):
            off = offsets[d]
            window = xbuf[slot, :, H + off : H + off + T]
            acc = acc + data_ref[d][None, :].astype(jnp.float32) * window.astype(
                jnp.float32
            )
        out_ref[:] = acc.astype(out_ref.dtype)


def dia_spmm_t_pallas_padded(
    A: DIAMatrix, Xp: jax.Array, layout: PaddedLayout, interpret: bool = False
) -> jax.Array:
    """Yp = (A @ X) in the persistent padded layout (see PaddedLayout).

    ``Xp`` must be ``layout.pad``-ded; the result has the same shape with the
    halo tiles zeroed, so applications chain with zero marshalling cost.
    """
    L = layout
    if Xp.shape != (L.mpad, L.width):
        raise ValueError(f"padded X has shape {Xp.shape}, want {(L.mpad, L.width)}")
    ndiag = len(A.offsets)
    # coefficients padded one tile each side: halo coefficients are zero,
    # which is what writes the output halo tiles to zero
    data = A.data
    pad_r = L.n_pad - L.n
    data = jnp.pad(data, ((0, 0), (L.T, pad_r + L.T)))

    kernel = functools.partial(_kernel_padded, A.offsets, L.T, L.H, L.mpad, ndiag)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L.mpad, L.width), Xp.dtype),
        grid=(L.nt + 2,),
        in_specs=[
            pl.BlockSpec((ndiag, L.T), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (L.mpad, L.T), lambda t: (0, t), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, L.mpad, L.T + 2 * L.H), Xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * L.n * L.m,
            bytes_accessed=(ndiag * L.n + 2 * L.n * L.m) * Xp.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(data, Xp)
