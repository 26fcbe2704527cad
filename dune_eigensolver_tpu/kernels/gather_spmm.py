"""Windowed-gather Pallas SpMM for general (ELL / block-ELL) sparsity.

TPU-native replacement for the reference's arbitrary-pattern CSR/BCRS
multi-RHS kernels (``matmul_sparse_tallskinny_*``, kernels_cpp.hh:626-657;
kernels_avx2.hh:1021-1059; blocks umfpacktools.hh:57-95). The reference
streams CSR rows and gathers X entries column-by-column; the TPU has no
scalar gather pipe, but Mosaic lowers ``take_along_axis`` along the lane
dimension to a hardware ``dynamic_gather`` when the index array matches the
source shape. That primitive shapes the whole design:

* rows are tiled (``Tr`` scalar columns of the transposed multivector per
  grid step) and, like nearly every FEM/graph operator after an RCM-style
  ordering, each row tile's column support fits a bounded WINDOW of X;
* the window arrives through two W-wide auto-pipelined blocked inputs
  (index maps ``starts[t] // W`` and ``+1`` — per-tile starts are
  scalar-prefetched) and one dynamic lane-slice; the kernel then runs one
  lane-gather + FMA per ELL slot — k gathers of (m, W) replace the
  reference's nnz scalar gathers. No manual cross-grid-step DMA: that
  pattern silently corrupts on v5e (see dia_spmm.py, same finding);
* the block variant (br, bc) keeps the SAME gather core: coefficients are
  stored as br*bc planar slabs, each (slot, u) gathers the u-th scalar
  column of the block columns, accumulates br planar outputs, and ONE final
  static-permutation gather interleaves the planes into the blocked column
  order — no strided lane access anywhere.

Containers carry everything pre-relativized (cols are window-relative, rows
padded to the tile grid), so the hot loop does zero index arithmetic beyond
``rel * bc + u``. Operands whose window would overflow VMEM raise at setup
and callers fall back to the XLA gather formulations (sparse/spmm.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dune_eigensolver_tpu.sparse.formats import (
    BSRMatrix,
    ELLMatrix,
    bsr_from_scipy,
    ell_from_scipy,
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# X-window VMEM model: 2 double-buffered W-blocks per pipelined input (x2
# inputs) + the concat/slice temporaries ~ 7 * mpad * W * 4 B. Budget
# matches dia_spmm's empirical safe point for composed solver programs
# (~5 MB modeled); wider supports must use the XLA fallback.
_VMEM_BUDGET = 5 * 2**20
_W_MAX = 64 * 1024


def _w_cap(m: int) -> int:
    mpad = _round_up(max(m, 8), 8)
    return min(_W_MAX, (_VMEM_BUDGET // (7 * 4 * mpad) // 128) * 128)


@dataclasses.dataclass(frozen=True)
class WindowedELL:
    """ELL operand pre-arranged for the windowed-gather kernel.

    data/cols are transposed to (k, n_pad) — slots on sublanes, rows on
    lanes — and cols are RELATIVE to the owning tile's window start.
    """

    data: jax.Array  # (k, n_pad)
    cols_rel: jax.Array  # (k, n_pad) int32, window-relative
    starts: jax.Array  # (nt,) int32 window starts (scalar cols)
    shape: Tuple[int, int]  # static, logical
    tile: int  # static Tr (scalar columns per grid step)
    window: int  # static W
    nnz: int  # static

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def width(self) -> int:
        return self.data.shape[-1]

    @property
    def dtype(self):
        return self.data.dtype

    def padded_diagonal(self, fill=1.0) -> jax.Array:
        """(n_pad,) diagonal with ``fill`` in the padded tail (guard-safe
        Jacobi scaling, same contract as PaddedDIA.padded_diagonal)."""
        n, width = self.n, self.width
        lane = jnp.arange(width, dtype=jnp.int32)
        t = lane // self.tile
        absolute = self.cols_rel + self.starts[t][None, :]
        on_diag = absolute == lane[None, :]
        first = on_diag & (jnp.cumsum(on_diag, axis=0) == 1)
        diag = jnp.sum(jnp.where(first, self.data, 0), axis=0)
        return jnp.where(lane < n, diag, jnp.asarray(fill, self.dtype))

    def diagonal(self) -> jax.Array:
        return self.padded_diagonal(fill=1.0)[: self.n]

    def to_logical(self) -> ELLMatrix:
        """Recover the plain ELLMatrix (setup/verification use)."""
        n, k = self.n, self.data.shape[0]
        t = jnp.arange(self.width, dtype=jnp.int32) // self.tile
        cols_abs = self.cols_rel + self.starts[t][None, :]
        data = self.data[:, :n].T
        cols = jnp.clip(cols_abs[:, :n].T, 0, n - 1)
        # padding slots carry zero data; clamp keeps their indices valid
        return ELLMatrix(data=data, cols=cols, shape=self.shape, nnz=self.nnz)


jax.tree_util.register_dataclass(
    WindowedELL,
    data_fields=["data", "cols_rel", "starts"],
    meta_fields=["shape", "tile", "window", "nnz"],
)


@dataclasses.dataclass(frozen=True)
class WindowedBSR:
    """Block-ELL operand for the windowed-gather kernel.

    ``planes[(a*bc + u)*k + j]`` holds coefficient (a, u) of slot j for
    every block row (lanes). ``bcols_rel`` are BLOCK indices relative to
    ``starts[t] // bc`` (starts are multiples of 128*bc so block alignment
    survives the clamp).
    """

    planes: jax.Array  # (br*bc*k, nbr_pad)
    bcols_rel: jax.Array  # (k, nbr_pad) int32
    starts: jax.Array  # (nt,) int32 scalar-column window starts
    shape: Tuple[int, int]  # static, logical (scalar)
    block: Tuple[int, int]  # static (br, bc)
    tile: int  # static Tr in SCALAR columns (= Trb * br)
    window: int  # static W (scalar columns)
    nnz: int  # static

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def k(self) -> int:
        br, bc = self.block
        return self.planes.shape[0] // (br * bc)

    @property
    def width(self) -> int:
        br, _ = self.block
        return self.planes.shape[-1] * br

    @property
    def dtype(self):
        return self.planes.dtype

    def padded_diagonal(self, fill=1.0) -> jax.Array:
        br, bc = self.block
        if br != bc:
            raise ValueError("padded_diagonal: needs square blocks")
        k, nbr_pad = self.k, self.planes.shape[-1]
        blane = jnp.arange(nbr_pad, dtype=jnp.int32)
        t = (blane * br) // self.tile
        start_b = self.starts[t] // bc
        absolute = self.bcols_rel + start_b[None, :]
        on_diag = absolute == blane[None, :]
        first = on_diag & (jnp.cumsum(on_diag, axis=0) == 1)
        # diagonal of block (i, i) is coefficient (a, a) of the on-diag slot
        cols = []
        for a in range(br):
            plane = self.planes[(a * bc + a) * k : (a * bc + a + 1) * k]
            cols.append(jnp.sum(jnp.where(first, plane, 0), axis=0))
        diag = jnp.stack(cols, axis=1).reshape(-1)  # (nbr_pad * br,)
        lane = jnp.arange(diag.shape[0], dtype=jnp.int32)
        return jnp.where(lane < self.n, diag, jnp.asarray(fill, self.dtype))

    def diagonal(self) -> jax.Array:
        return self.padded_diagonal(fill=1.0)[: self.n]

    def to_logical(self) -> BSRMatrix:
        br, bc = self.block
        k = self.k
        nbr = self.n // br
        nbr_pad = self.planes.shape[-1]
        blane = jnp.arange(nbr_pad, dtype=jnp.int32)
        t = (blane * br) // self.tile
        start_b = self.starts[t] // bc
        bcols_abs = self.bcols_rel + start_b[None, :]
        bcols = jnp.clip(bcols_abs[:, :nbr].T, 0, self.shape[1] // bc - 1)
        P = self.planes.reshape(br, bc, k, nbr_pad)
        bdata = jnp.transpose(P[:, :, :, :nbr], (3, 2, 0, 1))  # (nbr, k, br, bc)
        return BSRMatrix(
            bdata=bdata, bcols=bcols, shape=self.shape, block=self.block,
            nnz=self.nnz,
        )


jax.tree_util.register_dataclass(
    WindowedBSR,
    data_fields=["planes", "bcols_rel", "starts"],
    meta_fields=["shape", "block", "tile", "window", "nnz"],
)


# ---------------------------------------------------------------------------
# Setup converters (host-side numpy; one-time cost like the reference's
# BCRS -> CSC conversion at umfpacktools.hh:57-95)
# ---------------------------------------------------------------------------


def _plan_windows(mincol, maxcol, n: int, Tr: int, align: int, w_cap: int):
    """Per-tile window starts + the common width W. mincol/maxcol are
    per-tile scalar column extents (maxcol exclusive)."""
    starts = (mincol // align) * align
    W = int(_round_up(int(np.max(maxcol - starts)) if len(starts) else align, 128))
    W = max(W, _round_up(Tr, 128))
    if W > w_cap:
        raise ValueError(
            f"windowed spmm: required window {W} exceeds the {w_cap}-lane "
            "VMEM cap at this multivector width; use the XLA fallback "
            "(operator support too scattered — consider an RCM reordering "
            "first)"
        )
    width_needed = int(np.max(starts)) + W if len(starts) else W
    return starts.astype(np.int32), W, width_needed


def windowed_from_ell(
    A: ELLMatrix, tile: int = 2048, min_width: int = 0, m: int = 8
) -> WindowedELL:
    """Rearrange an ELLMatrix for the gather kernel (host-side setup).
    ``min_width`` forces a larger padded width (operand-width matching);
    ``m`` is the widest multivector the kernel will stream (VMEM cap)."""
    n, _ = A.shape
    k = A.k
    Tr = int(tile)
    data = np.asarray(A.data)
    cols = np.asarray(A.cols, dtype=np.int64)
    n_pad = _round_up(max(n, 1), Tr)
    nt = n_pad // Tr
    # per-row extents; padding rows (>= n) follow their tile's start
    row_min = cols.min(axis=1) if k else np.zeros(n, np.int64)
    row_max = cols.max(axis=1) + 1 if k else np.ones(n, np.int64)
    mincol = np.full(nt, 0, np.int64)
    maxcol = np.full(nt, 1, np.int64)
    for t in range(nt):
        lo, hi = t * Tr, min((t + 1) * Tr, n)
        if lo < n:
            mincol[t] = row_min[lo:hi].min()
            maxcol[t] = row_max[lo:hi].max()
    starts, W, width_needed = _plan_windows(mincol, maxcol, n, Tr, 128, _w_cap(m))
    n_pad = _round_up(max(n_pad, width_needed, int(min_width)), Tr)
    nt = n_pad // Tr
    starts = np.concatenate([starts, np.zeros(nt - len(starts), np.int32)])
    starts = np.minimum(starts, n_pad - W).astype(np.int32)

    data_t = np.zeros((k, n_pad), data.dtype)
    cols_rel = np.zeros((k, n_pad), np.int32)
    data_t[:, :n] = data.T
    tile_of = np.arange(n) // Tr
    rel = cols - starts[tile_of][:, None]
    if rel.size and (rel.min() < 0 or rel.max() >= W):
        raise AssertionError("window planning failed to cover all columns")
    cols_rel[:, :n] = rel.T
    return WindowedELL(
        data=jnp.asarray(data_t),
        cols_rel=jnp.asarray(cols_rel),
        starts=jnp.asarray(starts),
        shape=A.shape,
        tile=Tr,
        window=W,
        nnz=A.nnz,
    )


def windowed_from_bsr(
    A: BSRMatrix, tile: int = 2048, min_width: int = 0, m: int = 8
) -> WindowedBSR:
    """Rearrange a block-ELL matrix for the gather kernel."""
    br, bc = A.block
    n = A.shape[0]
    nbr, k = A.bcols.shape
    # scalar tile Tr = Trb * br must be a multiple of 128
    Trb = max(128, (int(tile) // (128 * br)) * 128)
    Tr = Trb * br
    bdata = np.asarray(A.bdata)
    bcols = np.asarray(A.bcols, dtype=np.int64)
    nbr_pad = _round_up(max(nbr, 1), Trb)
    nt = nbr_pad // Trb
    row_min = bcols.min(axis=1) * bc if k else np.zeros(nbr, np.int64)
    row_max = (bcols.max(axis=1) + 1) * bc if k else np.ones(nbr, np.int64)
    mincol = np.full(nt, 0, np.int64)
    maxcol = np.full(nt, 1, np.int64)
    for t in range(nt):
        lo, hi = t * Trb, min((t + 1) * Trb, nbr)
        if lo < nbr:
            mincol[t] = row_min[lo:hi].min()
            maxcol[t] = row_max[lo:hi].max()
    starts, W, width_needed = _plan_windows(
        mincol, maxcol, n, Tr, 128 * bc, _w_cap(m)
    )
    # the end-of-array clamp below floors starts to 128*bc AFTER clamping,
    # which can shift a window left by up to 128*bc-1; widen W to keep the
    # right edge covered
    W += 128 * bc
    width_needed += 128 * bc
    nbr_pad = _round_up(
        max(nbr_pad, -(-width_needed // br), -(-int(min_width) // br)), Trb
    )
    nt = nbr_pad // Trb
    starts = np.concatenate([starts, np.zeros(nt - len(starts), np.int32)])
    starts = np.minimum(starts, nbr_pad * br - W)
    starts = (starts // (128 * bc)) * (128 * bc)
    starts = np.maximum(starts, 0).astype(np.int32)

    planes = np.zeros((br * bc * k, nbr_pad), bdata.dtype)
    for a in range(br):
        for u in range(bc):
            planes[(a * bc + u) * k : (a * bc + u + 1) * k, :nbr] = (
                bdata[:, :, a, u].T
            )
    bcols_rel = np.zeros((k, nbr_pad), np.int32)
    tile_of = np.arange(nbr) // Trb
    rel = bcols - (starts[tile_of][:, None] // bc)
    if rel.size and (rel.min() < 0 or (rel.max() + 1) * bc > W):
        raise AssertionError("window planning failed to cover all block columns")
    bcols_rel[:, :nbr] = rel.T
    return WindowedBSR(
        planes=jnp.asarray(planes),
        bcols_rel=jnp.asarray(bcols_rel),
        starts=jnp.asarray(starts),
        shape=A.shape,
        block=A.block,
        tile=Tr,
        window=W,
        nnz=A.nnz,
    )


class WindowedLayout:
    """pad/unpad helper mirroring PaddedLayout's interface for the solver
    engine (solvers/engine.py): right-padded, guard G = 0."""

    G = 0

    def __init__(self, n: int, width: int):
        self.n = int(n)
        self.width = int(width)

    def pad(self, Xt: jax.Array) -> jax.Array:
        return jnp.pad(Xt, ((0, 0), (0, self.width - Xt.shape[1])))

    def unpad(self, Xp: jax.Array, m: Optional[int] = None) -> jax.Array:
        out = Xp[:, : self.n]
        return out if m is None else out[:m]

    def pad_vec(self, v: jax.Array, fill=0.0) -> jax.Array:
        out = jnp.full((self.width,), fill, v.dtype)
        return jax.lax.dynamic_update_slice(out, v, (0,))


def _lcm(a: int, b: int) -> int:
    import math

    return a * b // math.gcd(a, b)


def make_windowed_operands(A, B=None, tile: int = 2048, m: int = 8):
    """(A_int, B_int, WindowedLayout) for general-sparsity operand pairs.

    Accepts ELL/BSR/DIA in any combination (DIA members are converted to
    ELL on the host); both operands are padded to a COMMON width on a
    COMMON scalar tile so multivectors flow through either SpMM without
    re-marshalling. ``m``: widest multivector the kernel will stream
    (bounds the VMEM window). Raises ValueError when a window would
    overflow VMEM (callers fall back to the plain XLA formulations)."""
    from dune_eigensolver_tpu.sparse.formats import DIAMatrix

    def block_rows(M):
        return M.block[0] if isinstance(M, BSRMatrix) else 1

    ops = [A] + ([B] if B is not None else [])
    base = 128
    for M in ops:
        base = _lcm(base, 128 * block_rows(M))
    Tr = max(base, (int(tile) // base) * base)

    def build(M, min_width=0):
        if isinstance(M, DIAMatrix):
            M = ell_from_scipy(M.to_scipy(), dtype=np.asarray(M.data).dtype)
        if isinstance(M, ELLMatrix):
            return windowed_from_ell(M, tile=Tr, min_width=min_width, m=m)
        if isinstance(M, BSRMatrix):
            return windowed_from_bsr(M, tile=Tr, min_width=min_width, m=m)
        raise TypeError(f"make_windowed_operands: unsupported {type(M)}")

    A_int = build(A)
    if B is None:
        return A_int, None, WindowedLayout(A.shape[0], A_int.width)
    B_int = build(B)
    wmax = max(A_int.width, B_int.width)
    if A_int.width != wmax:
        A_int = build(A, min_width=wmax)
    if B_int.width != wmax:
        B_int = build(B, min_width=wmax)
    assert A_int.width == B_int.width, "windowed width equalization failed"
    return A_int, B_int, WindowedLayout(A.shape[0], wmax)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _gather_kernel(
    br, bc, k, Tr, Trb, W, mpad,
    starts_ref, data_ref, cols_ref, xlo_ref, xhi_ref, *rest,
):
    # rest = (dead_ref?, out_ref): dead_ref is the donated output buffer
    # passed as a dummy input (see windowed_spmm_t out_buf) — never read.
    out_ref = rest[-1]
    # The tile's X window [starts[t], starts[t]+W) straddles at most two
    # W-aligned blocks; both arrive through ordinary auto-pipelined blocked
    # inputs (index maps starts[t]//W and +1) and one dynamic lane-slice
    # extracts the window. No manual cross-grid-step DMA: on v5e hardware
    # async copies started in one grid step and waited in the next are not
    # reliably supported (silent corruption / backend errors — see
    # dia_spmm.py, same finding).
    t = pl.program_id(0)
    s = starts_ref[t]
    off = s - (s // W) * W  # in [0, W)
    pair = jnp.concatenate([xlo_ref[...], xhi_ref[...]], axis=1)
    # start indices must share off's dtype: a Python-int 0 promotes to int64
    # under x64 and dynamic_slice rejects mixed index dtypes at trace time
    win = jax.lax.dynamic_slice(
        pair, (jnp.zeros((), off.dtype), off), (mpad, W)
    )  # (mpad, W)

    zpad = jnp.zeros((1, W - Trb), jnp.int32)
    accs = [jnp.zeros((mpad, Trb), jnp.float32) for _ in range(br)]
    for j in range(k):
        rel = cols_ref[j : j + 1, :]  # (1, Trb) block-relative
        for u in range(bc):
            idx = jnp.concatenate([rel * bc + u, zpad], axis=1)  # (1, W)
            g = jnp.take_along_axis(
                win, jnp.broadcast_to(idx, (mpad, W)), axis=1
            )[:, :Trb]
            gf = g.astype(jnp.float32)
            for a in range(br):
                coeff = data_ref[(a * bc + u) * k + j][None, :]
                accs[a] = accs[a] + coeff.astype(jnp.float32) * gf
    if br == 1:
        out_ref[:] = accs[0].astype(out_ref.dtype)
    else:
        planes = jnp.concatenate(accs, axis=1)  # (mpad, br*Trb) planar
        c = jax.lax.broadcasted_iota(jnp.int32, (mpad, br * Trb), 1)
        perm = (c % br) * Trb + c // br  # interleave: out[:, i*br+a]
        out_ref[:] = jnp.take_along_axis(planes, perm, axis=1).astype(
            out_ref.dtype
        )


def windowed_spmm_t(
    A, Xp: jax.Array, interpret: bool = False,
    out_buf: Optional[jax.Array] = None,
) -> jax.Array:
    """Yp (m, width) = (A @ X)^T for a Windowed{ELL,BSR} operand; Xp in the
    right-padded internal layout (pad columns zero, preserved by the
    zero-coefficient padded rows).

    ``out_buf``: a DEAD same-shape buffer to donate as the output's storage
    (``input_output_aliases``). Unlike the DIA kernel, aliasing Xp itself is
    UNSAFE here — each tile's gather window looks back at X columns whose
    output tiles were already written — so callers that iterate
    Y = A X inside a while-loop carry ping-pong two buffers and hand the
    dead one here; XLA then writes the kernel output straight into the
    carry slot instead of copying a full multivector per call (the 40%-of-
    wall-time defect the DIA path measured; dia_spmm.py:325-334). The
    donated operand enters the kernel as a dummy input with a minimal
    (8, 128) block pinned to the origin, so the extra DMA traffic is
    negligible; its ref is never read."""
    if isinstance(A, WindowedELL):
        br = bc = 1
        k = A.data.shape[0]
        coeffs, cols = A.data, A.cols_rel
        Trb = A.tile
    elif isinstance(A, WindowedBSR):
        br, bc = A.block
        k = A.k
        coeffs, cols = A.planes, A.bcols_rel
        Trb = A.tile // br
    else:
        raise TypeError(f"windowed_spmm_t: unsupported operand {type(A)}")
    Tr, W = A.tile, A.window
    mpad, width = Xp.shape
    if width != A.width:
        raise ValueError(
            f"windowed_spmm_t: X width {width} != operator width {A.width}"
        )
    if mpad % 8 != 0:
        raise ValueError(f"windowed_spmm_t: m={mpad} not a multiple of 8")
    nt = width // Tr

    kernel = functools.partial(
        _gather_kernel, br, bc, k, Tr, Trb, W, mpad
    )
    nbW = -(-width // W)  # W-aligned block count (last may be partial)

    in_specs = [
        pl.BlockSpec((coeffs.shape[0], Trb), lambda t, s: (0, t)),
        pl.BlockSpec((k, Trb), lambda t, s: (0, t)),
        pl.BlockSpec((mpad, W), lambda t, s: (0, s[t] // W)),
        pl.BlockSpec(
            (mpad, W),
            lambda t, s: (0, jnp.minimum(s[t] // W + 1, nbW - 1)),
        ),
    ]
    operands = [A.starts, coeffs, cols, Xp, Xp]
    io_alias = {}
    if out_buf is not None:
        if out_buf.shape != (mpad, width) or out_buf.dtype != Xp.dtype:
            raise ValueError(
                f"windowed_spmm_t: out_buf {out_buf.shape}/{out_buf.dtype} "
                f"!= output ({mpad}, {width})/{Xp.dtype}"
            )
        in_specs.append(
            pl.BlockSpec((min(mpad, 8), 128), lambda t, s: (0, 0))
        )
        operands.append(out_buf)
        io_alias = {5: 0}  # (starts, coeffs, cols, xlo, xhi, out_buf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((mpad, Tr), lambda t, s: (0, t)),
    )
    flops = 2 * A.nnz * mpad
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mpad, width), Xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                coeffs.size + cols.size + 3 * mpad * width
            ) * Xp.dtype.itemsize,
            transcendentals=0,
        ),
        input_output_aliases=io_alias,
        interpret=interpret,
    )(*operands)
