"""Segmented vreg-gather Pallas SpMM for general (ELL / block-ELL) sparsity.

TPU-native replacement for the reference's arbitrary-pattern CSR/BCRS
multi-RHS kernels (``matmul_sparse_tallskinny_*``, kernels_cpp.hh:626-657;
kernels_avx2.hh:1021-1059; blocks umfpacktools.hh:57-95). The reference
streams CSR rows and gathers X entries scalar-by-scalar; the TPU's only
irregular-access primitive is ``tpu.dynamic_gather``, and hardware probing
(experiments/mosaic_gather_probe.py, v5e) pins its actual contract:

* lane gathers are limited to a SINGLE vreg along the gather dimension —
  a (m, 128) source; any wider ``take_along_axis`` fails to lower
  ("Multiple source vregs along gather dimension"). A W-wide windowed
  gather is therefore impossible; gathers must be planned at 128-lane
  granularity.
* dynamic indexing of the leading dim of a 3D VMEM ref IS supported, as is
  a 128-aligned dynamic lane slice.

Those two facts shape the design:

* rows are tiled (``Tr`` scalar columns of the transposed multivector per
  grid step) and, like nearly every FEM/graph operator after an RCM-style
  ordering, each row tile's column support fits a bounded WINDOW of X;
* the window arrives through ``K = W//Tr + 1`` Tr-granular auto-pipelined
  blocked inputs (index maps ``starts[t] // Tr + k``; per-tile starts are
  scalar-prefetched) and is staged once per (tile, m-block) into a
  (K*Tr/128, mb, 128) VMEM scratch of 128-lane blocks. Tr granularity
  fetches W + Tr lanes of X per tile instead of the 2W of a slab-pair
  scheme — less over-fetch and less VMEM, so wider m-blocks fit;
* every matrix entry is host-assigned to a SEGMENT ``s`` identified by a
  static block offset ``offs[s] = col//128 - row//128`` plus a
  multiplicity rank, so the hot loop per segment is: one dynamic scratch
  load of the (m, 128) source block at ``row_block + offs[s]`` (pure
  in-kernel scalar arithmetic — no per-segment metadata), one single-vreg
  lane gather with the segment's stored ``col % 128`` lanes, one FMA.
  k' = smax such gathers replace the reference's nnz scalar gathers;
* segmentation is HYBRID: only (offset, rank) slots covering at least
  ``_KEEP_MIN_FRAC`` of the rows become kernel segments (FEM/stencil
  patterns land ~0.9 fill); the irregular remainder — boundary-row
  stragglers, long-range graph edges, or entire unbandable random
  patterns — is carried as a padded COO tail applied by an XLA
  gather + scatter-add after the kernel. Correctness never depends on
  bandability; only the fast-path fraction does;
* block (BSR) operands are scalar-expanded at setup: the segment planner
  is pattern-agnostic, so FieldMatrix blocks need no special kernel.

Containers carry everything pre-relativized (lanes are 128-block-relative,
rows padded to the tile grid), so the hot loop does zero index arithmetic
beyond the per-subgroup block base. Operands whose window or segment count
would overflow VMEM raise at setup and callers fall back to the XLA gather
formulations (sparse/spmm.py).
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
    ell_from_scipy,
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# X-window VMEM model: K = W//Tr + 1 double-buffered Tr-wide pipelined
# inputs + the (K*Tr/128, mb, 128) staging scratch ~ 3 * (W+Tr) * mb * 4 B,
# plus segment coefficient (f32) / lane (int8) blocks and the output tile.
# ``mb`` is the M-TILING block: wide multivectors are served in mb-row
# blocks by a second (inner) grid axis, so the VMEM window is per-m-block
# instead of whole-m and the m ceiling is gone (VERDICT r3 ask #2 — the
# reference's CSR kernels serve any m in blocks of 8,
# kernels_cpp.hh:626-657; GenEO production blocks are m=128,
# TPU_LARGE_M_r03). The window cap is set by the mb=8 floor; the kernel
# then picks the LARGEST mb that fits. Budget matches dia_spmm's empirical
# safe point for composed solver programs (~5 MB modeled); wider supports
# must use the XLA fallback.
_VMEM_BUDGET = 5 * 2**20
_W_MAX = 64 * 1024
# lane indices live in [0, 128): stream them as int8 (the coefficient+lane
# stream is the dominant HBM traffic at small m — 127 MB at f32+i32 on the
# n=522k elasticity operand, 79 MB with i8 lanes); widened to i32 in-kernel
_LANE_DTYPE = np.int8
# segments per operand: past this the coefficient arrays are mostly padding
# (pattern too irregular for static-offset segmentation); lower-coverage
# slots spill to the COO tail instead.
_SMAX_CAP = 48
# an (offset, rank) slot must cover at least this fraction of the rows to
# earn a kernel segment. The tradeoff is lopsided: a segment costs one
# n-lane coefficient+lane stream (~tens of us at HBM rate) while a COO-tail
# entry costs an XLA gather + scatter-add element (~100 ns measured on
# v5e — the tail dominated the first hardware capture at 1.3% of nnz), so
# break-even coverage is ~0.1% of rows; _SMAX_CAP bounds the worst case.
_KEEP_MIN_FRAC = 1.0 / 1024.0


def _w_cap(m: int = 8, smax: int = 8, tile: int = 2048) -> int:
    """Window cap at the mb=8 m-tiling floor (``m`` is accepted for API
    stability but no longer moves the cap — any m is served in blocks)."""
    mb = 8
    rest = 2 * smax * tile * (4 + 1) + 2 * mb * tile * 4
    cap = (_VMEM_BUDGET - rest) // (3 * 4 * mb) - tile
    return min(_W_MAX, max(0, cap) // 128 * 128)


def _validate_vmem(W: int, smax: int, Tr: int, what: str = "windowed spmm") -> None:
    """Raise when even the mb=8 m-tiling floor exceeds the modeled VMEM
    budget. ``_pick_mb`` silently returns mb=8 when nothing fits — the same
    modeled-budget overrun class that previously produced silent NaNs
    (utils/paranoid.py); plan builders must call this instead of trusting
    the floor (ADVICE r4: dist plan unification can grow W/smax past any
    per-shard plan's validated point)."""
    mb = 8
    need = 3 * mb * (W + Tr) * 4 + 2 * mb * Tr * 4 + 2 * smax * Tr * (4 + 1)
    if need > _VMEM_BUDGET:
        raise ValueError(
            f"{what}: window {W} x {smax} segments needs a modeled "
            f"{need / 2**20:.1f} MB of VMEM even at the mb=8 m-tiling "
            f"floor (budget {_VMEM_BUDGET / 2**20:.1f} MB); use the XLA "
            "fallback or a narrower-band ordering"
        )


def _pick_mb(mpad: int, W: int, smax: int, Tr: int) -> int:
    """Largest m-block (divisor of mpad, multiple of 8, <= 128) whose
    staging window + output tile fit the VMEM budget."""
    best = 8
    rest = 2 * smax * Tr * (4 + 1)
    for mb in (8, 16, 24, 32, 40, 48, 64, 96, 128):
        if mb > mpad or mpad % mb:
            continue
        if 3 * mb * (W + Tr) * 4 + 2 * mb * Tr * 4 + rest <= _VMEM_BUDGET:
            best = mb
    return best


def _w_cap_blocked(smax_b: int, b: int, tile: int) -> int:
    """Window cap at the mb=8 floor for the BLOCKED kernel: each segment
    streams b f32 coefficient rows + one int8 lane row."""
    mb = 8
    rest = 2 * smax_b * tile * (b * 4 + 1) + 2 * mb * tile * 4
    cap = (_VMEM_BUDGET - rest) // (3 * 4 * mb) - tile
    return min(_W_MAX, max(0, cap) // 128 * 128)


def _pick_mb_blocked(mpad: int, W: int, smax_b: int, b: int, Tr: int) -> int:
    best = 8
    rest = 2 * smax_b * Tr * (b * 4 + 1)
    for mb in (8, 16, 24, 32, 40, 48, 64, 96, 128):
        if mb > mpad or mpad % mb:
            continue
        if 3 * mb * (W + Tr) * 4 + 2 * mb * Tr * 4 + rest <= _VMEM_BUDGET:
            best = mb
    return best


@dataclasses.dataclass(frozen=True)
class WindowedELL:
    """Segmented ELL operand pre-arranged for the vreg-gather kernel.

    ``data``/``lanes`` are (smax, n_pad) — segments on sublanes, rows on
    lanes. Entry (s, i) contributes ``data[s,i] * X[col]`` with
    ``col = (i//128 + offs[s]) * 128 + lanes[s,i]``; absent entries carry
    ``data == 0``. ``lanes`` values live in [0, 128) and are stored int8
    (widened in-kernel) — the lane stream is pure HBM traffic. ``starts``
    are per-row-tile X-window starts (multiples of 128) used only for
    pipelining X slabs into VMEM.

    ``far_*`` hold the COO tail: entries whose (offset, rank) slot was too
    sparsely covered to earn a kernel segment. Padded to a lane multiple
    with zero values (pad rows/cols point at valid indices); applied by an
    XLA gather + scatter-add after the kernel. ``far_nnz == 0`` (static)
    skips the tail entirely.
    """

    data: jax.Array  # (smax, n_pad)
    lanes: jax.Array  # (smax, n_pad) int8 in [0, 128)
    starts: jax.Array  # (nt,) int32 window starts (scalar cols)
    far_rows: jax.Array  # (nfar_pad,) int32
    far_cols: jax.Array  # (nfar_pad,) int32
    far_vals: jax.Array  # (nfar_pad,)
    offs: Tuple[int, ...]  # static per-segment block offsets
    shape: Tuple[int, int]  # static, logical
    tile: int  # static Tr (scalar columns per grid step)
    window: int  # static W (scalar columns per pipelined slab)
    nnz: int  # static
    far_nnz: int  # static (0 = no tail)

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def width(self) -> int:
        return self.data.shape[-1]

    @property
    def dtype(self):
        return self.data.dtype

    def _cols_abs(self) -> jax.Array:
        lane = jnp.arange(self.width, dtype=jnp.int32)
        offs = jnp.asarray(self.offs, jnp.int32)[:, None]
        return (lane[None, :] // 128 + offs) * 128 + self.lanes.astype(
            jnp.int32
        )

    def padded_diagonal(self, fill=1.0) -> jax.Array:
        """(n_pad,) diagonal with ``fill`` in the padded tail (guard-safe
        Jacobi scaling, same contract as PaddedDIA.padded_diagonal)."""
        lane = jnp.arange(self.width, dtype=jnp.int32)
        on_diag = (self._cols_abs() == lane[None, :]) & (self.data != 0)
        diag = jnp.sum(jnp.where(on_diag, self.data, 0), axis=0)
        if self.far_nnz:
            hit = (self.far_rows == self.far_cols) & (self.far_vals != 0)
            diag = diag.at[self.far_rows].add(
                jnp.where(hit, self.far_vals, 0)
            )
        return jnp.where(lane < self.n, diag, jnp.asarray(fill, self.dtype))

    def diagonal(self) -> jax.Array:
        return self.padded_diagonal(fill=1.0)[: self.n]

    def to_logical(self) -> ELLMatrix:
        """Recover a plain ELLMatrix (host-side setup/verification use;
        block operands come back scalar-expanded)."""
        import scipy.sparse as sp

        n = self.n
        cols = np.clip(np.asarray(self._cols_abs()), 0, self.shape[1] - 1)
        data = np.asarray(self.data)
        s, r = np.nonzero(data)
        rows = np.concatenate([r, np.asarray(self.far_rows)])
        cc = np.concatenate([cols[s, r], np.asarray(self.far_cols)])
        vv = np.concatenate([data[s, r], np.asarray(self.far_vals)])
        keep = (vv != 0) & (rows < n)
        S = sp.coo_matrix(
            (vv[keep], (rows[keep], cc[keep])), shape=self.shape
        ).tocsr()
        return ell_from_scipy(S, dtype=data.dtype)


jax.tree_util.register_dataclass(
    WindowedELL,
    data_fields=["data", "lanes", "starts", "far_rows", "far_cols",
                 "far_vals"],
    meta_fields=["offs", "shape", "tile", "window", "nnz", "far_nnz"],
)


@dataclasses.dataclass(frozen=True)
class WindowedBSR(WindowedELL):
    """Block (BSR) operand, scalar-expanded onto the same segmented layout
    (the planner is pattern-agnostic; ``block`` is kept as metadata so
    callers can recover the FieldMatrix block size)."""

    block: Tuple[int, int] = (1, 1)  # static (br, bc)


jax.tree_util.register_dataclass(
    WindowedBSR,
    data_fields=["data", "lanes", "starts", "far_rows", "far_cols",
                 "far_vals"],
    meta_fields=["offs", "shape", "tile", "window", "nnz", "far_nnz",
                 "block"],
)


@dataclasses.dataclass(frozen=True)
class BlockedWindowedBSR(WindowedBSR):
    """BLOCK-AWARE segmented BSR operand: one gather per block-column rank.

    The scalar-expanded layout spends one ``tpu.dynamic_gather`` per scalar
    column of a block — and gathers are 81% of kernel time on v5e
    (experiments/gather_ablate.py). But all ``br`` rows of a (b, b) block
    read the SAME b columns, so one gather whose lane pattern is
    ``colbase + (i % b)`` fetches each needed value once at its natural
    lane. Redistribution to the rows that consume each value is DEFERRED:
    the kernel keeps b accumulators, one per within-block row-shift group
    ``g`` — the gathered value at lane i (block row r = i%b) contributes
    ``a[(r+g)%b, r] * G[i]`` to ``acc_g`` via a dense coefficient stream,
    and only ONCE PER 128-LANE SUBGROUP are the b-1 shifted accumulators
    rotated into row alignment (2 ``pltpu.roll`` + 1 select per group;
    rolls ride the same crossbar as gathers, so a per-segment roll scheme
    measured SLOWER than scalar expansion — 732us vs 583us on the 522k
    elasticity operand). Per block rank this costs 1 gather + b FMAs + b
    dense streams, vs b gathers + b FMAs + b streams scalar-expanded: the
    dominant gather count drops by the block factor b — the TPU analogue
    of the reference streaming its matrix once per RHS block
    (kernels_cpp.hh:626-657, kernels_avx2.hh:1021-1059).

    Requires br == bc == b with b | 128 (blocks never straddle a 128-lane
    vreg; BSR column bases are b-aligned by construction). ``bdata`` packs
    the b coefficient streams per segment row-major: row ``s*b + g`` holds
    ``a[(i%b + g) % b, i%b]`` at lane i. The inherited scalar-segment
    arrays ``data``/``lanes`` are EMPTY (0, width) and the kernel never
    reads them; ``offs`` is ().
    """

    bdata: jax.Array = None  # (smax_b * b, width)
    blanes: jax.Array = None  # (smax_b, width) int8: colbase%128 + i%b
    boffs: Tuple[int, ...] = ()  # static per-segment 128-block offsets

    @property
    def dtype(self):
        return self.bdata.dtype

    def _block_cols_base(self) -> jax.Array:
        """(smax_b, width) absolute scalar column of each segment's
        gathered VALUE at each lane (colbase + i%b)."""
        lane = jnp.arange(self.width, dtype=jnp.int32)
        boffs = jnp.asarray(self.boffs, jnp.int32)[:, None]
        return (lane[None, :] // 128 + boffs) * 128 + self.blanes.astype(
            jnp.int32
        )

    def padded_diagonal(self, fill=1.0) -> jax.Array:
        b = self.block[0]
        lane = jnp.arange(self.width, dtype=jnp.int32)
        r = lane % b
        base = self._block_cols_base()
        diag = jnp.zeros((self.width,), self.bdata.dtype)
        for g in range(b):
            vals = self.bdata[g::b]  # (smax_b, width), shift group g
            row_dst = lane - r + (r + g) % b  # row the stream lands in
            on = (base == row_dst[None, :]) & (vals != 0)
            diag = diag.at[row_dst].add(
                jnp.sum(jnp.where(on, vals, 0), axis=0)
            )
        if self.far_nnz:
            hit = (self.far_rows == self.far_cols) & (self.far_vals != 0)
            diag = diag.at[self.far_rows].add(
                jnp.where(hit, self.far_vals, 0)
            )
        return jnp.where(lane < self.n, diag, jnp.asarray(fill, self.dtype))

    def to_logical(self) -> ELLMatrix:
        import scipy.sparse as sp

        b = self.block[0]
        n = self.n
        bdata = np.asarray(self.bdata)
        base = np.asarray(self._block_cols_base())
        lane = np.arange(self.width)
        r = lane % b
        row_dst = lane - r + (r + np.arange(b)[:, None]) % b  # (b, width)
        rows_l, cols_l, vals_l = [], [], []
        for g in range(b):
            vals = bdata[g::b]
            s_, i_ = np.nonzero(vals)
            rows_l.append(row_dst[g, i_])
            cols_l.append(base[s_, i_])
            vals_l.append(vals[s_, i_])
        rows = np.concatenate(rows_l + [np.asarray(self.far_rows)])
        ccs = np.concatenate(cols_l + [np.asarray(self.far_cols)])
        vvs = np.concatenate(vals_l + [np.asarray(self.far_vals)])
        keep = (vvs != 0) & (rows < n) & (ccs >= 0) & (ccs < self.shape[1])
        S = sp.coo_matrix(
            (vvs[keep], (rows[keep], ccs[keep])), shape=self.shape
        ).tocsr()
        return ell_from_scipy(S, dtype=bdata.dtype)


jax.tree_util.register_dataclass(
    BlockedWindowedBSR,
    data_fields=["data", "lanes", "starts", "far_rows", "far_cols",
                 "far_vals", "bdata", "blanes"],
    meta_fields=["offs", "shape", "tile", "window", "nnz", "far_nnz",
                 "block", "boffs"],
)


# ---------------------------------------------------------------------------
# Setup planner (host-side numpy; one-time cost like the reference's
# BCRS -> CSC conversion at umfpacktools.hh:57-95)
# ---------------------------------------------------------------------------


def _plan_windows(mincol, maxcol, Tr: int, w_cap: int):
    """Per-tile window starts + the window width W (multiple of Tr).
    mincol/maxcol are per-tile scalar column extents (maxcol exclusive).
    The kernel covers [floor(starts/Tr)*Tr, + (W//Tr + 1)*Tr) via
    Tr-granular slabs, which always contains [starts, starts + W)."""
    starts = (mincol // 128) * 128
    span = int(np.max(maxcol - starts)) if len(starts) else 128
    W = _round_up(max(span, Tr), Tr)
    if W > w_cap:
        raise ValueError(
            f"windowed spmm: required window {W} exceeds the {w_cap}-lane "
            "VMEM cap at this multivector width; use the XLA fallback "
            "(operator support too scattered — consider an RCM reordering "
            "first)"
        )
    # every slab index starts//Tr + k, k < W//Tr + 1, must be a real slab
    K = W // Tr + 1
    width_needed = (
        (int(np.max(starts // Tr)) + K) * Tr if len(starts) else K * Tr
    )
    return starts.astype(np.int32), W, width_needed


def _rank_and_keep(o, valid, nrows: int):
    """Shared slot machinery for the scalar and blocked planners: rank
    entries within their (row, offset) group, compute per-(offset, rank)
    slot coverage, keep the highest-coverage slots (>= ``_KEEP_MIN_FRAC``
    of the rows, capped at ``_SMAX_CAP``). ``o`` is the per-entry static
    offset with invalid entries already set to a sentinel past any real
    offset. Returns (offs list, near mask, seg index per entry)."""
    k = o.shape[1]
    # rank of each entry within its (row, offset) group, by COLUMN order:
    # rank[i, kk] = #{k' < kk : o[i, k'] == o[i, kk]}. Any deterministic
    # per-row order is a valid rank (slots only pair same-offset entries
    # consistently across rows); the k^2/2 vectorized equality passes
    # replace the row sort + stable argsort + scatter that dominated
    # planning at 2.1M dof (~12 s of a 34 s plan).
    rank = np.zeros((nrows, k), np.int64)
    for kk in range(1, k):
        rank[:, kk] = np.sum(o[:, :kk] == o[:, kk : kk + 1], axis=1)

    ov, jv = o[valid], rank[valid]
    if ov.size == 0:
        near = np.zeros((nrows, k), bool)
        return [0], near, np.zeros((nrows, k), np.int64)
    # offsets are bounded by the window in 128-blocks: dedup via bincount
    # + lookup table instead of np.unique's full sort (13 s at 2.1M dof)
    omin = int(ov.min())
    span = int(ov.max()) - omin + 1
    if span <= 1 << 22:
        counts0 = np.bincount(ov - omin, minlength=span)
        uo_idx = np.nonzero(counts0)[0]
        uo = uo_idx + omin
        lut = np.full(span, -1, np.int64)
        lut[uo_idx] = np.arange(len(uo))
        inv = lut[ov - omin]
    else:  # pathological offset spread: fall back to the sorting path
        uo, inv = np.unique(ov, return_inverse=True)
    kmax = int(jv.max()) + 1
    # slot coverage = #entries with (offset o, rank j) — one per covering row
    slot_id = inv * kmax + jv
    cov = np.bincount(slot_id, minlength=len(uo) * kmax)
    live = np.nonzero(cov)[0]
    # keep highest-coverage slots: each segment costs a full n-lane
    # coefficient+lane row, so sparse slots are cheaper as COO entries
    min_cov = max(4, int(_KEEP_MIN_FRAC * nrows))
    keep = live[cov[live] >= min_cov]
    if len(keep) > _SMAX_CAP:
        keep = keep[np.argsort(cov[keep], kind="stable")[::-1][:_SMAX_CAP]]
    keep = np.sort(keep)
    if len(keep) == 0:  # degenerate: everything rides the tail
        near = np.zeros((nrows, k), bool)
        return [0], near, np.zeros((nrows, k), np.int64)
    offs = [int(uo[sid // kmax]) for sid in keep]
    # map slot_id -> segment index (or -1 = tail)
    seg_of = np.full(len(uo) * kmax, -1, np.int64)
    seg_of[keep] = np.arange(len(keep))
    seg = np.zeros((nrows, k), np.int64)
    seg_valid = seg_of[slot_id]
    seg[valid] = seg_valid
    near = np.zeros((nrows, k), bool)
    near[valid] = seg_valid >= 0
    return offs, near, seg


def _plan_segments(data, cols, n: int):
    """Assign entries to (static block offset, multiplicity rank) slots and
    split them into kernel segments vs the COO tail.

    A slot (o, j) covers the rows whose j-th entry at block offset ``o``
    exists; its coverage equals the number of such entries. Slots covering
    at least ``_KEEP_MIN_FRAC`` of the rows (capped at ``_SMAX_CAP`` total,
    highest coverage first) become kernel segments; everything else goes to
    the tail. Returns (offs list, near mask, seg index per entry, valid
    mask). Entries with zero coefficient are treated as absent."""
    nrows, k = cols.shape
    valid = data != 0
    r = np.arange(nrows, dtype=np.int64)[:, None]
    o = np.where(valid, cols // 128 - r // 128, np.int64(2**40))
    offs, near, seg = _rank_and_keep(o, valid, nrows)
    return offs, near, seg, valid


def windowed_from_ell(
    A: ELLMatrix, tile: int = 2048, min_width: int = 0, m: int = 8,
) -> WindowedELL:
    """Rearrange an ELLMatrix for the vreg-gather kernel (host-side setup).
    ``min_width`` forces a larger padded width (operand-pair matching);
    ``m`` is accepted for API stability (the m-tiled kernel serves any
    multiple of 8)."""
    return _build_segmented(A, WindowedELL, {}, tile, min_width, m)


def windowed_from_bsr(
    A: BSRMatrix, tile: int = 2048, min_width: int = 0, m: int = 8,
    blocked: Optional[bool] = None,
) -> WindowedBSR:
    """Rearrange a block-ELL matrix for the vreg-gather kernel.

    ``blocked=None`` (default) routes square blocks with b | 128 to the
    block-aware planner (one gather serves all b rows of a block — cuts
    the dominant gather count by the block factor); other block shapes
    (and ``blocked=False`` for A/B comparison) scalar-expand onto the
    pattern-agnostic segment planner."""
    br, bc = A.block
    use_blocked = blocked
    if use_blocked is None:
        use_blocked = br == bc and br > 1 and 128 % br == 0
    if use_blocked:
        if br != bc or 128 % br:
            raise ValueError(
                f"blocked windowed planner needs square blocks with "
                f"b | 128, got {A.block}"
            )
        return _build_blocked(A, tile, min_width, m)
    Ae = ell_from_scipy(A.to_scipy(), dtype=np.asarray(A.bdata).dtype)
    return _build_segmented(
        Ae, WindowedBSR, dict(block=A.block), tile, min_width, m
    )


def _build_blocked(
    A: BSRMatrix, tile: int, min_width: int, m: int
) -> BlockedWindowedBSR:
    """Host-side setup for the block-aware kernel: plan segment slots at
    BLOCK granularity ((128-block offset, block rank) per block row), then
    lay out one int8 lane stream (``colbase%128 + i%b``) and 2b-1
    coefficient streams per kept slot; unkept blocks ride the scalar COO
    tail. Mirrors ``_build_segmented``'s window/width rules so blocked and
    scalar operands pair freely in ``make_windowed_operands``."""
    br, bc = A.block
    b = br
    n, _ = A.shape
    Tr = _round_up(max(int(tile), 128), 128)
    bdata = np.asarray(A.bdata)
    bcols = np.asarray(A.bcols, dtype=np.int64)
    nbr, kb = bcols.shape
    valid = (bdata != 0).any(axis=(2, 3))
    Rb = np.arange(nbr, dtype=np.int64)[:, None]
    # b | 128 => every scalar row of block row R shares (R*b)//128, and
    # every scalar column of block col C shares (C*b)//128
    o = np.where(
        valid, (bcols * b) // 128 - (Rb * b) // 128, np.int64(2**40)
    )
    boffs, near, seg = _rank_and_keep(o, valid, nbr)
    smax_b = max(len(boffs), 1)

    # per-scalar-row window extents over NEAR blocks (shared within a
    # block row); rows without near blocks anchor at their own column
    colbase = bcols * b
    cb_min = np.where(near, colbase, np.int64(2**40)).min(axis=1)
    cb_max = np.where(near, colbase, np.int64(-1)).max(axis=1) + b
    row_min = np.repeat(cb_min, b)[:n]
    row_max = np.repeat(cb_max, b)[:n]
    row_min = np.minimum(row_min, np.arange(n))
    row_max = np.maximum(row_max, np.arange(n) + 1)
    n_pad = _round_up(max(n, 1), Tr)
    nt = n_pad // Tr
    mincol = np.zeros(nt, np.int64)
    maxcol = np.ones(nt, np.int64)
    for t in range(nt):
        lo, hi = t * Tr, min((t + 1) * Tr, n)
        if lo < n:
            mincol[t] = row_min[lo:hi].min()
            maxcol[t] = row_max[lo:hi].max()
        else:
            mincol[t], maxcol[t] = t * Tr, t * Tr + 1

    starts, W, width_needed = _plan_windows(
        mincol, maxcol, Tr, _w_cap_blocked(smax_b, b, Tr)
    )
    width = _round_up(max(n_pad, width_needed, int(min_width)), Tr)
    nt = width // Tr
    starts = np.concatenate(
        [starts, (np.arange(len(starts), nt) * Tr).astype(np.int32)]
    )

    blanes_arr = np.zeros((smax_b, width), _LANE_DTYPE)
    bdata_arr = np.zeros((smax_b * b, width), bdata.dtype)
    ri, ki = np.nonzero(near)
    s_ = seg[ri, ki]
    cb = colbase[ri, ki]
    # lane i = R*b + r carries the value X[colbase + r]; stream g holds its
    # coefficient INTO row (r+g)%b of the block: a[(r+g)%b, r]
    for r in range(b):
        i_ = ri * b + r
        blanes_arr[s_, i_] = (cb % 128 + r).astype(_LANE_DTYPE)
        for g in range(b):
            bdata_arr[s_ * b + g, i_] = bdata[ri, ki, (r + g) % b, r]

    # COO tail: unkept blocks, expanded to their nonzero scalar entries
    fr_, fk_ = np.nonzero(valid & ~near)
    rloc = np.repeat(np.arange(b), b)
    cloc = np.tile(np.arange(b), b)
    rows_t = (fr_[:, None] * b + rloc[None, :]).ravel()
    cols_t = (colbase[fr_, fk_][:, None] + cloc[None, :]).ravel()
    vals_t = bdata[fr_, fk_].reshape(len(fr_), b * b).ravel()
    nz = vals_t != 0
    rows_t, cols_t, vals_t = rows_t[nz], cols_t[nz], vals_t[nz]
    far_nnz = len(rows_t)
    nfar_pad = _round_up(max(far_nnz, 1), 128) if far_nnz else 1
    far_rows = np.zeros(nfar_pad, np.int32)
    far_cols = np.zeros(nfar_pad, np.int32)
    far_vals = np.zeros(nfar_pad, bdata.dtype)
    far_rows[:far_nnz] = rows_t
    far_cols[:far_nnz] = cols_t
    far_vals[:far_nnz] = vals_t

    return BlockedWindowedBSR(
        data=jnp.zeros((0, width), bdata.dtype),
        lanes=jnp.zeros((0, width), _LANE_DTYPE),
        starts=jnp.asarray(starts),
        far_rows=jnp.asarray(far_rows),
        far_cols=jnp.asarray(far_cols),
        far_vals=jnp.asarray(far_vals),
        offs=(),
        shape=A.shape,
        tile=Tr,
        window=int(W),
        nnz=A.nnz,
        far_nnz=far_nnz,
        block=A.block,
        bdata=jnp.asarray(bdata_arr),
        blanes=jnp.asarray(blanes_arr),
        boffs=tuple(boffs),
    )


def _build_segmented(A, cls, extra_meta, tile, min_width, m):
    n, _ = A.shape
    Tr = _round_up(max(int(tile), 128), 128)
    data = np.asarray(A.data)
    cols = np.asarray(A.cols, dtype=np.int64)
    k = cols.shape[1] if cols.ndim == 2 else 0
    n_pad = _round_up(max(n, 1), Tr)
    nt = n_pad // Tr

    offs, near, seg, valid = _plan_segments(data, cols, n)
    smax = max(len(offs), 1)

    # per-tile window extents over NEAR entries only (the tail needs no
    # window); rows without near entries anchor at their own column
    cmask = np.where(near, cols, np.int64(2**40))
    cmask_max = np.where(near, cols, np.int64(-1))
    row_min = cmask.min(axis=1) if k else np.full(n, np.int64(2**40))
    row_max = cmask_max.max(axis=1) + 1 if k else np.zeros(n, np.int64)
    row_min = np.minimum(row_min, np.arange(n))
    row_max = np.maximum(row_max, np.arange(n) + 1)
    mincol = np.zeros(nt, np.int64)
    maxcol = np.ones(nt, np.int64)
    for t in range(nt):
        lo, hi = t * Tr, min((t + 1) * Tr, n)
        if lo < n:
            mincol[t] = row_min[lo:hi].min()
            maxcol[t] = row_max[lo:hi].max()
        else:
            mincol[t], maxcol[t] = t * Tr, t * Tr + 1

    starts, W, width_needed = _plan_windows(
        mincol, maxcol, Tr, _w_cap(m, smax, Tr)
    )
    # width is Tr-granular (the kernel's X slabs are Tr-wide); pad tiles'
    # starts anchor at their own tile so their slab indices stay in range
    width = _round_up(max(n_pad, width_needed, int(min_width)), Tr)
    nt = width // Tr
    starts = np.concatenate(
        [starts, (np.arange(len(starts), nt) * Tr).astype(np.int32)]
    )

    data_seg = np.zeros((smax, width), data.dtype)
    lanes = np.zeros((smax, width), _LANE_DTYPE)
    ri, ki = np.nonzero(near)
    data_seg[seg[ri, ki], ri] = data[ri, ki]
    lanes[seg[ri, ki], ri] = (cols[ri, ki] % 128).astype(_LANE_DTYPE)

    # COO tail, padded to a lane multiple with no-op entries
    fr, fk = np.nonzero(valid & ~near)
    far_nnz = len(fr)
    nfar_pad = _round_up(max(far_nnz, 1), 128) if far_nnz else 1
    far_rows = np.zeros(nfar_pad, np.int32)
    far_cols = np.zeros(nfar_pad, np.int32)
    far_vals = np.zeros(nfar_pad, data.dtype)
    far_rows[:far_nnz] = fr
    far_cols[:far_nnz] = cols[fr, fk]
    far_vals[:far_nnz] = data[fr, fk]

    return cls(
        data=jnp.asarray(data_seg),
        lanes=jnp.asarray(lanes),
        starts=jnp.asarray(starts),
        far_rows=jnp.asarray(far_rows),
        far_cols=jnp.asarray(far_cols),
        far_vals=jnp.asarray(far_vals),
        offs=tuple(offs),
        shape=A.shape,
        tile=Tr,
        window=int(W),
        nnz=A.nnz,
        far_nnz=far_nnz,
        **extra_meta,
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


def make_windowed_operands(A, B=None, tile: int = 2048, m: int = 8):
    """(A_int, B_int, WindowedLayout) for general-sparsity operand pairs.

    Accepts ELL/BSR/DIA in any combination (DIA members are converted to
    ELL on the host); both operands are padded to a COMMON width on a
    COMMON scalar tile so multivectors flow through either SpMM without
    re-marshalling (the kernel's X slabs are Tr-granular, so the common
    width is just the max, rounded to Tr; each operand keeps its own
    window W). ``m`` is kept for API stability; since the m-tiling
    rework any multiple of 8 is served regardless of the setup-time value.
    Raises ValueError when a window or segment plan would overflow VMEM
    (callers fall back to the XLA formulations)."""
    from dune_eigensolver_tpu.sparse.formats import DIAMatrix

    Tr = _round_up(max(int(tile), 128), 128)

    def build(M, min_width=0):
        if isinstance(M, DIAMatrix):
            M = ell_from_scipy(M.to_scipy(), dtype=np.asarray(M.data).dtype)
        if isinstance(M, BSRMatrix):
            return windowed_from_bsr(M, tile=Tr, min_width=min_width, m=m)
        if isinstance(M, ELLMatrix):
            return windowed_from_ell(M, tile=Tr, min_width=min_width, m=m)
        raise TypeError(f"make_windowed_operands: unsupported {type(M)}")

    A_int = build(A)
    if B is None:
        return A_int, None, WindowedLayout(A.shape[0], A_int.width)
    B_int = build(B)
    # common width: the kernel's X slabs are Tr-granular (shared Tr), so a
    # plain max suffices — no slab-width lcm equalization needed
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


# roll the per-tile subgroup sweep into a lax.fori_loop instead of
# unrolling ng = Tr/128 copies of the smax-segment body. Measured on v5e
# (experiments/roll_ab.py): rolled compiles 3x faster (1.1 s vs 3.1 s per
# instance) but runs 1.6x SLOWER (870 us vs 549 us at m=8 — the loop
# carries no state, yet Mosaic schedules the gathers much worse inside
# fori). Unrolled stays the default; the probe also showed a single
# kernel instance compiles in seconds, so the ~79 s windowed-SOLVE
# compiles are the SOLVE program (inner-CG while + banded factorization
# scans + several kernel instances), not this body.
_ROLL_G = False


def _seg_kernel(
    offs, smax, Tr, K, mb, acc_dt,
    starts_ref, data_ref, lanes_ref, *rest,
):
    # rest = (x_0..x_{K-1}, dead_ref?, out_ref, scratch): the K Tr-wide X
    # slab inputs, then the optional donated output buffer passed as a
    # dummy input (see windowed_spmm_t out_buf) — never read. scratch is
    # the (K*Tr/128, mb, 128) X staging buffer. The grid is (row tiles,
    # m-blocks) with the m axis INNER, so the coefficient/lane blocks
    # (indexed by t only) stay resident across the m sweep.
    x_refs = rest[:K]
    out_ref, scr = rest[-2], rest[-1]
    t = pl.program_id(0)
    nbt = Tr // 128
    # stage the K Tr-slabs as 128-lane blocks: dynamic_gather sources are
    # single vregs, and the per-segment block select is a dynamic load on
    # the scratch's leading dim (probed OK on v5e)
    for kk in range(K):
        for b in range(nbt):
            scr[kk * nbt + b] = x_refs[kk][:, 128 * b : 128 * (b + 1)]
    Pblk = (starts_ref[t] // Tr) * nbt  # slab base, in 128-blocks
    ng = Tr // 128

    # bf16 SOURCES are not lowerable here (probed on v5e, experiments/
    # bf16_gather_probe.py): tpu.dynamic_gather requires index and source
    # bitwidths to match, and jnp.take_along_axis force-upcasts indices to
    # i32 — so a vector<...xbf16> source always pairs with i32 indices and
    # Mosaic rejects it ("Gather indices and result have different
    # bitwidths"). The windowed kernel therefore streams f32 (the 2x-rate
    # bf16 mode the DIA kernel has is unavailable to gather formulations).

    def subgroup(g):
        q0 = t * ng + g - Pblk  # this subgroup's own 128-block, slab-rel
        acc = jnp.zeros((mb, 128), acc_dt)
        lanes_g = lanes_ref[:, pl.ds(128 * g, 128)].astype(jnp.int32)
        data_g = data_ref[:, pl.ds(128 * g, 128)]
        for s in range(smax):
            q = jnp.clip(q0 + offs[s], 0, K * nbt - 1)
            xs = scr[q]  # (mb, 128) — dynamic leading-dim load
            idx = jnp.broadcast_to(lanes_g[s : s + 1], (mb, 128))
            g_s = jnp.take_along_axis(xs, idx, axis=1)
            acc = acc + data_g[s : s + 1].astype(acc_dt) * g_s.astype(acc_dt)
        out_ref[:, pl.ds(128 * g, 128)] = acc.astype(out_ref.dtype)

    if _ROLL_G:
        jax.lax.fori_loop(
            0, ng, lambda g, _: (subgroup(g), None)[1], None
        )
    else:
        for g in range(ng):
            subgroup(g)


def _blk_kernel(
    boffs, smax_b, b, Tr, K, mb, acc_dt,
    starts_ref, bdata_ref, blanes_ref, *rest,
):
    # Block-aware body (BlockedWindowedBSR): same staging/grid scheme as
    # _seg_kernel, but each segment is a BLOCK column rank — ONE
    # dynamic_gather fetches the b shared scalar columns at their natural
    # lanes (colbase + i%b). Redistribution is DEFERRED: the hot loop FMAs
    # the raw gather into b shift-group accumulators with dense coefficient
    # streams, and the rolls that rotate groups g >= 1 into row alignment
    # run once per 128-lane subgroup (rolls ride the same crossbar as
    # gathers — a per-segment roll scheme measured SLOWER than scalar
    # expansion: 732us vs 583us, experiments/blocked_ab.py).
    x_refs = rest[:K]
    out_ref, scr = rest[-2], rest[-1]
    t = pl.program_id(0)
    nbt = Tr // 128
    for kk in range(K):
        for bb in range(nbt):
            scr[kk * nbt + bb] = x_refs[kk][:, 128 * bb : 128 * (bb + 1)]
    Pblk = (starts_ref[t] // Tr) * nbt
    ng = Tr // 128
    # lane % b pattern for the per-group alignment selects (static)
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (mb, 128), 1) % b

    def subgroup(gg):
        q0 = t * ng + gg - Pblk
        accs = [jnp.zeros((mb, 128), acc_dt) for _ in range(b)]
        lanes_g = blanes_ref[:, pl.ds(128 * gg, 128)].astype(jnp.int32)
        data_g = bdata_ref[:, pl.ds(128 * gg, 128)]
        for s in range(smax_b):
            q = jnp.clip(q0 + boffs[s], 0, K * nbt - 1)
            xs = scr[q]  # (mb, 128) — dynamic leading-dim load
            idx = jnp.broadcast_to(lanes_g[s : s + 1], (mb, 128))
            G = jnp.take_along_axis(xs, idx, axis=1).astype(acc_dt)
            for g in range(b):
                coef = data_g[s * b + g : s * b + g + 1]
                accs[g] = accs[g] + coef.astype(acc_dt) * G
        # align: the group-g contribution at source lane i is destined for
        # lane i + g (when r+g < b) or i + g - b (wraps inside the block);
        # both cases are cyclic rolls and b | 128 keeps the select masks
        # exact at the vreg boundary
        out = accs[0]
        for g in range(1, b):
            fwd = pltpu.roll(accs[g], g, 1)
            bwd = pltpu.roll(accs[g], (g - b) % 128, 1)
            out = out + jnp.where(lane_r >= g, fwd, bwd)
        out_ref[:, pl.ds(128 * gg, 128)] = out.astype(out_ref.dtype)

    for g in range(ng):
        subgroup(g)


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
    if not isinstance(A, WindowedELL):
        raise TypeError(f"windowed_spmm_t: unsupported operand {type(A)}")
    Tr, W = A.tile, A.window
    smax = A.data.shape[0]
    mpad, width = Xp.shape
    if width != A.width:
        raise ValueError(
            f"windowed_spmm_t: X width {width} != operator width {A.width}"
        )
    if mpad % 8 != 0:
        raise ValueError(f"windowed_spmm_t: m={mpad} not a multiple of 8")
    if not interpret and jnp.dtype(Xp.dtype).itemsize < 4:
        raise ValueError(
            "windowed_spmm_t: sub-32-bit multivectors cannot lower on TPU "
            "(tpu.dynamic_gather requires index/source bitwidths to match "
            "and take_along_axis indices are i32 — probed on v5e, "
            "experiments/bf16_gather_probe.py); stream f32"
        )
    nbT = width // Tr  # total Tr-slab count (width is a multiple of Tr)
    K = W // Tr + 1  # slabs covering [floor(starts/Tr)*Tr, starts + W)
    # accumulate at least f32: narrow (bf16) operands stream/gather narrow
    # but sum wide, like the DIA kernel
    acc_dt = jnp.float64 if Xp.dtype == jnp.float64 else jnp.float32
    blocked = isinstance(A, BlockedWindowedBSR)
    # m-tiling: serve wide multivectors in mb-row blocks on an INNER grid
    # axis — coefficients stream once per row tile (index map constant in
    # j), the X window stages per (t, j) at mb-block VMEM cost
    if blocked:
        smax = A.blanes.shape[0]
        bfac = A.block[0]
        mb = _pick_mb_blocked(mpad, W, smax, bfac, Tr)
    else:
        mb = _pick_mb(mpad, W, smax, Tr)
    nm = mpad // mb

    if blocked:
        kernel = functools.partial(
            _blk_kernel, A.boffs, smax, bfac, Tr, K, mb, acc_dt
        )
        coef_arrs = [A.bdata, A.blanes]
        coef_specs = [
            pl.BlockSpec((smax * bfac, Tr), lambda t, j, s: (0, t)),
            pl.BlockSpec((smax, Tr), lambda t, j, s: (0, t)),
        ]
    else:
        kernel = functools.partial(
            _seg_kernel, A.offs, smax, Tr, K, mb, acc_dt
        )
        coef_arrs = [A.data, A.lanes]
        coef_specs = [
            pl.BlockSpec((smax, Tr), lambda t, j, s: (0, t)),
            pl.BlockSpec((smax, Tr), lambda t, j, s: (0, t)),
        ]

    in_specs = coef_specs + [
        pl.BlockSpec(
            (mb, Tr),
            lambda t, j, s, _k=kk: (j, jnp.minimum(s[t] // Tr + _k, nbT - 1)),
        )
        for kk in range(K)
    ]
    operands = [A.starts] + coef_arrs + [Xp] * K
    io_alias = {}
    if out_buf is not None:
        if out_buf.shape != (mpad, width) or out_buf.dtype != Xp.dtype:
            raise ValueError(
                f"windowed_spmm_t: out_buf {out_buf.shape}/{out_buf.dtype} "
                f"!= output ({mpad}, {width})/{Xp.dtype}"
            )
        in_specs.append(
            pl.BlockSpec((min(mb, 8), 128), lambda t, j, s: (0, 0))
        )
        operands.append(out_buf)
        io_alias = {3 + K: 0}  # (starts, data, lanes, x_0..x_{K-1}, out_buf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(width // Tr, nm),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((mb, Tr), lambda t, j, s: (j, t)),
        scratch_shapes=[pltpu.VMEM((K * (Tr // 128), mb, 128), Xp.dtype)],
    )
    flops = 2 * A.nnz * mpad
    Yp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mpad, width), Xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                sum(c.size * c.dtype.itemsize for c in coef_arrs)
                + 3 * mpad * width * Xp.dtype.itemsize
            ),
            transcendentals=0,
        ),
        input_output_aliases=io_alias,
        interpret=interpret,
    )(*operands)
    if A.far_nnz:
        # COO tail: gather the source columns, scatter-add into the rows.
        # Pad entries carry zero values and valid indices, so they add 0.
        contrib = A.far_vals[None, :] * Xp[:, A.far_cols]
        Yp = Yp.at[:, A.far_rows].add(contrib)
    return Yp
