"""Minimized repro for the far-group VMEM silent-NaN mode (VERDICT r2 Weak #4).

Observed in round 2 on TPU v5e: composed solver programs (LOBPCG while ->
CG while -> Chebyshev fori -> rolling-cache DIA SpMM) produced NaNs when a
FAR-GROUP-bearing kernel instance (wide-band 3D stencil, offsets beyond the
tile) was tiled at a modeled ~9 MB VMEM — while the SAME kernel instance ran
clean standalone, and narrow-band (no far group) instances ran clean at
~10 MB. The tile picker (kernels/dia_spmm._pick_tile) therefore halves the
budget whenever a far group exists; this script pins that constant to a
reproducible observation instead of folklore.

    python experiments/vmem_nan_repro.py [N] [budget_mb ...]

For each budget it builds the 3D 7-point operator (N^3 dof; far groups from
the +-N^2 diagonals), reports the picked tile + modeled VMEM use, and runs
four progressively composed programs, checking isfinite after each:

  L0  standalone: K chained padded_spmm in one fori_loop
  L1  Chebyshev-style polynomial (fori) around the kernel
  L2  Jacobi-CG (while_loop) whose operator is the kernel
  L3  LOBPCG (while) + Chebyshev preconditioner (the full round-2 failure)

Expected on v5e (2026-08, round-3 capture): every level CLEAN at the
shipped budget (far-group modeled use <= ~5 MB) and L2/L3 NaN at >= ~9 MB
with L0/L1 clean — the corruption needs both a far group and an enclosing
while_loop. If a future toolchain runs all levels clean at 10 MB, the
half-budget guard in _pick_tile can be retired.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dune_eigensolver_tpu.kernels import dia_spmm as K
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix


def modeled_use(T, m, offsets):
    mpad = -(-max(m, 8) // 8) * 8
    ndiag = max(len(offsets), 1)
    _, far = K._split_center_far(offsets, T)
    nfar = len(far)
    return (
        3 * mpad * T + 2 * nfar * mpad * T + 2 * (ndiag + (2 + nfar) * mpad) * T
    ) * 4


def pick_tile_for_budget(n, m, offsets, budget, halve_far=False):
    """_pick_tile with an explicit budget and optionally WITHOUT the
    far-group halving (to reach the ~9 MB failure zone)."""
    mpad = -(-max(m, 8) // 8) * 8
    for T in (32768, 16384, 8192, 4096, 2048, 1024, 512, 256, 128):
        _, far = K._split_center_far(offsets, T)
        cap = budget // 2 if (halve_far and far) else budget
        if modeled_use(T, m, offsets) <= cap:
            if T > 128 and -(-n // T) < 4:
                continue
            return T
    return 128


def finite(x):
    return bool(np.asarray(jnp.isfinite(jnp.ravel(x)[:1024]).all()))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    budgets = [float(b) for b in sys.argv[2:]] or [5.0, 9.0, 10.0]
    dtype = np.float32
    m = 8

    A = problems.laplacian_dirichlet_3d(N, dtype=dtype)
    # scale: chained applications must stay bounded so a NaN means
    # corruption, not divergence
    A = DIAMatrix(data=A.data / 8.0, offsets=A.offsets, shape=A.shape)
    n = A.shape[0]
    print(f"operator: 3D 7-point N={N} n={n:,} offsets={A.offsets}", flush=True)

    for budget_mb in budgets:
        budget = int(budget_mb * 2**20)
        T = pick_tile_for_budget(n, m, A.offsets, budget)
        use = modeled_use(T, m, A.offsets)
        _, far = K._split_center_far(A.offsets, T)
        print(
            f"\n== budget {budget_mb:.0f} MB -> tile {T} modeled "
            f"{use/2**20:.1f} MB far_groups={len(far)} ==",
            flush=True,
        )
        if not far:
            print("  (no far group at this tile; mode not reachable)", flush=True)

        L = K.PaddedLayout(n, m, A.offsets, tile=T)
        Ap = L.pad_operator(A)
        X0 = L.pad(
            jax.random.normal(jax.random.PRNGKey(0), (m, n), dtype) / np.sqrt(n)
        )
        inv_diag = 1.0 / Ap.padded_diagonal(fill=1.0)

        def l0(x, data):
            op = K.PaddedDIA(data=data, offsets=A.offsets, shape=A.shape,
                             tile=T, guard=L.G)
            return lax.fori_loop(0, 20, lambda i, s: K.padded_spmm(op, s), x)

        def l1(x, data):
            op = K.PaddedDIA(data=data, offsets=A.offsets, shape=A.shape,
                             tile=T, guard=L.G)

            def cheb(i, s):  # three-term-recurrence-shaped polynomial
                y = K.padded_spmm(op, s)
                return 1.9 * y - 0.9 * s

            return lax.fori_loop(0, 20, cheb, x)

        def l2(x, data):
            op = K.PaddedDIA(data=data, offsets=A.offsets, shape=A.shape,
                             tile=T, guard=L.G)
            from dune_eigensolver_tpu.factorize.cg import cg_solve_t

            y, k = cg_solve_t(
                lambda V: K.padded_spmm(op, V), x, inv_diag=inv_diag,
                rtol=1e-6, maxiter=100,
            )
            return y

        for name, prog in (("L0 chain", l0), ("L1 cheb-fori", l1),
                           ("L2 cg-while", l2)):
            t0 = time.perf_counter()
            out = jax.jit(prog)(X0, Ap.data)
            ok = finite(out)
            print(
                f"  {name}: {'CLEAN' if ok else 'NaN'} "
                f"({time.perf_counter()-t0:.1f}s)",
                flush=True,
            )

        # L3: full LOBPCG + Chebyshev preconditioner with the engine's tile
        # forced to this budget (monkeypatched _pick_tile — experiment only)
        orig = K._pick_tile
        K._pick_tile = lambda n_, m_, o_, budget_=budget: pick_tile_for_budget(
            n_, m_, o_, budget_
        )
        try:
            from dune_eigensolver_tpu.factorize import chebyshev_inverse_factory
            from dune_eigensolver_tpu.solvers import lobpcg_generalized

            B = DIAMatrix(data=jnp.ones((1, n), dtype), offsets=(0,),
                          shape=A.shape)
            t0 = time.perf_counter()
            res = lobpcg_generalized(
                A, B, nev=8, tol=1e-3, maxiter=15, shift=0.0,
                precond=chebyshev_inverse_factory(), min_iter=2,
            )
            ok = finite(res.eigenvalues) and finite(res.eigenvectors[:, :1])
            print(
                f"  L3 lobpcg+cheb: {'CLEAN' if ok else 'NaN'} "
                f"({time.perf_counter()-t0:.1f}s) "
                f"evals[:3]={np.asarray(res.eigenvalues)[:3]}",
                flush=True,
            )
        finally:
            K._pick_tile = orig


if __name__ == "__main__":
    main()
