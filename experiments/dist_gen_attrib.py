"""Attribute the r4 sharded-generalized gap (VERDICT r4 ask #5): at
n=262,144 the DIA ``sharded_generalized_inverse`` measured 0.64 s vs
0.41 s single-chip (1.56x, TPU_DIST_r04 run B) — the only dist driver
slower than single-chip — with no per-phase evidence at that n.

This reproduces the r4 setup (N=512 Neumann 2D + GenEO B, nev=8,
tol=2e-3, shift=1e-3, spmm='padded') and captures:
  * steady solve + iteration counts: single[banded direct] vs sharded
    inner='schwarz' vs inner='cg';
  * the per-phase weak-scaling row at P=1, rows/device=2^18, phases=True
    (spmm / inner / ortho / rayleigh), for both inners;
  * the single-chip phase analogues via bench_loop: one banded_solve
    apply (the single-chip inner) and one padded_spmm apply.

    python experiments/dist_gen_attrib.py [N]

Greppable DIST_GEN_ATTRIB rows; hard exit.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dune_eigensolver_tpu.bench.timing import bench_loop
from dune_eigensolver_tpu.bench.scaling import weak_scaling_solver
from dune_eigensolver_tpu.dist import make_mesh, sharded_generalized_inverse
from dune_eigensolver_tpu.factorize.banded import (
    banded_solve,
    factorize_banded_device,
)
from dune_eigensolver_tpu.solvers import generalized_inverse
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.utils.compile_cache import enable_compile_cache


def timed3(fn):
    res = fn()
    _ = np.asarray(res.eigenvalues)
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        res = fn()
        _ = np.asarray(res.eigenvalues)
        best = min(best, time.perf_counter() - t0)
    return best, res


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    enable_compile_cache()
    dt = np.float32
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    An = problems.laplacian_neumann_2d(N, dtype=dt)
    Bn = problems.laplacian_b_2d(N, 3, dtype=dt)
    n = An.shape[0]
    mesh = make_mesh(1)
    print(f"n={n}", flush=True)

    t1, r1 = timed3(
        lambda: generalized_inverse(
            An, Bn, nev=8, tol=2e-3, maxiter=100, shift=1e-3
        )
    )
    ev1 = np.sort(np.asarray(r1.eigenvalues))
    print(
        f"DIST_GEN_ATTRIB single[banded] t={t1:.3f}s "
        f"iters={int(r1.iterations)}",
        flush=True,
    )
    for inner in ("schwarz", "cg"):
        ts, rs = timed3(
            lambda: sharded_generalized_inverse(
                An, Bn, nev=8, tol=2e-3, maxiter=100, shift=1e-3,
                mesh=mesh, spmm="padded", cg_rtol=1e-6, cg_maxiter=400,
                inner=inner,
            )
        )
        evs = np.sort(np.asarray(rs.eigenvalues))
        print(
            f"DIST_GEN_ATTRIB sharded[{inner}] t={ts:.3f}s "
            f"iters={int(rs.iterations)} ratio={ts / t1:.2f} "
            f"maxdiff={np.abs(evs - ev1).max():.2e}",
            flush=True,
        )

    # single-chip phase analogues
    A_sh = An.axpy(1e-3, Bn)
    F = factorize_banded_device(A_sh)
    X = jax.random.normal(jax.random.PRNGKey(0), (n, 8), dt)
    t_inv1 = bench_loop(
        lambda v, f: banded_solve(f, v), X, K=20, reps=3, op_args=(F,)
    )
    from dune_eigensolver_tpu.kernels.dia_spmm import PaddedLayout, padded_spmm

    L = PaddedLayout(n, 8, A_sh.offsets)
    Ap = L.pad_operator(A_sh)
    Xp = L.pad(jnp.asarray(X.T))
    t_spmm1 = bench_loop(
        lambda v, d: padded_spmm(
            type(Ap)(data=d, offsets=Ap.offsets, shape=Ap.shape,
                     tile=Ap.tile, guard=Ap.guard),
            v,
        ),
        Xp, K=30, reps=3, op_args=(Ap.data,),
    )
    print(
        f"DIST_GEN_ATTRIB single_phases inv_apply={t_inv1*1e6:.0f}us "
        f"spmm={t_spmm1*1e6:.0f}us",
        flush=True,
    )

    # per-phase sharded rows at P=1 (fixed 10 inner iterations)
    for inner in ("schwarz", "cg"):
        recs = weak_scaling_solver(
            rows_per_device=1 << 18, m=8, n_iter=3, device_counts=[1],
            dtype=dt, verbose=0, coupling="connected", inner=inner,
            inner_iters=10, spmm="padded", phases=True,
        )
        r = recs[0]
        print(
            f"DIST_GEN_ATTRIB phase_row[{inner}] P=1 n={r['rows']} "
            f"t_iter={r['t_iter']*1e6:.0f}us "
            f"spmm={r['t_spmm']*1e6:.0f}us inner10={r['t_inner']*1e6:.0f}us "
            f"ortho={r['t_ortho']*1e6:.0f}us "
            f"rayleigh={r['t_rayleigh']*1e6:.0f}us",
            flush=True,
        )
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
