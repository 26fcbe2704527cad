"""TPU experiment: the DISTRIBUTED layer on real hardware (VERDICT r3 #1).

Everything in dist/ (the per-shard guarded Pallas hot loop
``padded_spmm_halo``, ``_ShardEngine``, the sharded solver drivers, the
distributed MG V-cycle) had only ever executed in interpret mode on the CPU
mesh — and Mosaic has twice broken interpret-clean kernels in this project
(CLAUDE.md; PROBE_GATHER_r03). A ``shard_map`` over the single available
chip exercises the ENTIRE code path (the ndev==1 branches skip only the
ppermutes): Mosaic lowering of the per-shard kernel, the guarded per-shard
layout, the psum hooks (degenerate), the MG all_gather (1-shard), and the
solver cores inside shard_map.

Captures (greppable DIST_TPU lines):
  * per-iteration padded_spmm_halo inside shard_map vs plain padded_spmm
    single-chip on the same operand (bar: within ~1.2x)
  * sharded_standard_largest / sharded_generalized_inverse /
    sharded_lobpcg_generalized(precond='mg'), each with spmm='padded',
    vs the single-chip drivers: eigenvalue equality + solve times
  * weak_scaling_solver P=1 row (mode=padded) with the phase breakdown

    python experiments/dist_tpu.py [N2d]

Hard exit at the end (tunnel teardown can hang).
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from dune_eigensolver_tpu.bench.timing import bench_loop
from dune_eigensolver_tpu.dist import (
    make_mesh,
    sharded_generalized_inverse,
    sharded_lobpcg_generalized,
    sharded_standard_largest,
)
from dune_eigensolver_tpu.dist.mesh import ROW_AXIS
from dune_eigensolver_tpu.dist.sharded import _ShardEngine, _shard_dia, psum_reduce
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dt = np.float32
    dev = jax.devices()[0]
    print(f"device={dev.device_kind} platform={dev.platform}", flush=True)
    assert dev.platform == "tpu", "this capture must run on the real chip"

    mesh = make_mesh(1)
    axis = ROW_AXIS

    # --- 1. bare hot-loop SpMM: padded_spmm_halo in shard_map vs plain ---
    A = problems.laplacian_dirichlet_2d(N, dtype=dt)
    A = DIAMatrix(data=A.data / 8.0, offsets=A.offsets, shape=A.shape)
    n, m = A.shape[0], 8
    A_sh = _shard_dia(A, mesh, axis)
    Xt = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (m, n), dt),
        NamedSharding(mesh, P(None, axis)),
    )

    from dune_eigensolver_tpu.bench.scaling import _two_k_slope

    K = 50

    def make_chain(k):
        def sharded_chain(adata, x):
            eng = _ShardEngine([adata], [A.offsets], m, axis, "padded")
            apply_a = eng.apply(0)
            return lax.fori_loop(0, k, lambda i, v: apply_a(v), eng.pad_q0(x))

        return jax.jit(
            jax.shard_map(
                sharded_chain,
                mesh=mesh,
                in_specs=(P(None, axis), P(None, axis)),
                out_specs=P(None, axis),
                check_vma=False,
            )
        )

    t0 = time.perf_counter()
    t_halo = _two_k_slope(make_chain, (A_sh.data, Xt), K)
    t_compile = time.perf_counter() - t0  # incl. both chain compiles

    # single-chip reference: the plain persistent-layout kernel
    from dune_eigensolver_tpu.kernels.dia_spmm import (
        PaddedDIA,
        PaddedLayout,
        padded_spmm,
    )

    L = PaddedLayout(n, m, A.offsets)
    Ap = L.pad_operator(A)
    Xp = L.pad(jax.random.normal(jax.random.PRNGKey(0), (m, n), dt))

    def step(x, pdata):
        op = PaddedDIA(data=pdata, offsets=A.offsets, shape=A.shape,
                       tile=L.T, guard=L.G)
        return padded_spmm(op, x, donate=True)

    t_plain = bench_loop(step, Xp, K=K, reps=3, op_args=(Ap.data,))
    print(
        f"DIST_TPU spmm_halo_vs_plain n={n} m={m} halo={t_halo*1e6:.0f}us "
        f"plain={t_plain*1e6:.0f}us ratio={t_halo/t_plain:.2f} "
        f"(compile+first={t_compile:.1f}s)",
        flush=True,
    )

    # --- 2. sharded drivers (padded) vs single-chip, eigenvalue equality ---
    from dune_eigensolver_tpu.solvers import (
        generalized_inverse,
        lobpcg_generalized,
        standard_largest,
    )

    Ad = problems.laplacian_dirichlet_2d(N, dtype=dt)

    def timed(fn_):
        """(res, evals, t_first, t_solve): t_solve = best-of-3 (tunnel
        fetches hang intermittently and only ever ADD time)."""
        t0 = time.perf_counter()
        res = fn_()
        ev = np.asarray(res.eigenvalues)
        t_first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res = fn_()
            ev = np.asarray(res.eigenvalues)
            best = min(best, time.perf_counter() - t0)
        return res, ev, t_first, best

    def iter_slope(fn_of_maxiter, K=60, K1=12):
        """Marginal per-iteration seconds: forced iteration counts (tol=0),
        differenced so compile/dispatch/fetch fixed costs cancel."""
        for k in (K, K1):  # compile both
            _ = np.asarray(fn_of_maxiter(k).eigenvalues)
        bK = bK1 = float("inf")
        for _ in range(3):
            for k in (K, K1):
                t0 = time.perf_counter()
                _ = np.asarray(fn_of_maxiter(k).eigenvalues)
                t = time.perf_counter() - t0
                if k == K:
                    bK = min(bK, t)
                else:
                    bK1 = min(bK1, t)
        return max((bK - bK1) / (K - K1), 1e-9)

    res_s, ev_s, tf, ts = timed(
        lambda: sharded_standard_largest(
            Ad, nev=8, tol=1e-6, maxiter=600, mesh=mesh, spmm="padded"
        )
    )
    res_1, ev_1, _, t1 = timed(
        lambda: standard_largest(Ad, nev=8, tol=1e-6, maxiter=600)
    )
    print(
        f"DIST_TPU largest n={n} iters={int(res_s.iterations)} "
        f"sharded={ts:.2f}s single={t1:.2f}s "
        f"maxdiff={np.abs(ev_s - ev_1).max():.2e} "
        f"(compile+first={tf:.1f}s)",
        flush=True,
    )
    # marginal per-iteration cost, fixed-cost-free (forced iterations)
    ti_s = iter_slope(
        lambda k: sharded_standard_largest(
            Ad, nev=8, tol=0.0, maxiter=k, mesh=mesh, spmm="padded"
        )
    )
    ti_1 = iter_slope(
        lambda k: standard_largest(Ad, nev=8, tol=0.0, maxiter=k)
    )
    print(
        f"DIST_TPU largest_per_iter sharded={ti_s*1e6:.0f}us "
        f"single={ti_1*1e6:.0f}us ratio={ti_s/ti_1:.2f}",
        flush=True,
    )
    # persist for bench.py's primary JSON (NORTH_STAR.json pattern)
    import json
    import os as _os

    with open(
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "DIST.json"), "w"
    ) as fh:
        json.dump(
            {
                "largest_per_iter_ratio": round(ti_s / ti_1, 2),
                "largest_maxdiff": float(np.abs(ev_s - ev_1).max()),
                "n": n,
                "stamp": time.strftime("%Y-%m-%d %H:%M:%S"),
            },
            fh,
        )
        fh.write("\n")

    An = problems.laplacian_neumann_2d(N, dtype=dt)
    Bn = problems.laplacian_b_2d(N, 3, dtype=dt)
    res_s, ev_s, tf, ts = timed(
        lambda: sharded_generalized_inverse(
            An, Bn, nev=8, tol=2e-3, maxiter=100, shift=1e-3, mesh=mesh,
            spmm="padded", cg_rtol=1e-6, cg_maxiter=400,
        )
    )
    res_1, ev_1, _, t1 = timed(
        lambda: generalized_inverse(
            An, Bn, nev=8, tol=2e-3, maxiter=100, shift=1e-3
        )
    )
    print(
        f"DIST_TPU generalized n={n} iters={int(res_s.iterations)} "
        f"sharded={ts:.2f}s single[banded]={t1:.2f}s "
        f"maxdiff={np.abs(ev_s - ev_1).max():.2e} "
        f"(compile+first={tf:.1f}s)",
        flush=True,
    )

    # --- 3. sharded LOBPCG with the distributed MG V-cycle ---
    from dune_eigensolver_tpu.factorize import mg_inverse_factory

    Bi = problems.identity_on_pattern(Ad, dtype=dt)
    res_s, ev_s, tf, ts = timed(
        lambda: sharded_lobpcg_generalized(
            Ad, Bi, nev=8, tol=2e-3, maxiter=100, mesh=mesh, spmm="padded",
            precond="mg", prec_dtype=jnp.bfloat16,
        )
    )
    res_1, ev_1, _, t1 = timed(
        lambda: lobpcg_generalized(
            Ad, Bi, nev=8, tol=2e-3, maxiter=100,
            precond=mg_inverse_factory(nu1=1, nu2=1, dtype=jnp.bfloat16),
        )
    )
    print(
        f"DIST_TPU lobpcg_mg n={n} iters={int(res_s.iterations)} "
        f"sharded={ts:.2f}s single={t1:.2f}s "
        f"maxdiff={np.abs(ev_s - ev_1).max():.2e} "
        f"(compile+first={tf:.1f}s)",
        flush=True,
    )

    # --- 4. weak_scaling_solver P=1 row, padded, with phase breakdown ---
    from dune_eigensolver_tpu.bench.scaling import weak_scaling_solver

    recs = weak_scaling_solver(
        rows_per_device=1 << 16, m=8, n_iter=10, device_counts=[1],
        dtype=dt, coupling="connected", inner="cg", inner_iters=10,
        spmm="padded", phases=True,
    )
    r = recs[0]
    print(
        f"DIST_TPU scaling_solver P=1 mode={r['mode']} rows={r['rows']} "
        f"t_iter={r['t_iter']*1e6:.0f}us "
        f"spmm={r['t_spmm']*1e6:.0f}us inner={r['t_inner']*1e6:.0f}us "
        f"ortho={r['t_ortho']*1e6:.0f}us rayleigh={r['t_rayleigh']*1e6:.0f}us",
        flush=True,
    )
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
