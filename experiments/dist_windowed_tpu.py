"""TPU capture: the GENERAL-sparsity distributed path (dist/windowed.py)
on real hardware — windowed vreg-gather kernel + halo exchange under
shard_map over the 1-chip mesh (the same Mosaic-exercise rationale as
TPU_DIST_r04.log, for the unified-plan kernel).

    python experiments/dist_windowed_tpu.py [Nel]

Greppable DIST_WIN rows.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from dune_eigensolver_tpu.dist import make_mesh, sharded_lobpcg_general
from dune_eigensolver_tpu.dist.mesh import ROW_AXIS
from dune_eigensolver_tpu.dist.windowed import (
    _plan_arrays,
    _plan_specs,
    _shard_container,
    windowed_shard_plan,
    windowed_spmm_halo_t,
)
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import bsr_from_scipy


def main():
    Nel = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dt = np.float32
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    Ae, _ = problems.elasticity_2d(Nel, dtype=dt)
    Sa = Ae.to_scipy()
    Sa = (Sa / float(np.abs(Sa).sum(axis=1).max())).astype(dt)
    n = Sa.shape[0]
    print(f"elasticity: n={n} nnz={Sa.nnz}", flush=True)

    mesh = make_mesh(1)
    axis = ROW_AXIS
    m = 8
    plan = windowed_shard_plan(Sa, 1)
    rng = np.random.default_rng(0)
    Xt = rng.normal(size=(m, n)).astype(dt)
    Xsh = jax.device_put(jnp.asarray(Xt), NamedSharding(mesh, P(None, axis)))

    # correctness + chained slope of the sharded kernel
    K, K1 = 30, 6

    def build(k):
        def local(x, *arrs):
            from dune_eigensolver_tpu.dist.windowed import _shard_bnd

            op = _shard_container(plan, arrs[:6])
            bnd = _shard_bnd(plan, arrs)
            return lax.fori_loop(
                0, k,
                lambda i, v: windowed_spmm_halo_t(
                    plan, op, v, axis=axis, bnd=bnd
                ),
                x,
            )

        return jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(None, axis),) + _plan_specs(axis),
                out_specs=P(None, axis),
                check_vma=False,
            )
        )

    f1 = build(1)
    Y = np.asarray(f1(Xsh, *_plan_arrays(plan)))
    Yref = (Sa @ Xt.T).T
    err = np.abs(Y - Yref).max() / np.abs(Yref).max()
    fK, fK1 = build(K), build(K1)
    for f in (fK, fK1):
        _ = np.asarray(jnp.ravel(f(Xsh, *_plan_arrays(plan)))[0])
    bK = bK1 = float("inf")
    for _ in range(3):
        for f, k in ((fK, K), (fK1, K1)):
            t0 = time.perf_counter()
            _ = np.asarray(jnp.ravel(f(Xsh, *_plan_arrays(plan)))[0])
            t = time.perf_counter() - t0
            if k == K:
                bK = min(bK, t)
            else:
                bK1 = min(bK1, t)
    t_iter = max((bK - bK1) / (K - K1), 1e-9)
    print(
        f"DIST_WIN spmm n={n} m={m} t={t_iter*1e6:.0f}us "
        f"{2.0*m*Sa.nnz/t_iter/1e9:.1f} GFLOP/s relerr={err:.2e} "
        f"smax_u={plan.data.shape[1]} W={plan.window}",
        flush=True,
    )

    # end-to-end sharded general LOBPCG vs the scipy oracle
    from dune_eigensolver_tpu.oracle.scipy_oracle import smallest_standard

    nsolve = 20000
    Su = problems.unstructured_laplacian(
        nsolve, extra_edges=nsolve // 20, seed=5, fmt="scipy"
    )
    from dune_eigensolver_tpu.sparse.reorder import rcm_pencil

    Au, _, _ = rcm_pencil(Su, dtype=dt)
    Sr = Au.to_scipy().astype(dt)
    ref, _ = smallest_standard(Su, nev=4, sigma=-1e-3, tol=1e-10)
    run = lambda: sharded_lobpcg_general(  # noqa: E731
        Sr, nev=4, tol=2e-3, maxiter=300, shift=1e-3, mesh=mesh,
        cg_rtol=1e-2, cg_maxiter=25,
    )
    t0 = time.perf_counter()
    res = run()
    ev = np.sort(np.asarray(res.eigenvalues))[:4]
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = run()
    _ = np.asarray(res.eigenvalues)
    t_solve = time.perf_counter() - t0
    err = np.abs(ev - ref).max() / np.abs(ref).max()
    print(
        f"DIST_WIN lobpcg_general n={nsolve} iters={int(res.iterations)} "
        f"compile+first={t_first:.1f}s solve={t_solve:.2f}s "
        f"relerr={err:.2e} conv={bool(res.converged)}",
        flush=True,
    )
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
