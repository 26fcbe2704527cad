"""TPU probe 2: attribute the sharded SOLVER's per-iteration cost.

dist_probe.py cleared the SpMM: under shard_map the padded kernel chain
runs at the same tens-of-us as plain. Yet dist_tpu.py measured the sharded
standard_largest at ~8 ms/iter vs 0.28 ms single-chip. This probe times the
full solvers at two FORCED iteration counts (tol=0) and differences them
(per-iter marginal cost without compile/dispatch), then times hand-built
iteration phases under shard_map (spmm / ortho+psum / dots+psum) the same
way.

    python experiments/dist_probe2.py [N]

Greppable DIST_PROBE2 lines.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from dune_eigensolver_tpu.dist import make_mesh, sharded_standard_largest
from dune_eigensolver_tpu.dist.mesh import ROW_AXIS
from dune_eigensolver_tpu.dist.sharded import (
    _ShardEngine,
    _shard_dia,
    psum_reduce,
)
from dune_eigensolver_tpu.solvers import standard_largest
from dune_eigensolver_tpu.sparse import problems

K, K1 = 60, 12


def timed_iters(run, k):
    res = run(k)  # compile
    ev = np.asarray(res.eigenvalues)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = run(k)
        ev = np.asarray(res.eigenvalues)
        best = min(best, time.perf_counter() - t0)
    return best


def solver_slope(run):
    tK = timed_iters(run, K)
    tK1 = timed_iters(run, K1)
    return (tK - tK1) / (K - K1)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dt = np.float32
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    A = problems.laplacian_dirichlet_2d(N, dtype=dt)
    n, m = A.shape[0], 8
    mesh = make_mesh(1)
    axis = ROW_AXIS

    t = solver_slope(
        lambda k: standard_largest(A, nev=8, tol=0.0, maxiter=k)
    )
    print(f"DIST_PROBE2 single_largest {t*1e6:.0f}us/iter", flush=True)

    for mode in ("padded", "xla"):
        t = solver_slope(
            lambda k: sharded_standard_largest(
                A, nev=8, tol=0.0, maxiter=k, mesh=mesh, spmm=mode
            )
        )
        print(f"DIST_PROBE2 sharded_largest[{mode}] {t*1e6:.0f}us/iter",
              flush=True)

    # --- hand-built phases under shard_map (padded engine) ---
    from dune_eigensolver_tpu.ops.ortho import (
        dot_products_diagonal_t,
        orthonormalize_blocked_t,
    )

    A_sh = _shard_dia(A, mesh, axis)
    Xt = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (m, n), dt) / np.sqrt(n),
        NamedSharding(mesh, P(None, axis)),
    )
    reduce_ = psum_reduce(axis)

    def phase_chain(phase, red):
        def build(k):
            def local(adata, x):
                eng = _ShardEngine([adata], [A.offsets], m, axis, "padded")
                apply_a = eng.apply(0)
                bodies = dict(
                    spmm=lambda _, Q: apply_a(Q),
                    ortho=lambda _, Q: orthonormalize_blocked_t(
                        Q, block=8, gram_reduce=red, iterations=1
                    ),
                    dots=lambda _, Q: Q
                    + red(dot_products_diagonal_t(Q, Q))[:, None] * 0.0,
                    full=lambda _, Q: orthonormalize_blocked_t(
                        apply_a(Q), block=8, gram_reduce=red, iterations=1
                    ),
                )
                return lax.fori_loop(0, k, bodies[phase], eng.pad_q0(x))

            return jax.jit(
                jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P(None, axis), P(None, axis)),
                    out_specs=P(None, axis), check_vma=False,
                )
            )

        fK, fK1 = build(K), build(K1)
        outs = []
        for f in (fK, fK1):
            out = f(A_sh.data, Xt)
            _ = np.asarray(jnp.ravel(out)[0])
        bK = bK1 = float("inf")
        for _ in range(3):
            for f, k in ((fK, K), (fK1, K1)):
                t0 = time.perf_counter()
                out = f(A_sh.data, Xt)
                _ = np.asarray(jnp.ravel(out)[0])
                tt = time.perf_counter() - t0
                if k == K:
                    bK = min(bK, tt)
                else:
                    bK1 = min(bK1, tt)
        return (bK - bK1) / (K - K1)

    ident = lambda g: g
    for phase in ("spmm", "ortho", "dots", "full"):
        t_p = phase_chain(phase, reduce_)
        t_i = phase_chain(phase, ident)
        print(
            f"DIST_PROBE2 phase_{phase} psum={t_p*1e6:.0f}us "
            f"nopsum={t_i*1e6:.0f}us",
            flush=True,
        )

    # single-chip ortho for reference (same blocked CholeskyQR, no psum,
    # default padded engine layout)
    from dune_eigensolver_tpu.kernels.dia_spmm import PaddedLayout

    L = PaddedLayout(n, m, A.offsets)
    Xp = L.pad(np.asarray(Xt))

    def build1(k):
        def chain(x):
            return lax.fori_loop(
                0, k,
                lambda i, v: orthonormalize_blocked_t(v, block=8, iterations=1),
                x,
            )

        return jax.jit(chain)

    fK, fK1 = build1(K), build1(K1)
    for f in (fK, fK1):
        _ = np.asarray(jnp.ravel(f(Xp))[0])
    bK = bK1 = float("inf")
    for _ in range(3):
        for f, k in ((fK, K), (fK1, K1)):
            t0 = time.perf_counter()
            _ = np.asarray(jnp.ravel(f(Xp))[0])
            tt = time.perf_counter() - t0
            if k == K:
                bK = min(bK, tt)
            else:
                bK1 = min(bK1, tt)
    print(f"DIST_PROBE2 single_ortho {(bK-bK1)/(K-K1)*1e6:.0f}us", flush=True)

    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
