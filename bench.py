"""Benchmark harness — prints ONE JSON line on stdout.

Primary metric: tall-skinny DIA SpMM effective bandwidth (GB/s) on the
reference's flagship operator class (2D 5-point Laplacian) at production
scale, against a measured HBM copy roofline on the same chip
(``vs_baseline`` = fraction of roofline achieved — BASELINE.md targets
>= 0.70). The metric definition follows the reference's SpMM benchmark
(flops = 2*m*nnz, src/dune-eigensolver.cc:353-373); effective bytes are the
speed-of-light traffic model: every diagonal read once, X read once, Y
written once. Auxiliary metrics (GFLOP/s, nnz/s, solver time-to-eigenpairs)
go to stderr.

Timing note: the TPU may sit behind an RPC tunnel where dispatch latency is
~ms, so each measurement chains K kernel applications inside one jit
(lax.fori_loop) and fetches one element to drain the pipeline.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_loop(step, x0, K=50, reps=4, op_args=()):
    """Time per application of ``step`` by the two-K slope method.

    A detached call through the TPU tunnel costs ~30-40 ms fixed (dispatch +
    fetch round trip), so t_op = (T(K) - T(K/5)) / (K - K/5) — the marginal
    per-op cost with the fixed cost differenced out. Each T is best-of-reps
    of a K-chained fori_loop with one host fetch; the K and K/5 runs are
    interleaved so load transients hit both and cancel in the difference.

    ``op_args``: static operands (e.g. matrix data) threaded through jit as
    REAL ARGUMENTS — closing over them would embed them as constants in the
    compile RPC (tens of MB per compile through the tunnel, and a cache miss
    for every new buffer)."""
    K1 = max(1, K // 5)

    def compile_chain(k):
        f = jax.jit(
            lambda x, *a: lax.fori_loop(0, k, lambda i, s: step(s, *a), x)
        )
        for attempt in range(3):  # remote-compile RPC is occasionally flaky
            try:
                out = f(x0, *op_args)
                break
            except Exception as e:
                if attempt == 2:
                    raise
                log(f"bench_loop: compile attempt {attempt} failed ({e!r}); retrying")
                time.sleep(5)
        _ = np.asarray(jnp.ravel(out)[0])  # drain through the tunnel
        return f

    fK, fK1 = compile_chain(K), compile_chain(K1)
    bestK = bestK1 = float("inf")
    for _ in range(reps):
        for f, k in ((fK, K), (fK1, K1)):
            t0 = time.perf_counter()
            out = f(x0, *op_args)
            _ = np.asarray(jnp.ravel(out)[0])
            t = time.perf_counter() - t0
            if k == K:
                bestK = min(bestK, t)
            else:
                bestK1 = min(bestK1, t)
    return max((bestK - bestK1) / (K - K1), 1e-9)


def main():
    from dune_eigensolver_tpu.kernels.dia_spmm import (
        dia_spmm_t_pallas,
        dia_spmm_t_xla,
    )
    from dune_eigensolver_tpu.sparse import problems
    from dune_eigensolver_tpu.sparse.formats import DIAMatrix

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} platform={dev.platform}")
    dtype = np.float32

    # --- DIA SpMM on 2D Laplacian, production scale ---
    N, m = 2048, 8
    A = problems.laplacian_dirichlet_2d(N, dtype=dtype)
    # pre-scale so chained applications stay bounded (spectral radius < 1)
    A = DIAMatrix(data=A.data / 8.0, offsets=A.offsets, shape=A.shape)
    n = A.shape[0]
    offsets, shape = A.offsets, A.shape
    Xt = jax.random.normal(jax.random.PRNGKey(0), (m, n), dtype=dtype)

    from dune_eigensolver_tpu.kernels.dia_spmm import (
        PaddedDIA,
        PaddedLayout,
        padded_spmm,
    )

    L = PaddedLayout(n, m, offsets)
    Xp = L.pad(Xt)
    Ap = L.pad_operator(A)  # padded ONCE — zero marshalling in the loop
    log(f"layout: T={L.T} G={L.G} width={L.width} nt={L.nt}")

    def mk(kernel):  # matrix data as a jit ARG, never a baked-in constant
        def step(x, data):
            return kernel(DIAMatrix(data=data, offsets=offsets, shape=shape), x)

        return step

    def step_padded(x, pdata):  # persistent-operator hot path (in-place chain)
        op = PaddedDIA(data=pdata, offsets=offsets, shape=shape, tile=L.T, guard=L.G)
        return padded_spmm(op, x, donate=True)

    copy_buf = jnp.ones((256 * 1024 * 1024 // 4,), dtype)

    # The tunneled chip's throughput drifts (shared infrastructure): measure
    # roofline and kernels in interleaved rounds and take per-phase minima,
    # so the ratio compares both under the same best-case conditions.
    t_copy = t_pad = t_pl = t_xla = float("inf")
    for rnd in range(3):
        t_copy = min(t_copy, bench_loop(lambda v: v + 1.0, copy_buf, K=30, reps=2))
        t_pad = min(
            t_pad,
            bench_loop(step_padded, Xp, op_args=(Ap.data,), reps=2),
        )
        t_pl = min(t_pl, bench_loop(mk(dia_spmm_t_pallas), Xt, op_args=(A.data,), reps=2))
        t_xla = min(t_xla, bench_loop(mk(dia_spmm_t_xla), Xt, op_args=(A.data,), reps=2))
        log(
            f"round {rnd}: copy {t_copy*1e6:.0f}us pallas {t_pl*1e6:.0f}us "
            f"padded {t_pad*1e6:.0f}us xla {t_xla*1e6:.0f}us"
        )
    copy_gbps = 2 * copy_buf.size * 4 / t_copy / 1e9
    log(f"copy roofline: {copy_gbps:.1f} GB/s ({t_copy*1e6:.0f}us/pass)")
    t = min(t_pl, t_xla, t_pad)
    which = {t_pl: "pallas", t_xla: "xla", t_pad: "pallas_padded"}[t]

    ndiag = len(A.offsets)
    bytes_min = (ndiag * n + 2 * n * m) * 4
    gbps = bytes_min / t / 1e9
    nnz = A.nnz
    gflops = 2.0 * m * nnz / t / 1e9
    log(
        f"spmm[{which}]: n={n} m={m} t={t*1e6:.0f}us {gbps:.1f} GB/s "
        f"{gflops:.1f} GFLOP/s {nnz/t/1e9:.2f} Gnnz/s "
        f"(pallas {t_pl*1e6:.0f}us, padded {t_pad*1e6:.0f}us, xla {t_xla*1e6:.0f}us)"
    )

    print(
        json.dumps(
            {
                "metric": "dia_spmm_bandwidth",
                "value": round(gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(gbps / copy_gbps, 4),
            }
        ),
        flush=True,
    )

    # --- auxiliary: flagship solver time-to-eigenpairs ---
    # The TPU tunnel's host-fetch path hangs intermittently (deep inside a
    # C++ RPC wait, so signals can't interrupt it). The primary JSON line is
    # already flushed; run the aux phase on a daemon thread with a bounded
    # join and hard-exit if it wedges.
    import os
    import threading

    def aux():
        try:
            from dune_eigensolver_tpu.factorize import cg_inverse_factory
            from dune_eigensolver_tpu.solvers import (
                generalized_inverse,
                lobpcg_generalized,
            )

            Ng = 256
            Ag = problems.laplacian_neumann_2d(Ng, dtype=dtype)
            Bg = problems.laplacian_b_2d(Ng, 3, dtype=dtype)
            # reference-parity path: factorize (device block-banded direct
            # solve) + shift-invert subspace iteration; first call includes
            # the one-time remote compile, second is steady-state
            t0 = time.perf_counter()
            res = generalized_inverse(Ag, Bg, nev=8, tol=2e-3, maxiter=200, shift=1e-3)
            ev = np.asarray(res.eigenvalues)
            t_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            res = generalized_inverse(Ag, Bg, nev=8, tol=2e-3, maxiter=200, shift=1e-3)
            jax.block_until_ready(res.eigenvalues)
            t_solve = time.perf_counter() - t0
            log(
                f"generalized_inverse[banded]: n={Ag.shape[0]} nev=8 "
                f"iters={int(res.iterations)} time={t_solve:.2f}s "
                f"(first incl compile {t_first:.1f}s) evals[:3]={ev[:3]}"
            )
            # TPU-first fast path: LOBPCG + loose-CG preconditioner, no
            # factorization at all
            prec = cg_inverse_factory(rtol=1e-2, maxiter=25)
            run = lambda: lobpcg_generalized(
                Ag, Bg, nev=8, tol=2e-3, maxiter=200, shift=1e-3, precond=prec
            )
            res = run()
            ev = np.asarray(res.eigenvalues)
            t0 = time.perf_counter()
            res = run()
            jax.block_until_ready(res.eigenvalues)
            t_lo = time.perf_counter() - t0
            log(
                f"lobpcg[cg25]: n={Ag.shape[0]} nev=8 iters={int(res.iterations)} "
                f"time={t_lo:.2f}s evals[:3]={ev[:3]}"
            )
        except Exception as e:  # aux must not break the primary line
            log(f"solver aux bench failed: {e!r}")

    th = threading.Thread(target=aux, daemon=True)
    th.start()
    th.join(timeout=420)
    if th.is_alive():
        log("solver aux bench timed out (tunnel hang); exiting with primary metric")
        os._exit(0)


if __name__ == "__main__":
    main()
