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


def bench_loop(step, x0, K=50, reps=4):
    """Time per application of ``step`` by the two-K slope method.

    A detached call through the TPU tunnel costs ~30-40 ms fixed (dispatch +
    fetch round trip), so t_op = (T(K) - T(K/5)) / (K - K/5) — the marginal
    per-op cost with the fixed cost differenced out. Each T is best-of-reps
    of a K-chained fori_loop with one host fetch."""
    K1 = max(1, K // 5)

    def total(k):
        f = jax.jit(lambda x: lax.fori_loop(0, k, lambda i, s: step(s), x))
        for attempt in range(3):  # remote-compile RPC is occasionally flaky
            try:
                out = f(x0)
                break
            except Exception as e:
                if attempt == 2:
                    raise
                log(f"bench_loop: compile attempt {attempt} failed ({e!r}); retrying")
                time.sleep(5)
        _ = np.asarray(out.ravel()[0])  # force full drain through the tunnel
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(x0)
            _ = np.asarray(out.ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (total(K) - total(K1)) / (K - K1)


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

    # --- roofline: HBM copy bandwidth on this chip ---
    big = jnp.ones((256 * 1024 * 1024 // 4,), dtype)
    t_copy = bench_loop(lambda v: v + 1.0, big, K=30)
    copy_gbps = 2 * big.size * 4 / t_copy / 1e9
    log(f"copy roofline: {copy_gbps:.1f} GB/s ({t_copy*1e6:.0f}us/pass)")
    del big  # keeping 256 MB alive perturbs allocator placement for the
    # SpMM operands (measured ~2x slowdown of the Pallas kernel)

    # --- DIA SpMM on 2D Laplacian, production scale ---
    N, m = 2048, 8
    A = problems.laplacian_dirichlet_2d(N, dtype=dtype)
    # pre-scale so chained applications stay bounded (spectral radius < 1)
    A = DIAMatrix(data=A.data / 8.0, offsets=A.offsets, shape=A.shape)
    n = A.shape[0]
    Xt = jax.random.normal(jax.random.PRNGKey(0), (m, n), dtype=dtype)

    t_pl = bench_loop(lambda x: dia_spmm_t_pallas(A, x), Xt)
    t_xla = bench_loop(lambda x: dia_spmm_t_xla(A, x), Xt)
    t = min(t_pl, t_xla)
    which = "pallas" if t_pl <= t_xla else "xla"

    ndiag = len(A.offsets)
    bytes_min = (ndiag * n + 2 * n * m) * 4
    gbps = bytes_min / t / 1e9
    nnz = A.nnz
    gflops = 2.0 * m * nnz / t / 1e9
    log(
        f"spmm[{which}]: n={n} m={m} t={t*1e6:.0f}us {gbps:.1f} GB/s "
        f"{gflops:.1f} GFLOP/s {nnz/t/1e9:.2f} Gnnz/s "
        f"(pallas {t_pl*1e6:.0f}us, xla {t_xla*1e6:.0f}us)"
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
            from dune_eigensolver_tpu.solvers import generalized_inverse

            Ng = 256
            Ag = problems.laplacian_neumann_2d(Ng, dtype=dtype)
            Bg = problems.laplacian_b_2d(Ng, 3, dtype=dtype)
            # default inverse = device block-banded direct solve; first call
            # includes the one-time remote compile, second is steady-state
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
