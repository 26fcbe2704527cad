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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# two-K slope timing through the tunnel: see bench/timing.py
from dune_eigensolver_tpu.bench.timing import bench_loop  # noqa: E402


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

    primary = {
        "metric": "dia_spmm_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / copy_gbps, 4),
    }
    # North-star field (BASELINE.md): time-to-20-eigenpairs of the 10M-dof
    # 3D Laplacian. The measurement itself runs in the aux phase BELOW the
    # primary print (it takes minutes and the tunnel fetch can hang), and
    # persists to NORTH_STAR.json; the primary line carries the most recent
    # persisted value so the driver artifact contains the field.
    import os

    ns_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "NORTH_STAR.json")
    try:
        with open(ns_path) as fh:
            ns = json.load(fh)
        primary["north_star_3d_seconds"] = ns["seconds"]
        primary["north_star_3d_max_err"] = ns["max_err"]
        primary["north_star_3d_measured"] = ns.get("stamp", "prior run")
    except Exception:
        pass
    # General-sparsity (windowed-gather) kernel capture, same persist-and-
    # embed pattern: the reference's native CSR/BCRS operand class
    # (kernels_cpp.hh:626-657) measured on the elasticity BSR operator.
    ga_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "GATHER.json")
    try:
        with open(ga_path) as fh:
            ga = json.load(fh)
        primary["gather_spmm_gflops"] = ga["gflops"]
        primary["gather_spmm_vs_xla"] = ga["vs_xla"]
        primary["gather_spmm_measured"] = ga.get("stamp", "prior run")
    except Exception:
        pass
    # Distributed-layer hardware parity (experiments/dist_tpu.py persists
    # DIST.json): sharded-vs-single per-iteration ratio on a 1-chip mesh.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "DIST.json")) as fh:
            di = json.load(fh)
        primary["dist_per_iter_ratio"] = di["largest_per_iter_ratio"]
        primary["dist_eval_maxdiff"] = di["largest_maxdiff"]
        primary["dist_measured"] = di.get("stamp", "prior run")
    except Exception:
        pass
    # General-sparsity distributed drivers (experiments/dist_win_r05.py
    # persists DIST_WIN.json): the WORST per-iteration ratio across all
    # three drivers — not the best case (VERDICT r4 Weak #3).
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "DIST_WIN.json")) as fh:
            dw = json.load(fh)
        primary["dist_gen_per_iter_ratio"] = dw["worst_per_iter_ratio"]
        primary["dist_gen_measured"] = dw.get("stamp", "prior run")
    except Exception:
        pass
    print(json.dumps(primary), flush=True)

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

        # --- general-sparsity windowed-gather kernel on the elasticity
        # BSR operator (the reference's native CSR/BCRS operand class,
        # kernels_cpp.hh:626-657); persisted to GATHER.json and embedded
        # in the NEXT run's primary line ---
        try:
            from dune_eigensolver_tpu.kernels.gather_spmm import (
                make_windowed_operands,
            )
            from dune_eigensolver_tpu.sparse.formats import bsr_from_scipy
            from dune_eigensolver_tpu.sparse.spmm import spmm_t

            Ae, _ = problems.elasticity_2d(512, dtype=dtype)
            Sa = Ae.to_scipy()
            Sa = Sa / float(np.abs(Sa).sum(axis=1).max())  # bounded chains
            Ae = bsr_from_scipy(Sa, block=Ae.block, dtype=dtype)
            M_int, _, Lw = make_windowed_operands(Ae, m=m)
            Xw = Lw.pad(
                jax.random.normal(jax.random.PRNGKey(1), (m, Ae.shape[0]), dtype)
            )
            # interleaved rounds: the chip's throughput drifts hard (the
            # same binary measured 343-642us minutes apart, TPU_BLOCKED_r05)
            # — take per-variant minima across rounds so the persisted
            # number reflects the kernel, not the phase it ran in
            t_win = t_gx = float("inf")
            for _rnd in range(3):
                t_win = min(t_win, bench_loop(
                    lambda V, op: spmm_t(op, V), Xw, K=20, reps=2,
                    op_args=(M_int,),
                ))
                t_gx = min(t_gx, bench_loop(
                    lambda V, op: spmm_t(op, V), Xw[:, : Ae.shape[0]], K=8,
                    reps=2, op_args=(Ae,),
                ))
            gflops_w = 2.0 * m * Ae.nnz / t_win / 1e9
            nnz_w = int(Ae.nnz)
            n_w = Ae.shape[0]
            # free the windowed operands before the 10M-dof north star —
            # the nested hierarchy needs the HBM headroom (OOM'd without)
            del M_int, Xw, Lw, Ae, Sa
            log(
                f"gather_spmm[bsr_win]: n={n_w} nnz={nnz_w} m={m} "
                f"{gflops_w:.1f} GFLOP/s ({t_win*1e6:.0f}us; xla gather "
                f"{t_gx*1e6:.0f}us -> {t_gx/t_win:.1f}x)"
            )
            with open(ga_path, "w") as fh:
                json.dump(
                    {
                        "gflops": round(gflops_w, 2),
                        "vs_xla": round(t_gx / t_win, 1),
                        "n": n_w,
                        "nnz": nnz_w,
                        "stamp": time.strftime("%Y-%m-%d %H:%M:%S"),
                    },
                    fh,
                )
                fh.write("\n")
        except Exception as e:
            log(f"gather aux bench failed: {e!r}")

        # --- north star: smallest-20 of the 10M-dof 3D Laplacian on one
        # chip (experiments/eigen3d_10m.py protocol: N=216, LOBPCG on the
        # reciprocal pencil). Recipe: NESTED ITERATION (solvers/nested.py,
        # r5 — experiments/ns_nested.py): solve the same problem on the
        # 54^3 and 108^3 grids first (coarse ops rediscretized on device,
        # coarse_tol=2e-4) and seed each level with the prolonged
        # eigenvector block, then the fine level only pays the iterations
        # that correct the interpolation error ([11, 4, 3] instead of 12
        # fine iterations). Per-level solver: one geometric-multigrid
        # V(1,1) cycle with bf16 fine smoothing as preconditioner, nev=24
        # guard block, single-pass CholeskyQR in 24-row blocks
        # (experiments/ns_phases.py), identity-B fast path. Waypoints:
        # round-2 default cheb16/nev20/QR2 43.2s -> f32 cg25 23.0s ->
        # bf16 cg40 + QR1 12.2s -> mg V(2,2)b 5.5s -> +b_identity 5.3s ->
        # +ortho_block=24 3.2s -> V(1,1) 3.0s -> nested 54/108/216 1.08s
        # (err20 9.2e-7 — the seeded iterations also land 10x closer to
        # the analytic spectrum than the 12-iteration random start).
        # Full-width QR (ortho_block='full') NaNs at this n (cond(S)^2
        # exceeds f32); nev=32 exhausts HBM; the seeded search basis needs
        # the ortho's spectral whitening fallback (ops/ortho.py). Error is
        # reported on the smallest 20 vs the analytic spectrum. ---
        try:
            from dune_eigensolver_tpu.factorize import mg_inverse_factory
            from dune_eigensolver_tpu.oracle.analytic import (
                eigenvalues_laplace_dirichlet_3d,
            )
            from dune_eigensolver_tpu.solvers import lobpcg_nested

            N3, nev3, nguard3 = 216, 20, 24
            A3 = problems.laplacian_dirichlet_3d(N3, dtype=dtype)
            n3 = A3.shape[0]
            B3 = DIAMatrix(
                data=jnp.ones((1, n3), dtype), offsets=(0,), shape=A3.shape
            )
            _ = np.asarray(jnp.ravel(A3.data)[0])  # finish the device build
            prec = mg_inverse_factory(nu1=1, nu2=1, dtype=jnp.bfloat16)
            run = lambda: lobpcg_nested(  # noqa: E731
                A3, B3, nev=nguard3, tol=2e-3, maxiter=300, shift=0.0,
                min_coarse=48, coarse_tol=2e-4, precond=prec,
                ortho_iterations=1, ortho_block=24, b_identity=True,
            )
            res = run()  # includes remote compile
            ev3 = np.asarray(res.eigenvalues)
            t0 = time.perf_counter()
            res = run()
            _ = np.asarray(res.eigenvalues)
            t_ns = time.perf_counter() - t0
            err3 = float(
                np.abs(
                    np.sort(ev3)[:nev3]
                    - eigenvalues_laplace_dirichlet_3d(N3, count=nev3)
                ).max()
            )
            log(
                f"NORTH_STAR_3D: n={n3} nev={nev3} seconds={t_ns:.2f} "
                f"max_err={err3:.3e} iters={int(res.iterations)} "
                f"conv={bool(res.converged)}"
            )
            with open(ns_path, "w") as fh:
                json.dump(
                    {
                        "seconds": round(t_ns, 2),
                        "max_err": err3,
                        "n": n3,
                        "nev": nev3,
                        "stamp": time.strftime("%Y-%m-%d %H:%M:%S"),
                    },
                    fh,
                )
                fh.write("\n")
        except Exception as e:
            log(f"north-star aux bench failed: {e!r}")

    # free the benchmark buffers before the aux solves: the nested
    # north-star hierarchy at 10M dof needs every GB of HBM headroom
    del copy_buf, Xp, Ap, Xt, A, L
    th = threading.Thread(target=aux, daemon=True)
    th.start()
    th.join(timeout=2100)
    if th.is_alive():
        log("solver aux bench timed out (tunnel hang); exiting with primary metric")
        os._exit(0)


if __name__ == "__main__":
    main()
