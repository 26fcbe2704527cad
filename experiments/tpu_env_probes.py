"""Batched TPU experiments (repo-root scratch tool, resilient to tunnel
stalls: each phase prints incrementally; rerun to continue).

Measures with the two-K slope method (detached calls cost ~30-40 ms fixed).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def total_time(f, x, reps=3):
    out = f(x)
    _ = np.asarray(out.ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(x)
        _ = np.asarray(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def slope(step, x, K1, K2):
    def chain(k):
        return jax.jit(lambda v: lax.fori_loop(0, k, lambda i, s: step(s), v))

    t1 = total_time(chain(K1), x)
    t2 = total_time(chain(K2), x)
    return (t2 - t1) / (K2 - K1), t1


def main():
    print("== phase 1: copy bandwidth (slope) ==", flush=True)
    x = jnp.ones((8, 1 << 23), jnp.float32)  # 256MB
    t, t1 = slope(lambda v: v * 1.0001, x, 10, 50)
    print(f"copy: {t*1e6:.0f} us/op -> {2*x.size*4/t/1e9:.0f} GB/s "
          f"(fixed ~{(t1-10*t)*1e3:.0f} ms)", flush=True)

    print("== phase 2: while vs fori marginal ==", flush=True)
    def wl_factory(K):
        def wl(v):
            def cond(st):
                return st[1] < K
            def body(st):
                return (st[0] * 1.0001, st[1] + 1)
            return lax.while_loop(cond, body, (v, 0))[0]
        return jax.jit(wl)
    tw1 = total_time(wl_factory(10), x)
    tw2 = total_time(wl_factory(50), x)
    print(f"while marginal: {(tw2-tw1)/40*1e6:.0f} us/op "
          f"(fori marginal {t*1e6:.0f})", flush=True)

    print("== phase 3: SpMM slope + tile sweep ==", flush=True)
    from dune_eigensolver_tpu.sparse import problems
    from dune_eigensolver_tpu.sparse.formats import DIAMatrix
    from dune_eigensolver_tpu.kernels.dia_spmm import dia_spmm_t_pallas, dia_spmm_t_xla

    A = problems.laplacian_dirichlet_2d(2048, dtype=np.float32)
    A = DIAMatrix(data=A.data / 8.0, offsets=A.offsets, shape=A.shape)
    n = A.shape[0]
    Xt = jax.random.normal(jax.random.PRNGKey(0), (8, n), dtype=np.float32)
    bytes_min = (5 * n + 2 * n * 8) * 4
    for label, step in [
        ("xla_t", lambda v: dia_spmm_t_xla(A, v)),
        ("pallas T=8192", lambda v: dia_spmm_t_pallas(A, v, tile=8192)),
        ("pallas T=16384", lambda v: dia_spmm_t_pallas(A, v, tile=16384)),
        ("pallas T=32768", lambda v: dia_spmm_t_pallas(A, v, tile=32768)),
        ("pallas T=65536", lambda v: dia_spmm_t_pallas(A, v, tile=65536)),
    ]:
        t, _ = slope(step, Xt, 10, 50)
        print(f"{label}: {t*1e6:.0f} us {bytes_min/t/1e9:.0f} GB/s", flush=True)

    print("== phase 4: banded solve slope ==", flush=True)
    from dune_eigensolver_tpu.factorize import factorize_banded_device
    from dune_eigensolver_tpu.factorize.banded import banded_solve

    Ag = problems.laplacian_neumann_2d(256, dtype=np.float32).with_shifted_diagonal(
        1e-3
    )
    B8 = jnp.ones((Ag.shape[0], 8), np.float32)
    for C in (256, 512, 1024):
        F = factorize_banded_device(Ag, C=C)

        def chain(k):
            return jax.jit(
                lambda Fa, v: lax.fori_loop(
                    0, k, lambda i, s: banded_solve(Fa, s) * 0.1, v
                )
            )

        t1 = total_time(lambda v: chain(4)(F, v), B8)
        t2 = total_time(lambda v: chain(16)(F, v), B8)
        t = (t2 - t1) / 12
        print(f"banded C={C}: {t*1e3:.2f} ms/solve "
              f"({4*F.fwd.nb*C*C*4/t/1e9:.0f} GB/s factor traffic)", flush=True)

    print("== phase 5: solver steady with rr ==", flush=True)
    from dune_eigensolver_tpu.solvers import generalized_inverse

    Bg = problems.laplacian_b_2d(256, 3, dtype=np.float32)
    for rr in (False, True):
        for rep in range(2):
            t0 = time.perf_counter()
            res = generalized_inverse(
                Ag if False else problems.laplacian_neumann_2d(256, dtype=np.float32),
                Bg,
                nev=8,
                tol=2e-3,
                maxiter=200,
                shift=1e-3,
                rayleigh_ritz=rr,
            )
            it = int(res.iterations)
            t = time.perf_counter() - t0
            print(f"solver rr={rr} rep={rep}: {t:.2f}s iters={it}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
