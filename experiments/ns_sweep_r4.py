"""TPU sweep r4: push the 3.0 s north-star further.

r3 found V(1,1) bf16 + QR1 + ortho_block=24 + b_identity = 3.0 s with every
cycle shape converging in the same 12 iterations. Candidates this round:
even cheaper smoothing (V(1,0), V(0,1)), and a smaller guard block
(nguard=20 with ortho_block=20 — the ortho prefix sweep is the dominant
per-iteration cost at this scale).

    python experiments/ns_sweep_r4.py [N3]

Greppable NS_SWEEP rows: config, steady seconds, iters, max_err(20).
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dune_eigensolver_tpu.factorize import mg_inverse_factory
from dune_eigensolver_tpu.oracle.analytic import (
    eigenvalues_laplace_dirichlet_3d,
)
from dune_eigensolver_tpu.solvers import lobpcg_generalized
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix


def main():
    N3 = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    nev = 20
    dt = np.float32
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    A3 = problems.laplacian_dirichlet_3d(N3, dtype=dt)
    n3 = A3.shape[0]
    B3 = DIAMatrix(data=jnp.ones((1, n3), dt), offsets=(0,), shape=A3.shape)
    _ = np.asarray(jnp.ravel(A3.data)[0])
    exact = eigenvalues_laplace_dirichlet_3d(N3, count=nev)

    configs = [
        ("baseline_v11_g24", dict(nu1=1, nu2=1), 24, 24),
        ("v10_g24", dict(nu1=1, nu2=0), 24, 24),
        ("v01_g24", dict(nu1=0, nu2=1), 24, 24),
        ("v11_g20_ob20", dict(nu1=1, nu2=1), 20, 20),
    ]
    for name, mg_kw, nguard, ob in configs:
        try:
            prec = mg_inverse_factory(dtype=jnp.bfloat16, **mg_kw)
            run = lambda: lobpcg_generalized(  # noqa: E731
                A3, B3, nev=nguard, tol=2e-3, maxiter=300, shift=0.0,
                precond=prec, min_iter=3, ortho_iterations=1,
                ortho_block=ob, b_identity=True,
            )
            res = run()
            ev = np.sort(np.asarray(res.eigenvalues))[:nev]
            t0 = time.perf_counter()
            res = run()
            _ = np.asarray(res.eigenvalues)
            t = time.perf_counter() - t0
            err = float(np.abs(ev - exact).max())
            print(
                f"NS_SWEEP {name} seconds={t:.2f} iters={int(res.iterations)} "
                f"max_err={err:.3e} conv={bool(res.converged)}",
                flush=True,
            )
        except Exception as e:
            print(f"NS_SWEEP {name} FAILED {type(e).__name__}: {str(e)[:150]!r}",
                  flush=True)
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
