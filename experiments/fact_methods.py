"""TPU experiment: device factorization cost, LU vs Cholesky scan, and
block-size C sensitivity. Also checks solve accuracy of each.

    python experiments_fact_methods.py [N]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dune_eigensolver_tpu.factorize.banded import (
    banded_solve,
    factorize_banded_device,
)
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.spmm import spmm


def sync_scalar(x):
    _ = np.asarray(jnp.ravel(x)[0])


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dtype = np.float32
    A = problems.laplacian_neumann_2d(N, dtype=dtype)
    B = problems.laplacian_b_2d(N, 3, dtype=dtype)
    A_sh = A.axpy(1e-3, B)
    n = A_sh.shape[0]
    X = jax.random.normal(jax.random.PRNGKey(0), (n, 8), dtype=dtype)

    for method in ("lu", "cholesky"):
        for C in (256, 512):
            F = factorize_banded_device(A_sh, C=C, method=method)
            sync_scalar(F.fwd.dinv[-1, :1, :1])
            t0 = time.perf_counter()
            F = factorize_banded_device(A_sh, C=C, method=method)
            sync_scalar(F.fwd.dinv[-1, :1, :1])
            t = time.perf_counter() - t0
            Y = banded_solve(F, X)
            R = X - spmm(A_sh, Y)
            relres = float(
                np.asarray(
                    jnp.linalg.norm(R.astype(jnp.float32))
                    / jnp.linalg.norm(X.astype(jnp.float32))
                )
            )
            print(
                f"{method:9s} C={C:4d}: fact {t*1e3:7.0f} ms   relres {relres:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
