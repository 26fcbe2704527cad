"""Per-component timing of one north-star LOBPCG iteration (10M-dof 3D).

    python experiments/ns_phases.py [N]

Times (two-run steady state, one fetch per measurement) every piece the
_lobpcg_core body executes at north-star shapes: f32 SpMM at m=24 and
m=72, the identity-B apply, the V(2,2) bf16 V-cycle preconditioner,
CholeskyQR1 A'-orthonormalization of the (3m, n*) block, Rayleigh-Ritz,
and the Ritz rotations. One TPU process at a time.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dune_eigensolver_tpu.factorize import mg_inverse_factory
from dune_eigensolver_tpu.ops.ortho import b_orthonormalize_blocked_t
from dune_eigensolver_tpu.solvers.engine import make_engine
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix
from dune_eigensolver_tpu.sparse.spmm import spmm_t

_PREC = lax.Precision.HIGHEST


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jnp.ravel(leaf)[0])


def timed(label, fn, *args, reps=2):
    t0 = time.perf_counter()
    fetch(fn(*args))
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.1f} ms (first {first:.1f}s)", flush=True)
    return best


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    dtype = np.float32
    nev = 24
    m3 = 3 * nev
    A = problems.laplacian_dirichlet_3d(N, dtype=dtype)
    n = A.shape[0]
    B = DIAMatrix(data=jnp.ones((1, n), dtype), offsets=(0,), shape=A.shape)
    A_int, B_int, layout, _spec = make_engine(A, B, m3, None)
    fetch(A_int.data)
    print(f"n={n:,} width={A_int.data.shape}", flush=True)
    nstar = layout.width if layout is not None else n

    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (nev, nstar), dtype)
    S = jax.random.normal(key, (m3, nstar), dtype)

    prec = mg_inverse_factory(dtype=jnp.bfloat16)
    prec_aux, prec_fn = prec(A_int)

    japply = jax.jit(lambda a, x: spmm_t(a, x))
    timed("apply_a m=24", japply, A_int, X)
    timed("apply_a m=72", japply, A_int, S)
    timed("apply_b m=72 (identity DIA)", japply, B_int, S)
    jprec = jax.jit(prec_fn)
    timed("V(2,2)b cycle m=24", jprec, prec_aux, X)

    jortho = jax.jit(
        lambda a, s: b_orthonormalize_blocked_t(
            lambda V: spmm_t(a, V), s, block=8, iterations=1, eps=1e-9
        )[0]
    )
    timed("CholeskyQR1 (72, n*)", jortho, A_int, S)

    def ritz(b_int, s):
        BS = spmm_t(b_int, s)
        G = jnp.dot(BS, s.T, precision=_PREC)
        G = 0.5 * (G + G.T)
        nu, V = jnp.linalg.eigh(G)
        return nu, V

    timed("ritz (BS + gram + eigh)", jax.jit(ritz), B_int, S)

    def rots(s, v):
        Xn = jnp.dot(v.T[:nev], s, precision=_PREC)
        Vp = v.at[:nev, :].set(0.0)
        Pn = jnp.dot(Vp.T[:nev], s, precision=_PREC)
        return Xn, Pn

    V = jnp.eye(m3, dtype=dtype)
    timed("ritz rotations (2x (24,72)@(72,n*))", jax.jit(rots), S, V)

    def resid(a_int, b_int, x):
        AX = spmm_t(a_int, x)
        BX = spmm_t(b_int, x)
        nu = jnp.sum(x * BX, axis=1)
        return BX - AX * nu[:, None]

    timed("residual (AX+BX+axpy) m=24", jax.jit(resid), A_int, B_int, X)


if __name__ == "__main__":
    main()
