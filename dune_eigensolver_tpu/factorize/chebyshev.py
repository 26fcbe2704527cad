"""Chebyshev polynomial inverse application (preconditioner engine).

The reference applies exact inverses through UMFPACK factors
(umfpacktools.hh:16-220, kernels_cpp.hh:660-755). On TPU the matrix-free
alternatives are Jacobi-CG (factorize/cg.py) and this module: a fixed-degree
Chebyshev approximation of ``A^-1`` on a spectral interval. Per degree it
costs one SpMM plus three axpys — and, unlike CG, **zero inner dot
products**, so there are no full-array reduction passes and no
data-dependent control flow: the whole application is one statically
unrolled ``fori_loop`` that XLA fuses aggressively. That makes it the
preferred LOBPCG preconditioner on bandwidth-bound problems (the 10M-dof 3D
Laplacian run spends most of its HBM traffic inside the preconditioner).

Spectral bounds come from one device-side power iteration on the
Jacobi-scaled operator ``D^-1 A`` (run once at factory time, jitted, operand
as an argument). The smoothing interval is ``[lmax/cond_target, lmax]``:
Chebyshev error on the interval decays like ((sqrt(k)-1)/(sqrt(k)+1))^deg
with k = cond_target, so degree 16 at k=30 ~ 3e-3 — comparable to the
rtol=1e-2 loose-CG preconditioner at roughly half the memory traffic.

The operator ``p(D^-1 A) D^-1`` is SPD whenever p > 0 on the spectrum
(equals ``D^-1/2 p(D^-1/2 A D^-1/2) D^-1/2``), as LOBPCG requires.

Conventions match cg.py: factories return closure-free ``(aux, fn)`` pairs
with module-level memoized fns (solver jit caches key on fn identity — see
CLAUDE.md architecture invariants).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from dune_eigensolver_tpu.sparse.spmm import spmm


def _power_lmax(apply_a, inv_diag, n, dtype, iters, gram_reduce):
    """Largest eigenvalue of ``D^-1 A`` by power iteration (device-side).

    Random N(0,1) start (fixed key): the top mode of diffusion-type
    operators is highly oscillatory, and a smooth deterministic start is
    nearly orthogonal to it — power iteration would then underestimate lmax
    badly, which is the one failure that can hurt (see chebyshev_apply)."""
    reduce_ = gram_reduce or (lambda g: g)
    v = jax.random.normal(jax.random.PRNGKey(42), (n, 1), dtype)

    def mat(u):
        w = apply_a(u)
        return w if inv_diag is None else w * inv_diag[:, None]

    def body(_, v):
        w = mat(v)
        nrm = jnp.sqrt(reduce_(jnp.sum(w * w)))
        return w / jnp.maximum(nrm, 1e-30)

    v = lax.fori_loop(0, iters, body, v)
    w = mat(v)
    num = reduce_(jnp.sum(v * w))
    den = reduce_(jnp.sum(v * v))
    return num / jnp.maximum(den, 1e-30)


def chebyshev_apply(apply_a, R, lmin, lmax, degree, inv_diag=None):
    """W ~ A^-1 R via degree-``degree`` Chebyshev iteration on [lmin, lmax]
    (eigen-bounds of ``D^-1 A`` when ``inv_diag`` is given, of A otherwise).
    Zero dot products; static trip count.

    ``degree`` is rounded up to ODD. The applied polynomial
    p(x) = (1 - r(x))/x with residual r(x) = T_d(sigma(x))/T_d(sigma1) is
    positive on (0, lmax] for any d, but for x > lmax the sign of T_d flips
    with the parity of d: even d makes p negative above lmax, so an
    underestimated lmax (power iteration on a clustered top) silently turns
    the preconditioner indefinite and LOBPCG locks onto the wrong end of the
    spectrum. Odd d keeps p > 0 on all of (0, inf) — SPD unconditionally.
    """
    degree = int(degree) | 1  # round up to odd (see docstring)
    prec = (lambda V: V) if inv_diag is None else (lambda V: V * inv_diag[:, None])
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta
    rho0 = 1.0 / sigma1

    x = jnp.zeros_like(R)
    r = R
    d = prec(r) / theta

    def body(_, state):
        x, r, d, rho = state
        x = x + d
        r = r - apply_a(d)
        rho_next = 1.0 / (2.0 * sigma1 - rho)
        d = (rho_next * rho) * d + (2.0 * rho_next / delta) * prec(r)
        return x, r, d, rho_next

    x, _, _, _ = lax.fori_loop(0, degree, body, (x, r, d, rho0))
    return x


def chebyshev_inverse_factory(
    degree: int = 17,
    cond_target: float = 30.0,
    lmax_scale: float = 1.1,
    power_iters: int = 40,
    jacobi: bool = True,
    gram_reduce: Optional[Callable] = None,
    apply_a: Optional[Callable] = None,
):
    """Factory of factories (same contract as ``cg_inverse_factory``):
    ``inverse(A_sh)`` yields the Chebyshev approximate inverse of A_sh.

    degree: polynomial degree (SpMMs per application, static).
    cond_target: lmin = lmax / cond_target — how deep into the low spectrum
        the polynomial stays accurate. Larger = better preconditioner per
        application, slower per-degree decay.
    jacobi: scale by D^-1 (recommended; bounds then live on D^-1 A).
    apply_a / gram_reduce: distributed hooks (sharded SpMM / psum).
    """

    def inverse(A_sh):
        if apply_a is not None:
            # caller-supplied operator (e.g. sharded SpMM inside shard_map):
            # plain-callable convention, bounds estimated through the hook
            diag = A_sh.diagonal() if (jacobi and hasattr(A_sh, "diagonal")) else None
            inv_diag = None if diag is None else 1.0 / diag
            n = A_sh.shape[0]
            lmax = (
                _power_lmax(
                    apply_a, inv_diag, n, A_sh.dtype, power_iters, gram_reduce
                )
                * lmax_scale
            )
            lmin = lmax / cond_target

            def solve(X):
                return chebyshev_apply(apply_a, X, lmin, lmax, degree, inv_diag)

            return solve

        # closure-free pair: operand + Jacobi diagonal + spectral bounds are
        # aux (threaded through jit as arguments); the solve fn is memoized
        # on the static config so solver jit caches hit across factory calls
        diag = A_sh.diagonal() if (jacobi and hasattr(A_sh, "diagonal")) else None
        inv_diag = None if diag is None else 1.0 / diag
        lmax = _estimate_lmax_jit(A_sh, inv_diag, int(power_iters)) * lmax_scale
        lmin = lmax / cond_target
        aux = (A_sh, inv_diag, lmin, lmax)
        return aux, _cheb_solve_fn(int(degree), bool(jacobi))

    return inverse


def _estimate_lmax_jit(A_sh, inv_diag, iters):
    # iters as a traced scalar would retrace fori_loop bounds; pass as a
    # Python int bound into fori_loop via closure — memoize per iters value
    return _ESTIMATE_FNS.setdefault(
        iters,
        jax.jit(
            lambda A_, d_, _it=iters: _power_lmax(
                lambda V: spmm(A_, V), d_, A_.shape[0], A_.dtype, _it, None
            )
        ),
    )(A_sh, inv_diag)


_ESTIMATE_FNS = {}
_CHEB_SOLVE_FNS = {}


def _cheb_solve_fn(degree, jacobi):
    key = (degree, jacobi)
    if key not in _CHEB_SOLVE_FNS:

        def solve_pair(aux, X, _deg=degree):
            A_, inv_diag, lmin, lmax = aux
            return chebyshev_apply(
                lambda V: spmm(A_, V), X, lmin, lmax, _deg, inv_diag
            )

        _CHEB_SOLVE_FNS[key] = solve_pair
    return _CHEB_SOLVE_FNS[key]
