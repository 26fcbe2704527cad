"""Attribute the sharded-general per-iteration gap (TPU_DIST_WIN_r05
showed largest_general at 6.9x single-chip per-iter on the 1-chip mesh).

Times, on the same operand (unstructured RCM n=20000), two-K chains of:
  single    — windowed_spmm_t on the single-chip plan (engine formulation)
  kern      — windowed_spmm_t on the SHARDED plan's op (no halo machinery)
  halo_ser  — windowed_spmm_halo_t serialized (bnd=None)
  halo_ovl  — windowed_spmm_halo_t overlapped (dense boundary blocks)
  ortho     — orthonormalize_blocked_t under shard_map with psum
  full      — one _largest_core-style iteration body

    python experiments/dist_win_attrib.py [n]

Greppable WIN_ATTRIB rows.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from dune_eigensolver_tpu.dist.mesh import ROW_AXIS, make_mesh
from dune_eigensolver_tpu.dist.sharded import psum_reduce
from dune_eigensolver_tpu.dist.windowed import (
    _plan_arrays,
    _plan_specs,
    _shard_bnd,
    _shard_container,
    windowed_shard_plan,
    windowed_spmm_halo_t,
)
from dune_eigensolver_tpu.kernels.gather_spmm import windowed_from_ell
from dune_eigensolver_tpu.kernels.gather_spmm import windowed_spmm_t
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.reorder import rcm_pencil
from dune_eigensolver_tpu.utils.compile_cache import enable_compile_cache


def slope(fn_of_k, args, K=60, K1=12, reps=4):
    fns = {k: fn_of_k(k) for k in (K, K1)}
    for f in fns.values():
        _ = np.asarray(jnp.ravel(f(*args))[0])
    best = {K: np.inf, K1: np.inf}
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.perf_counter()
            _ = np.asarray(jnp.ravel(f(*args))[0])
            best[k] = min(best[k], time.perf_counter() - t0)
    return max((best[K] - best[K1]) / (K - K1), 1e-9)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    enable_compile_cache()
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    S = problems.unstructured_laplacian(
        n, extra_edges=n // 20, seed=5, fmt="scipy"
    )
    Au, _, _ = rcm_pencil(S, dtype=np.float32)
    Sr = Au.to_scipy().astype(np.float32)
    Sr = (Sr / float(np.abs(Sr).sum(axis=1).max())).astype(np.float32)

    mesh = make_mesh(1)
    axis = ROW_AXIS
    m = 8
    plan = windowed_shard_plan(Sr, 1)
    W1 = windowed_from_ell(
        type(Au)(data=jnp.asarray(Au.data / 8.0), cols=Au.cols,
                 shape=Au.shape, nnz=Au.nnz)
        if hasattr(Au, "cols") else Au
    )
    rng = np.random.default_rng(0)
    Xt = rng.normal(size=(m, n)).astype(np.float32)

    # single-chip formulation
    X1 = jnp.pad(jnp.asarray(Xt), ((0, 0), (0, W1.width - n)))

    def mk_single(k):
        def body(x, *arrs):
            from dune_eigensolver_tpu.kernels.gather_spmm import WindowedELL

            op = WindowedELL(
                data=arrs[0], lanes=arrs[1], starts=arrs[2],
                far_rows=arrs[3], far_cols=arrs[4], far_vals=arrs[5],
                offs=W1.offs, shape=W1.shape, tile=W1.tile,
                window=W1.window, nnz=W1.nnz, far_nnz=W1.far_nnz,
            )
            return lax.fori_loop(
                0, k, lambda i, v: windowed_spmm_t(op, v), x
            )

        return jax.jit(body)

    args1 = (X1, W1.data, W1.lanes, W1.starts, W1.far_rows, W1.far_cols,
             W1.far_vals)
    t = slope(mk_single, args1)
    print(f"WIN_ATTRIB single t={t*1e6:.0f}us", flush=True)

    Xsh = jax.device_put(
        jnp.asarray(Xt), NamedSharding(mesh, P(None, axis))
    )
    reduce_ = psum_reduce(axis)

    def sharded(body_of):
        def mk(k):
            def local(x, *arrs):
                op = _shard_container(plan, arrs[:6])
                bnd = _shard_bnd(plan, arrs)
                body = body_of(op, bnd)
                return lax.fori_loop(0, k, lambda i, v: body(v), x)

            return jax.jit(
                jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P(None, axis),) + _plan_specs(axis),
                    out_specs=P(None, axis), check_vma=False,
                )
            )

        return mk

    variants = {
        "kern_pad_slice": lambda op, bnd: (
            lambda v: windowed_spmm_t(
                op, jnp.pad(v, ((0, 0), (0, plan.width - plan.nloc)))
            )[:, : plan.nloc]
        ),
        "halo_ser": lambda op, bnd: (
            lambda v: windowed_spmm_halo_t(plan, op, v, axis=axis)
        ),
        "halo_ovl": lambda op, bnd: (
            lambda v: windowed_spmm_halo_t(plan, op, v, axis=axis, bnd=bnd)
        ),
    }
    for name, body_of in variants.items():
        t = slope(sharded(body_of), (Xsh, *_plan_arrays(plan)))
        print(f"WIN_ATTRIB {name} t={t*1e6:.0f}us", flush=True)

    # ortho + full iteration body under shard_map
    from functools import partial

    from dune_eigensolver_tpu.ops.ortho import (
        dot_products_diagonal_t,
        orthonormalize_blocked_t,
    )

    def ortho_body(op, bnd):
        ortho = partial(
            orthonormalize_blocked_t, block=8, gram_reduce=reduce_,
            iterations=1,
        )
        return lambda v: ortho(v)

    def full_body(op, bnd):
        ortho = partial(
            orthonormalize_blocked_t, block=8, gram_reduce=reduce_,
            iterations=1,
        )

        def body(v):
            q2 = windowed_spmm_halo_t(plan, op, v, axis=axis, bnd=bnd)
            q2 = ortho(q2)
            aq = windowed_spmm_halo_t(plan, op, q2, axis=axis, bnd=bnd)
            s = reduce_(dot_products_diagonal_t(q2, aq))
            return q2 + 0.0 * s[:, None]

        return body

    for name, body_of in (("ortho", ortho_body), ("full", full_body)):
        t = slope(sharded(body_of), (Xsh, *_plan_arrays(plan)), K=30, K1=6)
        print(f"WIN_ATTRIB {name} t={t*1e6:.0f}us", flush=True)
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
