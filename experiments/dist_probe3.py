"""TPU probe 3 (slim): is psum-under-shard_map the sharded solver's cost?

dist_probe.py cleared the SpMM (tens of us under shard_map); dist_tpu.py
measured the full sharded solver at ~8 ms/iter where single-chip runs
0.28 ms. The remaining suspects are the blocked-ortho and Rayleigh dots,
whose Gram reductions go through lax.psum on the 1-device mesh axis. Times
each phase chained under shard_map with psum vs an identity reduce, plus
the identical single-chip ortho chain.

    python experiments/dist_probe3.py [N]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from dune_eigensolver_tpu.dist import make_mesh
from dune_eigensolver_tpu.dist.mesh import ROW_AXIS
from dune_eigensolver_tpu.dist.sharded import (
    _ShardEngine,
    _shard_dia,
    psum_reduce,
)
from dune_eigensolver_tpu.ops.ortho import (
    dot_products_diagonal_t,
    orthonormalize_blocked_t,
)
from dune_eigensolver_tpu.sparse import problems

K, K1, REPS = 40, 8, 3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dt = np.float32
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    A = problems.laplacian_dirichlet_2d(N, dtype=dt)
    n, m = A.shape[0], 8
    mesh = make_mesh(1)
    axis = ROW_AXIS
    A_sh = _shard_dia(A, mesh, axis)
    Xt = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (m, n), dt) / np.sqrt(n),
        NamedSharding(mesh, P(None, axis)),
    )
    reduce_ = psum_reduce(axis)
    ident = lambda g: g  # noqa: E731

    def phase_time(phase, red):
        def build(k):
            def local(adata, x):
                eng = _ShardEngine([adata], [A.offsets], m, axis, "padded")
                bodies = dict(
                    ortho=lambda _, Q: orthonormalize_blocked_t(
                        Q, block=8, gram_reduce=red, iterations=1
                    ),
                    dots=lambda _, Q: Q
                    + red(dot_products_diagonal_t(Q, Q))[:, None] * 0.0,
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
        for f in (fK, fK1):
            _ = np.asarray(jnp.ravel(f(A_sh.data, Xt))[0])
        bK = bK1 = float("inf")
        for _ in range(REPS):
            for f, k in ((fK, K), (fK1, K1)):
                t0 = time.perf_counter()
                _ = np.asarray(jnp.ravel(f(A_sh.data, Xt))[0])
                tt = time.perf_counter() - t0
                if k == K:
                    bK = min(bK, tt)
                else:
                    bK1 = min(bK1, tt)
        return max((bK - bK1) / (K - K1), 1e-9)

    for phase in ("ortho", "dots"):
        t_p = phase_time(phase, reduce_)
        t_i = phase_time(phase, ident)
        print(
            f"DIST_PROBE3 {phase} psum={t_p*1e6:.0f}us nopsum={t_i*1e6:.0f}us",
            flush=True,
        )

    # identical single-chip ortho chain (default padded engine layout)
    from dune_eigensolver_tpu.kernels.dia_spmm import PaddedLayout

    L = PaddedLayout(n, m, A.offsets)
    Xp = jnp.asarray(L.pad(np.asarray(Xt)))

    def build1(k):
        return jax.jit(
            lambda x: lax.fori_loop(
                0, k,
                lambda i, v: orthonormalize_blocked_t(v, block=8, iterations=1),
                x,
            )
        )

    fK, fK1 = build1(K), build1(K1)
    for f in (fK, fK1):
        _ = np.asarray(jnp.ravel(f(Xp))[0])
    bK = bK1 = float("inf")
    for _ in range(REPS):
        for f, k in ((fK, K), (fK1, K1)):
            t0 = time.perf_counter()
            _ = np.asarray(jnp.ravel(f(Xp))[0])
            tt = time.perf_counter() - t0
            if k == K:
                bK = min(bK, tt)
            else:
                bK1 = min(bK1, tt)
    print(
        f"DIST_PROBE3 single_ortho {max((bK-bK1)/(K-K1),1e-9)*1e6:.0f}us",
        flush=True,
    )
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
