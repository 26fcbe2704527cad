"""TPU probe: WHY is the padded Pallas SpMM ~20x slower inside shard_map?

First hardware run of the distributed layer (experiments/dist_tpu.py,
round 4) showed the sharded solvers are CORRECT on the chip but the
padded_spmm_halo chain measured 673us/iter at n=262k where the plain
persistent-layout kernel runs ~30us — and its K=50 chain took 318 s to
compile. This probe bisects the composition stack one layer at a time:

  plain_T32k   jit(fori(padded_spmm donate=True)), default _pick_tile
  plain_shardT same, but with the _ShardEngine tile (pick_shard_tile)
  plain_nodon  shard tile, donate=False
  sm_prepad    shard_map(fori(padded_spmm)), operator pre-padded OUTSIDE
  sm_engine    shard_map(fori(eng.apply)), _ShardEngine built inside
  sm_halo      shard_map(fori(padded_spmm_halo)) — the dist hot path
  sm_xla       shard_map(fori(dia_spmm_halo_t)) — the XLA slice formulation

Greppable DIST_PROBE lines with per-variant compile seconds + us/iter
(two-K slope: (T(K) - T(K/5)) / (K - K/5), best of reps).

    python experiments/dist_probe.py [N]
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
    dia_spmm_halo_t,
    padded_spmm_halo,
)
from dune_eigensolver_tpu.kernels.dia_spmm import (
    PaddedDIA,
    PaddedLayout,
    padded_spmm,
    pick_shard_tile,
)
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix

K, K1, REPS = 30, 6, 3


def slope(build):
    """build(k) -> (fn, args); returns (t_us_per_iter, compile_s)."""
    t0 = time.perf_counter()
    fK, aK = build(K)
    out = fK(*aK)
    _ = np.asarray(jnp.ravel(out)[0])
    t_compile = time.perf_counter() - t0
    fK1, aK1 = build(K1)
    out = fK1(*aK1)
    _ = np.asarray(jnp.ravel(out)[0])
    bK = bK1 = float("inf")
    for _r in range(REPS):
        for f, a, k in ((fK, aK, K), (fK1, aK1, K1)):
            t0 = time.perf_counter()
            out = f(*a)
            _ = np.asarray(jnp.ravel(out)[0])
            t = time.perf_counter() - t0
            if k == K:
                bK = min(bK, t)
            else:
                bK1 = min(bK1, t)
    return max((bK - bK1) / (K - K1), 1e-9), t_compile


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dt = np.float32
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    A = problems.laplacian_dirichlet_2d(N, dtype=dt)
    A = DIAMatrix(data=A.data / 8.0, offsets=A.offsets, shape=A.shape)
    n, m = A.shape[0], 8
    mesh = make_mesh(1)
    axis = ROW_AXIS
    A_sh = _shard_dia(A, mesh, axis)
    X = jax.random.normal(jax.random.PRNGKey(0), (m, n), dt)
    Xsh = jax.device_put(X, NamedSharding(mesh, P(None, axis)))

    def plain(tile, donate):
        L = (
            PaddedLayout(n, m, A.offsets)
            if tile is None
            else PaddedLayout(n, m, A.offsets, tile=tile)
        )
        Ap = L.pad_operator(A)
        Xp = L.pad(X)

        def build(k):
            def chain(x, pdata):
                op = PaddedDIA(data=pdata, offsets=A.offsets, shape=A.shape,
                               tile=L.T, guard=L.G)
                return lax.fori_loop(
                    0, k, lambda i, v: padded_spmm(op, v, donate=donate), x
                )

            return jax.jit(chain), (Xp, Ap.data)

        return build, L.T

    shard_tile = pick_shard_tile(n, m, A.offsets)

    build, T0 = plain(None, True)
    t, c = slope(build)
    print(f"DIST_PROBE plain_T{T0} {t*1e6:.0f}us compile={c:.1f}s", flush=True)
    build, _ = plain(shard_tile, True)
    t, c = slope(build)
    print(f"DIST_PROBE plain_shardT{shard_tile} {t*1e6:.0f}us compile={c:.1f}s",
          flush=True)
    build, _ = plain(shard_tile, False)
    t, c = slope(build)
    print(f"DIST_PROBE plain_nodon {t*1e6:.0f}us compile={c:.1f}s", flush=True)

    # --- shard_map variants ---
    def sm(body_of):
        """body_of(adata, x, k) -> chained result, run under shard_map."""

        def build(k):
            def local(adata, x):
                return body_of(adata, x, k)

            fn = jax.jit(
                jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P(None, axis), P(None, axis)),
                    out_specs=P(None, axis), check_vma=False,
                )
            )
            return fn, (A_sh.data, Xsh)

        return build

    Lsh = PaddedLayout(n, m, A.offsets, tile=shard_tile)

    def sm_prepad(adata, x, k):
        op = Lsh.pad_operator(
            DIAMatrix(data=adata, offsets=A.offsets, shape=A.shape)
        )
        xp = Lsh.pad(x)
        return lax.fori_loop(
            0, k, lambda i, v: padded_spmm(op, v, donate=False), xp
        )

    def sm_engine(adata, x, k):
        eng = _ShardEngine([adata], [A.offsets], m, axis, "padded")
        op = eng.ops[0]
        xp = eng.pad_q0(x)
        return lax.fori_loop(
            0, k, lambda i, v: padded_spmm(op, v, donate=False), xp
        )

    def sm_halo(adata, x, k):
        eng = _ShardEngine([adata], [A.offsets], m, axis, "padded")
        apply_a = eng.apply(0)
        return lax.fori_loop(0, k, lambda i, v: apply_a(v), eng.pad_q0(x))

    def sm_xla(adata, x, k):
        return lax.fori_loop(
            0, k,
            lambda i, v: dia_spmm_halo_t(adata, A.offsets, v, axis=axis), x,
        )

    for name, body in (
        ("sm_prepad", sm_prepad),
        ("sm_engine", sm_engine),
        ("sm_halo", sm_halo),
        ("sm_xla", sm_xla),
    ):
        t, c = slope(sm(body))
        print(f"DIST_PROBE {name} {t*1e6:.0f}us compile={c:.1f}s", flush=True)

    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
