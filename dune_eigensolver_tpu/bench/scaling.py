"""Weak-scaling measurement over the device mesh.

BASELINE.md's north star asks for 1 -> N weak-scaling efficiency >= 80% on
the row-partitioned solver. This harness keeps the per-device row count
fixed, grows the mesh, and measures the halo-exchange SpMM iteration (the
communication-bound hot loop): efficiency(P) = t(1) / t(P) — ideal weak
scaling keeps per-iteration time flat since local work is constant and the
halo volume is O(bw * m) per neighbor, independent of P.

On a CPU-simulated mesh (tests, single-chip machines) the numbers
characterize the simulation, not ICI; the harness exists so the same
protocol runs unchanged on a real pod slice.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dune_eigensolver_tpu.dist.mesh import ROW_AXIS, make_mesh
from dune_eigensolver_tpu.dist.sharded import _shard_dia, dia_spmm_halo
from dune_eigensolver_tpu.sparse import problems


def weak_scaling_spmm(
    rows_per_device: int = 1 << 14,
    m: int = 8,
    n_iter: int = 50,
    device_counts: Optional[List[int]] = None,
    dtype=np.float32,
    verbose: int = 0,
    coupling: str = "islands",
) -> List[dict]:
    """Measure the sharded SpMM per-iteration time at fixed rows/device.

    rows_per_device must be a square (an N x N grid strip per device).
    Returns one record per mesh size with ``efficiency`` relative to P=1.

    ``coupling``: 'islands' = p decoupled N x N Laplacians (the matrix the
    reference's disabled matvec benchmark wanted, cc:421-425; exchanged
    halo rows multiply zeros) or 'connected' = one N x (N*p) rectangular
    Laplacian whose shard cuts carry REAL -1 couplings — halo data is live
    and any correctness/overlap regression shows up in the numbers.
    """
    ndev_avail = len(jax.devices())
    counts = device_counts or [p for p in (1, 2, 4, 8) if p <= ndev_avail]
    Nloc = int(np.sqrt(rows_per_device))
    if Nloc * Nloc != rows_per_device:
        raise ValueError("rows_per_device must be a perfect square")

    records = []
    t1 = None
    for p in counts:
        n = rows_per_device * p
        if coupling == "connected":
            Ap = problems.laplacian_dirichlet_rect(Nloc, Nloc * p, dtype=dtype)
        else:
            Ap = problems.laplacian_islands_2d(Nloc, p, dtype=dtype)
        mesh = make_mesh(p)
        A_sh = _shard_dia(Ap, mesh, ROW_AXIS)
        X = jax.device_put(
            jnp.ones((n, m), dtype), NamedSharding(mesh, P(ROW_AXIS, None))
        )

        def many(adata, x):
            def step(_, v):
                return dia_spmm_halo(adata, Ap.offsets, v, axis=ROW_AXIS) * 0.125

            return jax.lax.fori_loop(0, n_iter, step, x)

        fn = jax.jit(
            jax.shard_map(
                many,
                mesh=mesh,
                in_specs=(P(None, ROW_AXIS), P(ROW_AXIS, None)),
                out_specs=P(ROW_AXIS, None),
            )
        )
        out = fn(A_sh.data, X)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(A_sh.data, X)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / n_iter)
        if t1 is None:
            t1 = best
        eff = t1 / best
        rec = dict(
            devices=p,
            rows=n,
            t_iter=best,
            efficiency=eff,
            gbps_per_device=(len(Ap.offsets) * n + 2 * n * m)
            * np.dtype(dtype).itemsize
            / best
            / 1e9
            / p,
        )
        records.append(rec)
        if verbose > 0:
            print(
                f"  P={p} n={n} t={best*1e6:.0f}us/iter "
                f"eff={eff:.2f} {rec['gbps_per_device']:.1f} GB/s/dev"
            )
    return records


def scaling_test(ptree) -> List[dict]:
    """CLI protocol: greppable ``SCALING <coupling> P n t_us eff`` lines,
    one sweep per coupling variant (islands + connected)."""
    rows = 1 << int(ptree.get("scaling.log2_rows_per_device", 12))
    m = int(ptree["mv.m"])
    out = []
    for coupling in ("islands", "connected"):
        recs = weak_scaling_spmm(
            rows_per_device=rows,
            m=m,
            n_iter=int(ptree.get("scaling.n_iter", 30)),
            dtype=np.dtype(ptree["ev.dtype"]),
            verbose=int(ptree["ev.verbose"]),
            coupling=coupling,
        )
        for r in recs:
            r["coupling"] = coupling
            print(
                f"SCALING {coupling} {r['devices']} {r['rows']} "
                f"{r['t_iter']*1e6:.0f} {r['efficiency']:.3f}",
                flush=True,
            )
        out.extend(recs)
    return out
