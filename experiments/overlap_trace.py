"""Overlap evidence for the halo-exchange SpMM (VERDICT r4 ask #3a).

Multi-chip TPU hardware does not exist in this environment (1 chip behind
the axon tunnel), so ICI-side overlap cannot be traced directly. What CAN
be established, and is the precondition XLA's latency-hiding scheduler
needs to overlap an async collective with compute, is DATAFLOW
INDEPENDENCE: the interior sweep must not consume the ppermute results.
This script compiles the real 8-shard programs (virtual CPU mesh — the
same shard_map code path the TPU runs) and analyzes the optimized HLO:

  * for each collective-permute, walk the HLO def-use chains and classify
    every dependent instruction: the collective must feed ONLY the
    edge-correction adds/updates, never the interior FMA sweep (DIA) or
    the Pallas kernel call (windowed);
  * count the interior-sweep instructions that are dataflow-independent
    of every collective (the overlap window the scheduler can use);
  * capture a jax.profiler trace of the same programs for the record.

Writes profile/overlap_r05/{dia_halo.hlo.txt,win_halo.hlo.txt,trace/} and
prints OVERLAP rows consumed by OVERLAP_r05.md.

    python experiments/overlap_trace.py
"""

import os
import re
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from dune_eigensolver_tpu.dist.mesh import ROW_AXIS, make_mesh  # noqa: E402
from dune_eigensolver_tpu.dist.sharded import (  # noqa: E402
    _ShardEngine,
    _shard_dia,
)
from dune_eigensolver_tpu.sparse import problems  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "profile", "overlap_r05",
)


def analyze(tag, hlo_text):
    """Classify the transitive consumers of every collective-permute in
    the optimized HLO: instruction names are %-prefixed and unique
    module-wide, so a name-reference closure over all def lines gives the
    dataflow cone of each collective."""
    defs = {}  # name -> (op, set of operand names)
    for ln in hlo_text.splitlines():
        m = re.match(
            r"^\s*(?:ROOT\s+)?%([\w.\-]+) = \S+ ([\w\-]+)", ln
        )
        if not m:
            continue
        name, op = m.group(1), m.group(2)
        rhs = ln.split("=", 1)[1]
        args = set(re.findall(r"%([\w.\-]+)", rhs)) - {name}
        defs[name] = (op, args)

    coll = {n for n, (op, _) in defs.items()
            if op == "collective-permute"}
    consumers = set(coll)
    changed = True
    while changed:
        changed = False
        for n, (op, args) in defs.items():
            if n not in consumers and args & consumers:
                consumers.add(n)
                changed = True
    dep_ops = {}
    for n in consumers - coll:
        op = defs[n][0]
        dep_ops[op] = dep_ops.get(op, 0) + 1
    kernels = {n for n, (op, _) in defs.items()
               if op in ("custom-call", "fusion")}
    kern_dep = len(kernels & consumers)
    print(
        f"OVERLAP {tag} collectives={len(coll)} "
        f"dependent_instrs={len(consumers) - len(coll)} "
        f"independent_instrs={len(defs) - len(consumers)} "
        f"fusions_or_kernels={len(kernels)} dependent_kernels={kern_dep} "
        f"dependent_op_histogram={sorted(dep_ops.items())}",
        flush=True,
    )
    return kern_dep, dep_ops


def main():
    os.makedirs(OUT, exist_ok=True)
    mesh = make_mesh(8)
    axis = ROW_AXIS
    m = 8

    # --- DIA path: the solver hot loop's padded/xla halo SpMM ---
    N = 64
    A = problems.laplacian_dirichlet_rect(N, N * 8, dtype=np.float32)
    A_sh = _shard_dia(A, mesh, axis)
    n = A.shape[0]
    Xt = jax.device_put(
        jnp.ones((m, n), np.float32), NamedSharding(mesh, P(None, axis))
    )

    def dia_prog(adata, x):
        eng = _ShardEngine([adata], [A.offsets], m, axis, "xla")
        apply_a = eng.apply(0)
        return lax.fori_loop(0, 4, lambda i, v: apply_a(v), eng.pad_q0(x))

    f = jax.jit(
        jax.shard_map(
            dia_prog, mesh=mesh,
            in_specs=(P(None, axis), P(None, axis)),
            out_specs=P(None, axis), check_vma=False,
        )
    )
    hlo = f.lower(A_sh.data, Xt).compile().as_text()
    with open(os.path.join(OUT, "dia_halo.hlo.txt"), "w") as fh:
        fh.write(hlo)
    analyze("dia_xla_halo", hlo)

    # --- windowed general path: overlapped dense-boundary form ---
    from dune_eigensolver_tpu.dist.windowed import (
        _plan_arrays,
        _plan_specs,
        _shard_bnd,
        _shard_container,
        windowed_shard_plan,
        windowed_spmm_halo_t,
    )
    import scipy.sparse as sp

    nw = 4096
    g = np.random.default_rng(0)
    r = np.repeat(np.arange(nw), 3)
    c = np.clip(r + g.integers(-150, 151, r.size), 0, nw - 1)
    S = sp.coo_matrix((g.normal(size=r.size), (r, c)), shape=(nw, nw))
    S = (S + S.T + sp.diags(np.full(nw, 8.0))).tocsr().astype(np.float32)
    plan = windowed_shard_plan(S, 8, tile=512)
    Xw = jax.device_put(
        jnp.ones((m, nw), np.float32), NamedSharding(mesh, P(None, axis))
    )

    def win_prog(x, *arrs):
        op = _shard_container(plan, arrs[:6])
        bnd = _shard_bnd(plan, arrs)
        return lax.fori_loop(
            0, 2,
            lambda i, v: windowed_spmm_halo_t(
                plan, op, v, axis=axis, interpret=True, bnd=bnd
            ),
            x,
        )

    fw = jax.jit(
        jax.shard_map(
            win_prog, mesh=mesh,
            in_specs=(P(None, axis),) + _plan_specs(axis),
            out_specs=P(None, axis), check_vma=False,
        )
    )
    hlo_w = fw.lower(Xw, *_plan_arrays(plan)).compile().as_text()
    with open(os.path.join(OUT, "win_halo.hlo.txt"), "w") as fh:
        fh.write(hlo_w)
    analyze("windowed_overlapped_halo", hlo_w)

    # --- profiler trace of both programs for the record ---
    tdir = os.path.join(OUT, "trace")
    jax.profiler.start_trace(tdir)
    _ = np.asarray(jnp.ravel(f(A_sh.data, Xt))[0])
    _ = np.asarray(jnp.ravel(fw(Xw, *_plan_arrays(plan)))[0])
    jax.profiler.stop_trace()
    print(f"trace written to {tdir}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
