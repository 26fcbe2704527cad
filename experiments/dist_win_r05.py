"""TPU capture r5: ALL THREE general-sparsity distributed drivers
(dist/windowed.py) on the 1-chip mesh vs their single-chip counterparts
(VERDICT r4 ask #2 — r4 captured only sharded_lobpcg_general; after the
"interpret mode validates semantics, not lowerability" burns, an
uncaptured shard_map+Pallas driver is not done).

Per driver: steady-state solve time (2nd call), iteration count, eigenvalue
maxdiff vs the single-chip solver, per-iteration ratio sharded/single.
Persists DIST_WIN.json (worst-case ratio embedded in bench.py's primary
line as ``dist_gen_per_iter_ratio``).

    python experiments/dist_win_r05.py [nun] [Nel]

Greppable DIST_WIN5 rows; hard exit (tunnel teardown can hang).
"""

import json
import os
import sys
import time

import numpy as np
import jax
import scipy.sparse as sp

from dune_eigensolver_tpu.dist import (
    make_mesh,
    sharded_generalized_inverse_general,
    sharded_lobpcg_general,
    sharded_standard_largest_general,
)
from dune_eigensolver_tpu.factorize import cg_inverse_factory
from dune_eigensolver_tpu.solvers import (
    generalized_inverse,
    lobpcg_generalized,
    standard_largest,
)
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import ell_from_scipy
from dune_eigensolver_tpu.sparse.reorder import rcm_pencil
from dune_eigensolver_tpu.utils.compile_cache import enable_compile_cache


def timed2(fn):
    """(steady-state seconds, result) — 2nd call, compile amortized."""
    res = fn()
    _ = np.asarray(res.eigenvalues)
    t0 = time.perf_counter()
    res = fn()
    _ = np.asarray(res.eigenvalues)
    return time.perf_counter() - t0, res


def row(name, t1, r1, ts, rs, out):
    it1, its = max(int(r1.iterations), 1), max(int(rs.iterations), 1)
    ev1 = np.sort(np.asarray(r1.eigenvalues))
    evs = np.sort(np.asarray(rs.eigenvalues))
    k = min(len(ev1), len(evs))
    maxdiff = float(np.abs(ev1[:k] - evs[:k]).max())
    ratio = (ts / its) / (t1 / it1)
    print(
        f"DIST_WIN5 {name} single={t1:.3f}s/{it1}it sharded={ts:.3f}s/"
        f"{its}it per_iter_ratio={ratio:.2f} eval_maxdiff={maxdiff:.2e}",
        flush=True,
    )
    out[f"{name}_per_iter_ratio"] = round(ratio, 2)
    out[f"{name}_maxdiff"] = float(f"{maxdiff:.3e}")


def main():
    nun = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    Nel = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    cache = enable_compile_cache()
    print(
        f"device={jax.devices()[0].device_kind} compile_cache={cache}",
        flush=True,
    )
    mesh = make_mesh(1)
    out = {}

    # --- operand 1: unstructured graph Laplacian, RCM-ordered (ELL) ---
    S = problems.unstructured_laplacian(
        nun, extra_edges=nun // 20, seed=5, fmt="scipy"
    )
    Au, _, _ = rcm_pencil(S, dtype=np.float32)
    Sr = Au.to_scipy().astype(np.float32)
    print(f"unstructured: n={nun} nnz={Au.nnz}", flush=True)

    # prebuilt plans: repeated solves must not re-plan + re-upload (the
    # dominant per-solve cost on small operands — dist_win_attrib.py
    # measured the 200-iteration loop at ~40 ms inside a ~1.05 s call)
    from dune_eigensolver_tpu.dist.windowed import (
        largest_operator,
        pencil_operator,
        windowed_shard_plan,
    )

    # largest: identical semantics single vs sharded
    plan_l = windowed_shard_plan(largest_operator(Sr), 1)
    t1, r1 = timed2(
        lambda: standard_largest(Au, nev=4, tol=1e-8, maxiter=200)
    )
    ts, rs = timed2(
        lambda: sharded_standard_largest_general(
            Sr, nev=4, tol=1e-8, maxiter=200, mesh=mesh, plan=plan_l
        )
    )
    row("largest_general", t1, r1, ts, rs, out)

    # lobpcg: loose-CG preconditioner both sides (rtol 1e-2, 25 iters)
    Bu = ell_from_scipy(sp.eye(nun), dtype=np.float32)
    plan_lo = windowed_shard_plan(
        pencil_operator(Sr, None, shift=1e-3), 1, m=3 * 8
    )
    t1, r1 = timed2(
        lambda: lobpcg_generalized(
            Au, Bu, nev=4, tol=2e-3, maxiter=300, shift=1e-3,
            precond=cg_inverse_factory(rtol=1e-2, maxiter=25),
        )
    )
    ts, rs = timed2(
        lambda: sharded_lobpcg_general(
            Sr, nev=4, tol=2e-3, maxiter=300, shift=1e-3, mesh=mesh,
            cg_rtol=1e-2, cg_maxiter=25, plans=(plan_lo, None),
        )
    )
    row("lobpcg_general", t1, r1, ts, rs, out)

    # --- operand 2: elasticity GenEO pencil (BSR 2x2) ---
    A, B = problems.elasticity_2d(Nel, dtype=np.float32)
    Sa = A.to_scipy().tocsr()
    Sb = B.to_scipy().tocsr()
    print(f"elasticity: n={A.shape[0]} nnz={A.nnz}", flush=True)
    t1, r1 = timed2(
        lambda: generalized_inverse(
            A, B, nev=4, tol=2e-3, maxiter=300, shift=1e-3
        )
    )
    Sop = pencil_operator(Sa, Sb, shift=1e-3)
    plan_gb = windowed_shard_plan(Sb, 1, diag_fill=0.0)
    for inner in ("schwarz", "cg"):
        plan_ga = windowed_shard_plan(
            Sop, 1, local_band=(inner == "schwarz")
        )
        ts, rs = timed2(
            lambda: sharded_generalized_inverse_general(
                Sa, Sb, nev=4, tol=2e-3, maxiter=300, shift=1e-3,
                mesh=mesh, cg_rtol=1e-6, cg_maxiter=500, inner=inner,
                plans=(plan_ga, plan_gb),
            )
        )
        row(f"generalized_general_{inner}", t1, r1, ts, rs, out)

    # worst over the DEFAULT engine of each driver; the inner='cg' row is
    # an A/B diagnostic (schwarz is the generalized default), not a path
    # users land on
    worst = max(
        out["largest_general_per_iter_ratio"],
        out["lobpcg_general_per_iter_ratio"],
        out["generalized_general_schwarz_per_iter_ratio"],
    )
    out["worst_per_iter_ratio"] = worst
    out["stamp"] = time.strftime("%Y-%m-%d %H:%M:%S")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DIST_WIN.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh)
        fh.write("\n")
    print(f"persisted {path}: worst ratio {worst}", flush=True)
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
