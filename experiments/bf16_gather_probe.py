"""TPU probe: bf16 operand mode for the windowed-gather kernel.

gather_ablate.py pinned tpu.dynamic_gather as ~81% of the kernel's time at
~3.5 cycles per (8,128) f32 vreg. A bf16 vreg packs (16,128) — if the
gather primitive runs per-vreg, a bf16 operand + multivector serves 2x the
elements per gather (preconditioner-grade accuracy, like the DIA kernel's
bf16 mode that runs 2.02x f32 — experiments/bf16_spmm_probe.py). This
probes lowerability, accuracy (vs the bf16-quantized operator applied in
f64 on the host), and speed at m=16 and m=32.

    python experiments/bf16_gather_probe.py [Nel]

Greppable BF16_GATHER rows.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

import dune_eigensolver_tpu.kernels.gather_spmm as G
from dune_eigensolver_tpu.bench.timing import bench_loop
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import bsr_from_scipy
from dune_eigensolver_tpu.sparse.spmm import spmm_t


def main():
    Nel = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    Ae, _ = problems.elasticity_2d(Nel, dtype=np.float32)
    Sa = Ae.to_scipy()
    Sa = Sa / float(np.abs(Sa).sum(axis=1).max())
    n, nnz = Sa.shape[0], Sa.nnz
    print(f"elasticity: n={n} nnz={nnz}", flush=True)
    rng = np.random.default_rng(1)

    import dataclasses

    import ml_dtypes

    Ab = bsr_from_scipy(Sa, block=(2, 2), dtype=np.float32)
    for m in (16, 32):
        X = rng.normal(size=(m, n)).astype(np.float32)
        for dt, tag in ((np.float32, "f32"), (jnp.bfloat16, "bf16")):
            M_int, _, L = G.make_windowed_operands(Ab, m=m)
            if tag == "bf16":
                M_int = dataclasses.replace(
                    M_int,
                    data=M_int.data.astype(dt),
                    far_vals=M_int.far_vals.astype(dt),
                )
            Xw = L.pad(jnp.asarray(X).astype(dt))
            Yw = np.asarray(spmm_t(M_int, Xw).astype(jnp.float32))[:, :n]
            # host reference on the SAME quantized operator/vectors, f64 sums
            Sq = Sa.copy()
            if tag == "bf16":
                Sq.data = (
                    Sa.data.astype(ml_dtypes.bfloat16).astype(np.float64)
                )
                Xq = X.astype(ml_dtypes.bfloat16).astype(np.float64)
            else:
                Sq.data = Sa.data.astype(np.float64)
                Xq = X.astype(np.float64)
            Yref = (Sq @ Xq.T).T
            err = np.abs(Yw - Yref).max() / np.abs(Yref).max()
            t = bench_loop(
                lambda V, op: spmm_t(op, V), Xw, K=40, reps=4, op_args=(M_int,)
            )
            gf = 2.0 * m * nnz / t / 1e9
            print(
                f"BF16_GATHER {tag} m={m} t={t*1e6:.0f}us {gf:.1f} GFLOP/s "
                f"relerr={err:.2e}",
                flush=True,
            )
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
