"""Tunnel-safe device timing.

The TPU may sit behind an RPC tunnel where a detached dispatch costs ~30-40
ms and ``block_until_ready`` does NOT drain the pipeline (only a host fetch
does). Timing one op per dispatch therefore measures the tunnel, not the
chip. ``bench_loop`` is the one timing utility every benchmark here uses:
it chains K applications inside ONE jit (``lax.fori_loop``), fetches a
single element to drain, and differences two chain lengths so the fixed
dispatch+fetch cost cancels (the two-K slope method). This mirrors the
reference's approach of timing n_iter kernel repetitions inside one region
(src/dune-eigensolver.cc:199-203) adapted to an asynchronous device.
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_loop(step, x0, K: int = 50, reps: int = 4, op_args=()):
    """Best time per application of ``step`` by the two-K slope method.

    ``step(x, *op_args) -> x_next`` must be self-composable (same shape in
    and out). t_op = (T(K) - T(K/5)) / (K - K/5): the marginal per-op cost
    with the fixed dispatch+fetch cost differenced out. Each T is
    best-of-reps of a K-chained ``lax.fori_loop`` with one host fetch; the
    K and K/5 runs are interleaved so load transients hit both and cancel.

    ``op_args``: operands (matrix containers, factorizations) threaded
    through jit as REAL ARGUMENTS — closing over them would embed them as
    constants in the compile RPC (tens of MB per compile through the
    tunnel, and a cache miss for every new buffer).
    """
    K1 = max(1, K // 5)

    def compile_chain(k):
        f = jax.jit(
            lambda x, *a: lax.fori_loop(0, k, lambda i, s: step(s, *a), x)
        )
        for attempt in range(3):  # remote-compile RPC is occasionally flaky
            try:
                out = f(x0, *op_args)
                break
            except Exception as e:
                if attempt == 2:
                    raise
                _log(f"bench_loop: compile attempt {attempt} failed ({e!r}); retrying")
                time.sleep(5)
        _ = np.asarray(jnp.ravel(out)[0])  # drain through the tunnel
        return f

    fK, fK1 = compile_chain(K), compile_chain(K1)
    bestK = bestK1 = float("inf")
    for _ in range(reps):
        for f, k in ((fK, K), (fK1, K1)):
            t0 = time.perf_counter()
            out = f(x0, *op_args)
            _ = np.asarray(jnp.ravel(out)[0])
            t = time.perf_counter() - t0
            if k == K:
                bestK = min(bestK, t)
            else:
                bestK1 = min(bestK1, t)
    return max((bestK - bestK1) / (K - K1), 1e-9)
