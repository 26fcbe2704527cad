"""Device mesh helpers for row-partitioned execution."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

ROW_AXIS = "rows"


def init_distributed(**kw) -> None:
    """Multi-host startup: call once per process on a pod slice before any
    jax use (wraps ``jax.distributed.initialize``; coordinator address etc.
    come from the TPU environment or ``kw``). The reference deliberately
    never initializes MPI ("DO NOT INITIALIZE MPI, it starts some threads!",
    src/dune-eigensolver.cc:742-748); here multi-host is first-class — after
    this call ``jax.devices()`` spans the slice and ``make_mesh()`` builds a
    global mesh whose collectives ride ICI/DCN."""
    jax.distributed.initialize(**kw)


def make_mesh(n_devices: Optional[int] = None, axis: str = ROW_AXIS) -> Mesh:
    """1D mesh over the first ``n_devices`` devices. Row partitioning is the
    natural decomposition for the tall-skinny workloads here: the matrix and
    multivector rows shard; the m (RHS) dimension stays local to keep every
    Gram matmul a single-chip MXU op + one psum."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(
            f"make_mesh: requested {n_devices} devices but only "
            f"{len(devs)} are visible on backend {jax.default_backend()!r}"
        )
    return Mesh(np.array(devs[:n_devices]), (axis,))
