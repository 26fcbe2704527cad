"""TPU probe: what forms of in-kernel gather / dynamic indexing does this
Mosaic toolchain actually lower? Findings gate the general-sparsity SpMM
redesign (the W-wide take_along_axis of the original windowed kernel fails
with "Not implemented: Multiple source vregs along gather dimension").

Each probe compiles + runs a minimal kernel and prints OK/FAIL with the
error class. Run standalone on the TPU (one tunnel process at a time).
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        ok = bool(np.asarray(out).all())
        print(f"PROBE {name}: {'OK' if ok else 'WRONG-RESULT'}", flush=True)
    except Exception as e:
        msg = repr(e).replace("\n", " ")[:160]
        print(f"PROBE {name}: FAIL {msg}", flush=True)


# 1. single-vreg lane gather: source (8,128), idx (8,128)
def gather_1vreg():
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.flip(jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32), (8, 128)), 1)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x, idx)
    return np.asarray(out) == np.asarray(jnp.take_along_axis(x, idx, axis=1))


# 2. sublane-stacked source (16,128): 2 vregs along sublanes, 1 along lanes
def gather_2sublane():
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    idx = jnp.flip(jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32), (16, 128)), 1)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32)
    )(x, idx)
    return np.asarray(out) == np.asarray(jnp.take_along_axis(x, idx, axis=1))


# 3. dynamic leading-dim load from a VMEM scratch (nb, 8, 128)
def dyn_scratch_load():
    nb = 4

    def kern(x_ref, p_ref, o_ref, scr):
        for b in range(nb):
            scr[b] = x_ref[:, 128 * b : 128 * (b + 1)]
        p = p_ref[0]
        o_ref[:] = scr[p]

    x = jnp.arange(8 * nb * 128, dtype=jnp.float32).reshape(8, nb * 128)
    p = jnp.array([2], dtype=jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY)
            if False
            else pl.BlockSpec((8, nb * 128), lambda: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
        scratch_shapes=[pltpu.VMEM((nb, 8, 128), jnp.float32)],
    )(x, p)
    return np.asarray(out) == np.asarray(x[:, 256:384])


# 4. dynamic leading-dim load straight from a 3D INPUT block
def dyn_input_load():
    nb = 4

    def kern(x_ref, p_ref, o_ref):
        p = p_ref[0]
        o_ref[:] = x_ref[p]

    x = jnp.arange(nb * 8 * 128, dtype=jnp.float32).reshape(nb, 8, 128)
    p = jnp.array([1], dtype=jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((nb, 8, 128), lambda: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
    )(x, p)
    return np.asarray(out) == np.asarray(x[1])


# 5. dynamic lane-dim ref slice at 128-aligned offset: x_ref[:, pl.ds(p*128, 128)]
def dyn_lane_slice():
    nb = 4

    def kern(x_ref, p_ref, o_ref):
        p = p_ref[0]
        o_ref[:] = x_ref[:, pl.ds(p * 128, 128)]

    x = jnp.arange(8 * nb * 128, dtype=jnp.float32).reshape(8, nb * 128)
    p = jnp.array([3], dtype=jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((8, nb * 128), lambda: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
    )(x, p)
    return np.asarray(out) == np.asarray(x[:, 384:512])


# 6. dynamic roll along lanes (pltpu.roll with traced shift)
def dyn_roll():
    def kern(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[...], -s_ref[0], 1)

    x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
    s = jnp.array([37], dtype=jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        in_specs=[
            pl.BlockSpec((8, 256), lambda: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, 256), lambda: (0, 0)),
    )(x, s)
    return np.asarray(out) == np.asarray(jnp.roll(x, -37, axis=1))


# 7. wider-m gather: source (8, 256) — 2 vregs along LANES (expected FAIL)
def gather_2lane():
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
    idx = jnp.flip(jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32), (8, 256)), 1)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32)
    )(x, idx)
    return np.asarray(out) == np.asarray(jnp.take_along_axis(x, idx, axis=1))


# 8. gather along SUBLANES (axis=0) of a (8,128) source
def gather_sublane_axis():
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.broadcast_to(
        (jnp.arange(8, dtype=jnp.int32)[:, None] + 3) % 8, (8, 128)
    )
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x, idx)
    return np.asarray(out) == np.asarray(jnp.take_along_axis(x, idx, axis=0))


# 9. scalar read from a VMEM int32 block input, used as a dynamic index
def vmem_scalar_index():
    nb = 4

    def kern(x_ref, b_ref, o_ref):
        q = b_ref[1, 2]  # scalar read from VMEM
        o_ref[:] = x_ref[q]

    x = jnp.arange(nb * 8 * 128, dtype=jnp.float32).reshape(nb, 8, 128)
    bases = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (8, 8)).T % nb
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((nb, 8, 128), lambda: (0, 0, 0)),
            pl.BlockSpec((8, 8), lambda: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
    )(x, bases)
    return np.asarray(out) == np.asarray(x[1])


# 10. int8 coefficient block widened in-kernel
def int8_widen():
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = x_ref[...] + i_ref[...].astype(jnp.float32)

    x = jnp.ones((8, 128), jnp.float32)
    i8 = (jnp.arange(8 * 128, dtype=jnp.int32) % 128).astype(jnp.int8)
    i8 = i8.reshape(8, 128)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x, i8)
    return np.asarray(out) == 1.0 + np.asarray(i8, np.float32)


# 11. int8 lanes as gather indices (widened then gathered)
def int8_gather_idx():
    def kern(x_ref, i_ref, o_ref):
        idx = i_ref[...].astype(jnp.int32)
        o_ref[:] = jnp.take_along_axis(x_ref[...], idx, axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx8 = np.flip(np.arange(128, dtype=np.int8) - 128)  # int8 range abuse?
    idx8 = np.broadcast_to(np.flip(np.arange(128)).astype(np.int8), (8, 128))
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x, jnp.asarray(idx8))
    return np.asarray(out) == np.asarray(x)[:, ::-1]


def main():
    d = jax.devices()[0]
    print(f"device={d.device_kind} platform={d.platform}", flush=True)
    probe("gather_1vreg_8x128", gather_1vreg)
    probe("gather_2sublane_16x128", gather_2sublane)
    probe("dyn_scratch_load_3d", dyn_scratch_load)
    probe("dyn_input_load_3d", dyn_input_load)
    probe("dyn_lane_slice_aligned", dyn_lane_slice)
    probe("dyn_roll_lane", dyn_roll)
    probe("gather_2lane_8x256", gather_2lane)
    probe("gather_sublane_axis0", gather_sublane_axis)
    probe("vmem_scalar_index", vmem_scalar_index)
    probe("int8_widen", int8_widen)
    probe("int8_gather_idx", int8_gather_idx)
    print("probe done", flush=True)
    import os

    os._exit(0)


if __name__ == "__main__":
    main()
