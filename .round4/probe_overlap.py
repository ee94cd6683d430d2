"""Does manual double-buffered DMA overlap VPU compute in a Pallas TPU
kernel shaped like our stencil kernel?

Modes: dma (DMA only), comp (compute only), both (prefetch pattern).
If both ~= dma + comp, the overlap is broken; if both ~= max(dma, comp),
the pattern works and the stencil kernel has a specific bug.

Usage: python .round4/probe_overlap.py [mode] [n_ops]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MODE = sys.argv[1] if len(sys.argv) > 1 else "both"
N_OPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
C, S, P = 16, 144, 1152
STEPS = 96


def kernel(x_ref, o_ref, xw, sems):
    step = pl.program_id(0)
    slot = jax.lax.rem(step, 2)

    def copy(src_step, dst_slot):
        return pltpu.make_async_copy(
            x_ref.at[src_step], xw.at[dst_slot], sems.at[dst_slot])

    if MODE in ("dma", "both"):
        @pl.when(step == 0)
        def _():
            copy(0, 0).start()

        @pl.when(step + 1 < STEPS)
        def _():
            copy(step + 1, jax.lax.rem(step + 1, 2)).start()

        copy(step, slot).wait()

    if MODE in ("comp", "both"):
        x = xw[slot]
        acc = x
        for _ in range(N_OPS):
            acc = acc * 1.000001 + x
        o_ref[0, 0] = jnp.sum(acc[:, 0, :])
    else:
        o_ref[0, 0] = xw[slot][0, 0, 0]


def main():
    x = jnp.asarray(np.random.RandomState(0).normal(
        size=(STEPS, C, S, P)), jnp.float32)

    f = pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, C, S, P), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 2**20),
    )
    g = jax.jit(f)
    out = g(x)
    jax.block_until_ready(out)
    np.asarray(out[0, 0])
    n_iters = 20
    t0 = time.time()
    for _ in range(n_iters):
        out = g(x)
    np.asarray(out[0, 0])
    dt = (time.time() - t0) / n_iters
    print(f"OVERLAP mode={MODE} n_ops={N_OPS}: {dt*1e3:.2f} ms "
          f"({dt/STEPS*1e6:.1f} us/step)")


main()
