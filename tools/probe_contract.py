"""Mosaic probe: in-kernel contraction strategies for the fused stencil conv.

The shipped kernel contracts channels with unrolled scalar AXPYs
(B*Fin*Fout*K ops) — fine at the headline config (320) but the unroll count
explodes at quick_start channel counts (B=16, F=5, K=10 -> 4000), inflating
Mosaic compile time and serializing the VPU.  This probe checks which
matmul-style alternatives Mosaic accepts and how they perform:

  axpy    — the shipped scalar-AXPY loop
  dot2d   — per-batch reshape (Fin, S, P) -> (Fin, S*P), 2D jnp.dot
  dotg3   — per-batch lax.dot_general on the 3D operand (no reshape)

Usage: python tools/probe_contract.py [B Fin Fout K]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
FIN = int(sys.argv[2]) if len(sys.argv) > 2 else 4
FOUT = int(sys.argv[3]) if len(sys.argv) > 3 else 4
K = int(sys.argv[4]) if len(sys.argv) > 4 else 5
S, P = 256, 384  # band-window shape family at nside=1024


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = B * FIN
    Cout = B * FOUT
    interpret = jax.default_backend() != "tpu"
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.normal(size=(C, S, P)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(K, FIN, FOUT)), jnp.float32)

    def kern_axpy(wk_ref, a_ref, o_ref):
        acc = [None] * Cout
        for k in range(K):
            t = a_ref[...] * (0.5 + 0.1 * k)  # stand-in for the k-th term
            for b in range(B):
                for fo in range(FOUT):
                    s = acc[b * FOUT + fo]
                    for fi in range(FIN):
                        c = wk_ref[k, fi, fo] * t[b * FIN + fi]
                        s = c if s is None else s + c
                    acc[b * FOUT + fo] = s
        o_ref[...] = jnp.stack(acc, axis=0)

    def kern_dot2d(wk_ref, a_ref, o_ref):
        acc = None
        for k in range(K):
            t = a_ref[...] * (0.5 + 0.1 * k)
            outs = []
            for b in range(B):
                ab = t[b * FIN : (b + 1) * FIN].reshape(FIN, S * P)
                yb = jnp.dot(
                    wk_ref[k].T, ab, preferred_element_type=jnp.float32
                )  # (FOUT, S*P)
                outs.append(yb.reshape(FOUT, S, P))
            y = jnp.concatenate(outs, axis=0)
            acc = y if acc is None else acc + y
        o_ref[...] = acc

    def kern_dotg3(wk_ref, a_ref, o_ref):
        acc = None
        for k in range(K):
            t = a_ref[...] * (0.5 + 0.1 * k)
            outs = []
            for b in range(B):
                ab = t[b * FIN : (b + 1) * FIN]  # (FIN, S, P)
                yb = jax.lax.dot_general(
                    wk_ref[k].T, ab, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (FOUT, S, P)
                outs.append(yb)
            y = jnp.concatenate(outs, axis=0)
            acc = y if acc is None else acc + y
        o_ref[...] = acc

    for name, kern in [("axpy", kern_axpy), ("dot2d", kern_dot2d),
                       ("dotg3", kern_dotg3)]:
        try:
            wk_space = pltpu.SMEM if name == "axpy" else pltpu.VMEM
            f = pl.pallas_call(
                kern,
                in_specs=[
                    pl.BlockSpec(memory_space=wk_space),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Cout, S, P), jnp.float32),
                interpret=interpret,
            )
            jf = jax.jit(lambda wk, a: f(wk, a))
            t0 = time.time()
            out = jf(wk, a)
            jax.block_until_ready(out)
            np.asarray(out[0, 0, 0:1])
            compile_s = time.time() - t0
            # chained timing
            n_it = 30
            z = out
            t0 = time.time()
            for _ in range(n_it):
                z = jf(wk, z[:C] if Cout >= C else jnp.tile(z, (2, 1, 1))[:C])
            np.asarray(z[0, 0, 0:1])
            dt = (time.time() - t0) / n_it
            # correctness vs numpy for the first variant semantics
            want = np.zeros((Cout, S, P), np.float32)
            an = np.asarray(a)
            wn = np.asarray(wk)
            for k in range(K):
                t = an * (0.5 + 0.1 * k)
                for b in range(B):
                    want[b * FOUT : (b + 1) * FOUT] += np.einsum(
                        "fo,fsp->osp", wn[k], t[b * FIN : (b + 1) * FIN]
                    )
            err = np.abs(np.asarray(out) - want).max() / (np.abs(want).max())
            print(f"{name:7s} compile {compile_s:7.1f}s   run {dt*1e3:7.2f} ms"
                  f"   relerr {err:.2e}")
        except Exception as e:
            print(f"{name:7s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
