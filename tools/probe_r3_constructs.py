"""Micro-probes for the radius-3 fused-conv worker fault at nside=128.

Context (round 3): with the k=20 VMEM fix in, the radius-3 kernel (k=40,
h=12, K=5) passes on-chip at every P=128 (single lane tile) config and in
interpret-mode multi-band, but hard-faults the TPU worker at nside=128 —
the first multi-tile (P=256) config any radius-3 kernel hits — with BOTH
strip paths.  Radius-2 at the same P=256 geometry passes (k=20@128,
5.81 ms).  The constructs unique to radius 3 on a multi-tile band are
isolated here, one tiny Pallas kernel per probe, each run in THIS process
(use a fresh process per probe: a fault poisons the runtime).

Usage:  python tools/probe_r3_constructs.py PROBE
  PROBE in:
    roll_l3   lane roll by +3 on a (4, 160, 256) f32 band
    roll_lm3  lane roll by 253 (= P-3)
    roll_s3   sublane roll by +3 / by (Sr-3)
    store12   masked 12-lane store at lane offset 140 (h + n = 140)
    lap3      one full radius-3 lap: 7 lane rolls + grouped FMA + 6
              sublane rolls (the term_stream inner loop, no DMA)
    lap3k5    K=5 Chebyshev chain of radius-3 laps (the unrolled
              recursion, no DMA) — VMEM-pressure shape of the real kernel

Prints PROBE-OK {json} on success; a fault kills the process.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

C, Sr, P = 4, 160, 256


def main():
    probe = sys.argv[1] if len(sys.argv) > 1 else "roll_l3"

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(C, Sr, P)), jnp.float32)
    interpret = jax.devices()[0].platform != "tpu"

    def run(kernel_fn, ref_fn, arrs=None):
        arrs = (x,) if arrs is None else arrs
        out = pl.pallas_call(
            kernel_fn,
            out_shape=jax.ShapeDtypeStruct(arrs[0].shape, arrs[0].dtype),
            interpret=interpret,
        )(*arrs)
        got = np.asarray(out)
        want = np.asarray(ref_fn(*arrs))
        err = float(np.abs(got - want).max())
        print("PROBE-OK " + json.dumps(
            {"probe": probe, "max_abs_err": err,
             "platform": jax.devices()[0].platform}), flush=True)

    if probe == "roll_l3":
        run(lambda x_ref, o_ref: o_ref.__setitem__(
                (...,), pltpu.roll(x_ref[...], 3, axis=2)),
            lambda x: jnp.roll(x, 3, axis=2))
    elif probe == "roll_lm3":
        run(lambda x_ref, o_ref: o_ref.__setitem__(
                (...,), pltpu.roll(x_ref[...], P - 3, axis=2)),
            lambda x: jnp.roll(x, P - 3, axis=2))
    elif probe == "roll_s3":
        def k(x_ref, o_ref):
            a = pltpu.roll(x_ref[...], 3, axis=1)
            o_ref[...] = pltpu.roll(a, Sr - 3, axis=1) + a * 0.0

        run(k, lambda x: jnp.roll(jnp.roll(x, 3, axis=1), Sr - 3, axis=1)
            + jnp.roll(x, 3, axis=1) * 0.0)
    elif probe == "store12":
        n, h = 128, 12

        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...]
            o_ref[:, :, h + n : h + n + h] = x_ref[:, :, 0:h] * 2.0

        def ref(x):
            y = np.asarray(x).copy()
            y[:, :, h + n : h + n + h] = y[:, :, 0:h] * 2.0
            return jnp.asarray(y)

        run(k, ref)
    elif probe in ("lap3", "lap3k5"):
        radius = 3
        nlap = 4 if probe == "lap3k5" else 1
        w_in = jnp.asarray(rng.normal(size=(1, Sr, P)), jnp.float32)

        def lap(p, w):
            lanes = {0: p}
            for dy in range(1, radius + 1):
                lanes[-dy] = pltpu.roll(p, dy, axis=2)
                lanes[dy] = pltpu.roll(p, P - dy, axis=2)
            t = None
            for dx in range(-radius, radius + 1):
                u = None
                for dy in range(-radius, radius + 1):
                    u = w * lanes[dy] if u is None else u + w * lanes[dy]
                if dx:
                    u = pltpu.roll(u, (Sr - dx) % Sr, axis=1)
                t = u if t is None else t + u
            return t

        def lap_ref(p, w):
            lanes = {dy: jnp.roll(p, -dy, axis=2)
                     for dy in range(-radius, radius + 1)}
            t = None
            for dx in range(-radius, radius + 1):
                u = None
                for dy in range(-radius, radius + 1):
                    u = w * lanes[dy] if u is None else u + w * lanes[dy]
                if dx:
                    u = jnp.roll(u, -dx, axis=1)
                t = u if t is None else t + u
            return t

        def k(x_ref, w_ref, o_ref):
            prev2, prev1 = None, x_ref[...]
            w = w_ref[...]
            for _ in range(nlap):
                t = lap(prev1, w)
                if prev2 is not None:
                    t = t - prev2
                prev2, prev1 = prev1, t
            o_ref[...] = prev1

        def ref(x, w):
            prev2, prev1 = None, x
            for _ in range(nlap):
                t = lap_ref(prev1, w)
                if prev2 is not None:
                    t = t - prev2
                prev2, prev1 = prev1, t
            return prev1

        run(k, ref, arrs=(x, w_in))
    else:
        raise SystemExit(f"unknown probe {probe!r}")


if __name__ == "__main__":
    main()
