"""Mosaic construct probes for the single-launch strip-builder kernel.

The XLA-side halo-strip assembly costs ~5.3 ms/conv at nside=1024 (op-
launch-bound: ~300 tiny slice/flip/transpose/concat ops).  Folding it
into ONE Pallas launch needs these constructs; probe each in compile
mode before designing around it:

  flip_lane      jnp.flip on the lane (last) axis in VMEM
  flip_sub       jnp.flip on the sublane axis
  transpose2d    jnp.swapaxes(-1, -2) of a thin (n, 8) block
  transpose_ct   (C, n, 8) -> (C, 8, n) batched thin transpose
  dma_lane_off   HBM->VMEM DMA with a non-128-aligned lane slice
  dma_hbm_hbm    direct HBM->HBM async copy
  dma_sub_off    HBM->VMEM DMA with a non-8-aligned sublane offset

Usage: python tools/probe_strips.py   (on TPU; CPU falls back to
interpret mode, which validates nothing about Mosaic).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bank(name, **kv):
    print("PROBE " + json.dumps({"stage": name, **kv}), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    on_tpu = jax.default_backend() == "tpu"
    bank("platform", backend=jax.default_backend(), compile_mode=on_tpu)
    interp = not on_tpu

    rng = np.random.RandomState(0)
    C, n, h = 4, 256, 8
    x = jnp.asarray(rng.normal(size=(C, n, 128)), jnp.float32)

    def probe(name, build, check):
        try:
            out = jax.block_until_ready(build())
            ok = bool(check(np.asarray(out)))
            bank(name, ok=ok, numerics=("exact" if ok else "WRONG"))
        except Exception as e:  # noqa: BLE001
            bank(name, ok=False, error=str(e)[:200])

    # 1. lane flip of a thin (h, n) block
    def flip_lane():
        def kern(x_ref, o_ref):
            o_ref[...] = jnp.flip(x_ref[...], axis=-1)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, n, 128), jnp.float32),
            interpret=interp,
        )(x)

    probe("flip_lane", flip_lane,
          lambda o: np.array_equal(o, np.asarray(x)[:, :, ::-1]))

    # 2. sublane flip
    def flip_sub():
        def kern(x_ref, o_ref):
            o_ref[...] = jnp.flip(x_ref[...], axis=-2)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, n, 128), jnp.float32),
            interpret=interp,
        )(x)

    probe("flip_sub", flip_sub,
          lambda o: np.array_equal(o, np.asarray(x)[:, ::-1, :]))

    # 3. thin 2D transpose (n, h) -> (h, n)
    xt = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)

    def transpose2d():
        def kern(x_ref, o_ref):
            o_ref[...] = jnp.swapaxes(x_ref[...], -1, -2)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((h, n), jnp.float32),
            interpret=interp,
        )(xt)

    probe("transpose2d", transpose2d,
          lambda o: np.array_equal(o, np.asarray(xt).T))

    # 4. batched thin transpose (C, n, h) -> (C, h, n)
    xct = jnp.asarray(rng.normal(size=(C, n, h)), jnp.float32)

    def transpose_ct():
        def kern(x_ref, o_ref):
            o_ref[...] = jnp.swapaxes(x_ref[...], -1, -2)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, h, n), jnp.float32),
            interpret=interp,
        )(xct)

    probe("transpose_ct", transpose_ct,
          lambda o: np.array_equal(o, np.swapaxes(np.asarray(xct), -1, -2)))

    # 5. HBM->VMEM DMA with non-aligned lane slice (lanes [8, 16))
    def dma_lane_off():
        def kern(x_ref, o_ref, buf, sem):
            c = pltpu.make_async_copy(x_ref.at[:, :, 8:16], buf, sem)
            c.start()
            c.wait()
            o_ref[...] = buf[...]

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_shape=jax.ShapeDtypeStruct((C, n, h), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((C, n, h), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interp,
        )(x)

    probe("dma_lane_off", dma_lane_off,
          lambda o: np.array_equal(o, np.asarray(x)[:, :, 8:16]))

    # 6. direct HBM->HBM async copy
    def dma_hbm_hbm():
        def kern(x_ref, o_ref, sem):
            c = pltpu.make_async_copy(
                x_ref.at[:, 0:n, :], o_ref.at[:, 0:n, :], sem
            )
            c.start()
            c.wait()

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((C, n, 128), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
            interpret=interp,
        )(x)

    probe("dma_hbm_hbm", dma_hbm_hbm,
          lambda o: np.array_equal(o, np.asarray(x)))

    # 7. HBM->VMEM DMA with a non-8-aligned sublane offset (rows [4, 12))
    def dma_sub_off():
        def kern(x_ref, o_ref, buf, sem):
            c = pltpu.make_async_copy(x_ref.at[:, 4:12, :], buf, sem)
            c.start()
            c.wait()
            o_ref[...] = buf[...]

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_shape=jax.ShapeDtypeStruct((C, h, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((C, h, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interp,
        )(x)

    probe("dma_sub_off", dma_sub_off,
          lambda o: np.array_equal(o, np.asarray(x)[:, 4:12, :]))

    # 8. VMEM masked lane write: o[:, :, 0:16] = a, rest zeros (the ls
    # packing construct)
    def masked_pack():
        def kern(x_ref, o_ref):
            z = jnp.zeros((C, n, 128), jnp.float32)
            o_ref[...] = z.at[:, :, 0:16].set(x_ref[:, :, 0:16])

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, n, 128), jnp.float32),
            interpret=interp,
        )(x)

    def _check_pack(o):
        want = np.zeros((C, n, 128), np.float32)
        want[:, :, 0:16] = np.asarray(x)[:, :, 0:16]
        return np.array_equal(o, want)

    probe("masked_pack", masked_pack, _check_pack)


if __name__ == "__main__":
    main()
