"""Isolate the quick-start TRAIN-step worker fault (round 5).

The quick_start model's forward compiles and runs on-chip, but its train
step crashed the TPU worker in every round-5 bench rehearsal — through
BOTH the fused dx+dW backward and the two-kernel dot-mode route.  This
probe compiles the backward pieces of ONE quick-start-width conv
(B=16, Fin=Fout=5, K=10, nside=64 -> C=80, dot-mode unroll 4000)
separately, one sacrificial subprocess per piece.

Usage:  python tools/probe_qs_train.py            # parent: all pieces
        python tools/probe_qs_train.py --one NAME # child: one piece
Pieces: fwd          — forward conv (control; known-good)
        vjp_fused    — value_and_grad with config.fused_dw=True
        vjp_twokern  — value_and_grad with config.fused_dw=False
        dw_only      — the standalone dW grad kernel
        dx_only      — the dx pass (forward program on dy)
Env:    PB_NSIDE (64), PB_B (16), PB_F (5), PB_K (10)
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NSIDE = int(os.environ.get("PB_NSIDE", 64))
B = int(os.environ.get("PB_B", 16))
F = int(os.environ.get("PB_F", 5))
K = int(os.environ.get("PB_K", 10))


def child(name):
    import jax
    import jax.numpy as jnp

    from deepsphere_tpu import config as ds_config
    from deepsphere_tpu.graph import build_sphere_graph
    from deepsphere_tpu.ops import pallas_stencil as ps
    from deepsphere_tpu.ops.stencil import stencil_tables

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    g = build_sphere_graph(NSIDE, k=8, method="grid", cache_dir=cache)
    st = g.deep_stencil(0.75, K)
    n, h = st.nside, st.n_steps
    print(f"PROBE {name} nside={n} h={h} C={B*F} unroll={B*F*F*K}",
          flush=True)
    tables = jax.device_put(stencil_tables(st))
    _, P_l = ps.cfp_geometry(n, h)
    rng = np.random.RandomState(0)
    kern = jnp.asarray(rng.normal(scale=0.1, size=(F * K, F)), jnp.float32)
    xc = jax.block_until_ready(jax.jit(lambda key: jax.random.normal(
        key, (B * F, 12, n, P_l), jnp.float32))(jax.random.key(1)))

    if name.startswith("vjp_twokern"):
        ds_config.fused_dw = False
    if name.endswith("_nocorr"):
        # bisection: corner-correction gathers/einsums out of the backward
        os.environ["DS_SKIP_CORR"] = "1"
    name = name.replace("_nocorr", "")

    def conv(tables, xc, kern):
        return ps.fused_stencil_conv_cfp(st, tables, xc, kern, K, "cheby",
                                         B, interpret=False)

    t0 = time.time()
    if name == "fwd":
        y = jax.jit(conv)(tables, xc, kern)
        np.asarray(y[0, 0, 0, 0])
    elif name in ("vjp_fused", "vjp_twokern"):
        @jax.jit
        def step(tables, xc, kern):
            def loss(xc, kern):
                return jnp.sum(conv(tables, xc, kern) ** 2)

            _, (dx, dk) = jax.value_and_grad(loss, argnums=(0, 1))(xc, kern)
            return dx, dk

        dx, dk = step(tables, xc, kern)
        np.asarray(dk[0, 0])
    elif name == "dx_only":
        kt = (kern.reshape(F, K, F).transpose(2, 1, 0).reshape(F * K, F))

        @jax.jit
        def dx(tables, dy, kt):
            return ps._forward_cfp(st, "cheby", K, B, False, tables, dy, kt)

        z = dx(tables, xc, kt)
        np.asarray(z[0, 0, 0, 0])
    elif name.startswith("corr"):
        # the backward's corner-correction block in isolation (the
        # vjp pieces pass with DS_SKIP_CORR=1 and fault without it).
        # corr_bwd = everything the two-kernel backward adds; sub-pieces:
        # corr_zero (just _zero_corrections), corr_basis (ball term stack
        # + dW einsum), corr_dx (_corrected_rows + _patch_corrections)
        dy = jax.block_until_ready(jax.random.normal(
            jax.random.key(2), xc.shape, jnp.float32))
        wk3t = jnp.transpose(
            jnp.asarray(rng.normal(scale=0.1, size=(F, K, F)), jnp.float32),
            (1, 0, 2))
        sub = name.split("_", 1)[1]
        flags = ({"zero", "basis", "dx"} if sub == "bwd"
                 else set(sub.split("-")))

        @jax.jit
        def corr(tables, xc, dy):
            outs = []
            if "zero" in flags:
                outs.append(ps._zero_corrections(st, dy, tables))
            if "basis" in flags:
                tdy = ps._basis_at_rows(st, tables, xc, K, "cheby")
                x_rc = ps._gather_corrections(st, xc)
                outs.append(jnp.einsum(
                    "rbf,krbo->kfo", x_rc.reshape(-1, B, F),
                    tdy.reshape(K, -1, B, F),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
            if "dx" in flags:
                fix = ps._corrected_rows(st, tables, dy, wk3t, K, "cheby", B)
                outs.append(ps._patch_corrections(st, dy, fix))
            return outs

        z = corr(tables, xc, dy)
        np.asarray(z[-1].reshape(-1)[0])
    elif name == "dw_only":
        wext = tables["weights"].astype(jnp.float32)
        dy = jax.block_until_ready(jax.random.normal(
            jax.random.key(2), xc.shape, jnp.float32))

        @jax.jit
        def dw(xc, wext, dy):
            strips = ps.build_strips(st, xc, False)
            return ps._run_grad_kernel(st, "cheby", K, xc, wext, strips, dy,
                                       B, F, False)

        z = dw(xc, wext, dy)
        np.asarray(z[0, 0])
    else:
        raise SystemExit(f"unknown piece {name}")
    print(f"PROBE {name} OK compile+first_s={time.time()-t0:.1f}",
          flush=True)


def main():
    if "--one" in sys.argv:
        child(sys.argv[sys.argv.index("--one") + 1])
        return
    pieces = ("dw_only", "dx_only", "vjp_twokern", "vjp_fused", "fwd")
    if "--pieces" in sys.argv:
        pieces = sys.argv[sys.argv.index("--pieces") + 1].split(",")
    for name in pieces:
        cmd = [sys.executable, os.path.abspath(__file__), "--one", name]
        print(f"== piece {name} ==", flush=True)
        try:
            r = subprocess.run(cmd, timeout=1800, text=True,
                               stdout=subprocess.PIPE,
                               stderr=subprocess.STDOUT)
            for ln in r.stdout.splitlines():
                if ln.startswith("PROBE"):
                    print(ln, flush=True)
            if r.returncode != 0:
                tail = [l for l in r.stdout.strip().splitlines() if l][-3:]
                print(f"{name}: child rc={r.returncode}: " + " | ".join(tail),
                      flush=True)
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT", flush=True)
        time.sleep(20)  # worker recovery margin between pieces


if __name__ == "__main__":
    main()
