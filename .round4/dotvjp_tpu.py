"""On-chip compile/run proof: forced-dot fused dx+dW at nside=1024 (the
config that VMEM-OOMed before the dot-mode band shrink)."""
import time, numpy as np, jax, jax.numpy as jnp
from deepsphere_tpu import config
from deepsphere_tpu.graph import build_sphere_graph
from deepsphere_tpu.ops import pallas_stencil as ps
from deepsphere_tpu.ops.stencil import cface_embed, stencil_tables
config.set_contract_mode("dot")
NSIDE, K, B, FIN, FOUT = 1024, 5, 4, 4, 4
g = build_sphere_graph(NSIDE, k=8, method="grid", cache_dir="/root/repo/.bench_cache")
st = g.face_stencil(0.75, n_steps=K-1)
tables = jax.device_put(stencil_tables(st))
rng = np.random.RandomState(0)
kern = jnp.asarray(rng.normal(scale=0.1, size=(FIN*K, FOUT)), jnp.float32)
x = jnp.asarray(rng.normal(size=(B, g.n_pixels, FIN)), jnp.float32)
xc = jax.block_until_ready(jax.jit(
    lambda x: cface_embed(x, st.nside, st.n_steps).reshape(B*FIN, 12, st.nside, -1))(x))
@jax.jit
def vjp_step(tables, xc, kernel):
    def loss(xc, kernel):
        y = ps.fused_stencil_conv_cfp(st, tables, xc, kernel, K, "cheby", B, interpret=False)
        return jnp.sum(y.astype(jnp.float32) ** 2)
    l, (dx, dk) = jax.value_and_grad(loss, argnums=(0, 1))(xc, kernel)
    return l, dx, dk
t0 = time.time()
out = jax.block_until_ready(vjp_step(tables, xc, kern))
print(f"compile+first run {time.time()-t0:.1f}s  loss={float(out[0]):.4g}")
t0 = time.time(); n = 5
for _ in range(n):
    out = jax.block_until_ready(vjp_step(tables, xc, kern))
print(f"dot fused fwd+dx+dW: {(time.time()-t0)/n*1e3:.2f} ms")
