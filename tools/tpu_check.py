import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from deepsphere_tpu.graph import build_sphere_graph
from deepsphere_tpu.ops import spmv
from deepsphere_tpu.ops.stencil import stencil_graph_conv, stencil_tables

g = build_sphere_graph(32, k=8, method="grid")
K, B, Fin, Fout = 5, 3, 2, 4
st = g.face_stencil(0.75, n_steps=K-1)
tables = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
rng = np.random.RandomState(11)
x = jnp.asarray(rng.normal(size=(B, g.n_pixels, Fin)), jnp.float32)
kern = jnp.asarray(rng.normal(size=(Fin*K, Fout)), jnp.float32)
idx, val = g.ellpack(0.75)
y_ref = spmv.graph_conv(lambda z, nt: spmv.chebyshev_basis(jnp.asarray(idx), jnp.asarray(val), z, nt), x, kern, K)
y = stencil_graph_conv(st, x, kern, K, "cheby", tables=tables)
print("fwd max err:", float(jnp.max(jnp.abs(y - y_ref))))

# gradients
def loss_fused(x, kern):
    return jnp.sum(jnp.sin(stencil_graph_conv(st, x, kern, K, "cheby", tables=tables)))
def loss_ref(x, kern):
    return jnp.sum(jnp.sin(spmv.graph_conv(lambda z, nt: spmv.chebyshev_basis(jnp.asarray(idx), jnp.asarray(val), z, nt), x, kern, K)))
gx, gw = jax.grad(loss_fused, (0, 1))(x, kern)
gx_r, gw_r = jax.grad(loss_ref, (0, 1))(x, kern)
print("dx max err:", float(jnp.max(jnp.abs(gx - gx_r))))
print("dW max err:", float(jnp.max(jnp.abs(gw - gw_r))), " scale:", float(jnp.max(jnp.abs(gw_r))))
