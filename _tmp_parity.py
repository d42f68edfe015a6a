import jax, jax.numpy as jnp
from satflow_tpu.ops.pallas import fused_convlstm_step as m

assert jax.devices()[0].platform == "tpu"
B, HW, CX, CH = 2, 256, 64, 64
k = iter(jax.random.split(jax.random.PRNGKey(0), 12))
x = jax.random.uniform(next(k), (B, HW, HW, CX), dtype=jnp.float32) - 0.5
h = jax.random.uniform(next(k), (B, HW, HW, CH), dtype=jnp.float32) - 0.5
c = jax.random.uniform(next(k), (B, HW, HW, CH), dtype=jnp.float32) - 0.5
wx = jax.random.normal(next(k), (3, 3, CX, 4*CH)) * 0.05
wh = jax.random.normal(next(k), (3, 3, CH, 4*CH)) * 0.05
b = jax.random.normal(next(k), (4*CH,)) * 0.05

print("fwd pick @256 f32:", m._pick_block_h(HW, HW, CX, CH, None, 4),
      " bf16:", m._pick_block_h(HW, HW, CX, CH, None, 2))

hr, cr = jax.jit(m._step_ref)(x, h, c, wx, wh, b)
hp_, cp_ = jax.jit(m._step_pallas)(x, h, c, wx, wh, b)
print("fwd max|dh|", float(jnp.max(jnp.abs(hr - hp_))),
      "max|dc|", float(jnp.max(jnp.abs(cr - cp_))))

def loss_fused(args):
    hn, cn = m.fused_convlstm_step(*args)
    return jnp.sum(hn * 1.7 + cn * 0.3)
def loss_ref(args):
    hn, cn = m._step_ref(*args)
    return jnp.sum(hn * 1.7 + cn * 0.3)
args = (x, h, c, wx, wh, b)
gf = jax.jit(jax.grad(loss_fused))(args)
gr = jax.jit(jax.grad(loss_ref))(args)
for name, (u, v) in zip(["x","h","c","wx","wh","b"], zip(gf, gr)):
    print("grad", name, "max abs diff", float(jnp.max(jnp.abs(u - v))),
          " ref scale", float(jnp.max(jnp.abs(v))))
