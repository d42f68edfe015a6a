"""AOT compile check: fused step fwd+bwd at spatial widths under new picks."""
import jax, jax.numpy as jnp
from satflow_tpu.ops.pallas import fused_convlstm_step as m

assert jax.devices()[0].platform == "tpu"

for HW, B in [(512, 1), (1024, 1)]:
    CX = CH = 64
    x = jnp.zeros((B, HW, HW, CX), jnp.bfloat16)
    h = jnp.zeros((B, HW, HW, CH), jnp.bfloat16)
    c = jnp.zeros((B, HW, HW, CH), jnp.bfloat16)
    wx = jnp.zeros((3, 3, CX, 4 * CH), jnp.bfloat16)
    wh = jnp.zeros((3, 3, CH, 4 * CH), jnp.bfloat16)
    b = jnp.zeros((4 * CH,), jnp.bfloat16)
    fp = m._pick_block_h(HW, HW, CX, CH, None, 2)
    print(f"W={HW}: fwd pick={fp}")

    def loss(args):
        hn, cn = m.fused_convlstm_step(*args)
        return jnp.sum(hn.astype(jnp.float32))

    try:
        jax.jit(jax.grad(loss)).lower((x, h, c, wx, wh, b)).compile()
        print(f"W={HW}: fwd+bwd COMPILES")
    except Exception as e:
        print(f"W={HW}: FAILED: {str(e).splitlines()[0][:160]}")
