"""MetNet inference example (reference satflow/examples/metnet_example.py:8-33).

The reference downloads 11 saved input tensors from its v0.0.3 release and runs
``LitMetNet(input_channels=17, sat_channels=13, input_size=64)``, documenting
the I/O geometry: input (B, 7, 17, 256, 256) → output (B, 24, 1, 16, 16) (the
center 1/4 crop at 1/4 resolution). This example reproduces the same geometry
on synthetic inputs (no release artifacts needed) in NHWC layout.

Run: python -m satflow_tpu.examples.metnet_example
"""

import jax
import jax.numpy as jnp

from satflow_tpu.models.metnet import LitMetNet


def main():
    model = LitMetNet(
        input_channels=17,
        sat_channels=13,
        input_size=64,
        output_channels=1,
        hidden_dim=32,
        forecast_steps=24,
    )
    rng = jax.random.PRNGKey(42)
    # NHWC equivalent of the reference's (B, 7, 17, 256, 256) input.
    x = jax.random.uniform(rng, (1, 7, 256, 256, 17), dtype=jnp.float32)
    variables = model.module.init(rng, x)
    y_hat = model.forward(variables, x)
    print(f"input  {x.shape}")
    print(f"output {y_hat.shape}  (expected (1, 24, 16, 16, 1))")
    assert y_hat.shape == (1, 24, 16, 16, 1)


if __name__ == "__main__":
    main()
