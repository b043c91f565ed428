"""Head-to-head: XLA conv vs Pallas P-form k3 conv at the model's decoder
shapes. Forward and forward+backward (training path)."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from microbench import chain_time  # noqa: E402

from segmamba_tpu.ops.conv3d_pallas import conv3d_k3s1  # noqa: E402


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


SHAPES = [
    # (spatial, cin, cout)  — decoder/encoder1 hot shapes
    (128, 48, 48),
    (128, 96, 48),   # decoder2 res block first conv (after concat)
    (128, 4, 48),    # encoder1 first conv
    (64, 96, 96),
    (64, 192, 96),
    (32, 192, 192),
]


def main():
    rng = np.random.default_rng(0)
    for s, cin, cout in SHAPES:
        x = jnp.asarray(rng.standard_normal((1, s, s, s, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.05,
                        jnp.bfloat16)
        flops = 2 * s**3 * cin * cout * 27
        k = 5 if s <= 64 else 3
        tx = chain_time(xla_conv, (x, w), k=k)
        tp = chain_time(conv3d_k3s1, (x, w), k=k)
        print(f"{s}^3 {cin}->{cout}: xla {tx*1e3:7.2f} ms "
              f"({flops/tx/1e12:5.1f} Tf/s) | pallas {tp*1e3:7.2f} ms "
              f"({flops/tp/1e12:5.1f} Tf/s)  [{tx/tp:.2f}x]")

        # training path: value+grad
        def loss_x(x, w):
            return jnp.sum(xla_conv(x, w).astype(jnp.float32))

        def loss_p(x, w):
            return jnp.sum(conv3d_k3s1(x, w).astype(jnp.float32))

        gx = chain_time(jax.grad(loss_x, argnums=(0, 1)), (x, w), k=k)
        gp = chain_time(jax.grad(loss_p, argnums=(0, 1)), (x, w), k=k)
        print(f"      grad: xla {gx*1e3:7.2f} ms | pallas {gp*1e3:7.2f} ms "
              f"[{gx/gp:.2f}x]")


if __name__ == "__main__":
    main()
