"""Experiments: alternative formulations of the 128^3 48ch k3 conv."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from microbench import chain_time  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    S, C = 128, 48
    x = jnp.asarray(rng.standard_normal((1, S, S, S, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.05, jnp.bfloat16)
    flops = 2 * S**3 * C * C * 27

    def rate(name, f, args, k=3):
        t = chain_time(f, args, k=k)
        print(f"{name}: {t*1e3:7.2f} ms ({flops/t/1e12:5.1f} Tf/s)")

    def conv_ndhwc(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    rate("xla NDHWC", conv_ndhwc, (x, w))

    xf = jnp.transpose(x, (0, 4, 1, 2, 3))
    wf = jnp.transpose(w, (4, 3, 0, 1, 2))

    def conv_ncdhw(xf, wf):
        return jax.lax.conv_general_dilated(
            xf, wf, (1, 1, 1), "SAME",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))

    rate("xla NCDHW", conv_ncdhw, (xf, wf))

    # shift-matmul: pad once, 27 shifted views each matmul'd and accumulated
    def shift_matmul(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        y = None
        for kd in range(3):
            for kh in range(3):
                for kw in range(3):
                    xs = jax.lax.dynamic_slice(
                        xp, (0, kd, kh, kw, 0), (1, S, S, S, C))
                    t = jnp.einsum("bdhwc,ce->bdhwe", xs, w[kd, kh, kw],
                                   preferred_element_type=jnp.float32)
                    y = t if y is None else y + t
        return y.astype(x.dtype)

    rate("shift-matmul (27x)", shift_matmul, (x, w))

    # shift-matmul with K folded over kw: lhs rows see 3 shifted channel
    # groups -> K=144 per (kd,kh); 9 matmuls
    def shift_matmul_k3(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        wk = jnp.transpose(w, (0, 1, 2, 3, 4)).reshape(27 * C, C)
        y = None
        for kd in range(3):
            for kh in range(3):
                xs = jnp.concatenate(
                    [jax.lax.dynamic_slice(xp, (0, kd, kh, kw, 0),
                                           (1, S, S, S, C))
                     for kw in range(3)], axis=-1)
                wslab = wk[(kd * 9 + kh * 3) * C:(kd * 9 + kh * 3 + 3) * C]
                t = jnp.einsum("bdhwc,ce->bdhwe", xs, wslab,
                               preferred_element_type=jnp.float32)
                y = t if y is None else y + t
        return y.astype(x.dtype)

    rate("shift-matmul K=144 (9x)", shift_matmul_k3, (x, w))


if __name__ == "__main__":
    main()


def extra():
    rng = np.random.default_rng(0)
    S, C = 128, 48
    x = jnp.asarray(rng.standard_normal((1, S, S, S, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.05, jnp.bfloat16)
    flops = 2 * S**3 * C * C * 27

    def rate(name, f, args, k=3):
        t = chain_time(f, args, k=k)
        print(f"{name}: {t*1e3:7.2f} ms ({flops/t/1e12:5.1f} Tf/s)")

    # conv2d batched over D: 3 conv2d calls (batch = D), accumulate
    def conv2d_over_d(x, w):
        xs = x[0]                              # (D, H, W, C) batch=D
        xp = jnp.pad(xs, ((1, 1), (0, 0), (0, 0), (0, 0)))
        y = None
        for kd in range(3):
            t = jax.lax.conv_general_dilated(
                jax.lax.dynamic_slice_in_dim(xp, kd, S, axis=0),
                w[kd], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            y = t if y is None else y + t
        return y[None].astype(x.dtype)

    rate("conv2d-over-D (3x)", conv2d_over_d, (x, w))

    # one conv2d with K folded over kd: input (D, H, W, 3C) via concat
    def conv2d_kfold(x, w):
        xs = x[0]
        xp = jnp.pad(xs, ((1, 1), (0, 0), (0, 0), (0, 0)))
        xcat = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(xp, kd, S, axis=0)
             for kd in range(3)], axis=-1)     # (D, H, W, 3C)
        wcat = jnp.concatenate([w[0], w[1], w[2]], axis=2)  # (3,3,3C,C)
        y = jax.lax.conv_general_dilated(
            xcat, wcat, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[None]

    rate("conv2d K-fold (1x)", conv2d_kfold, (x, w))


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "extra":
    extra()
