"""Whole-volume single-shot inference at the REAL BraTS shape.

One forward over a full 155x240x240 case (1.15M tokens at stage 0 after
padding to 160x240x240) — the mode that replaces the reference's sliding
window outright (infer/whole_volume.py, SURVEY.md §7.8). Records wall
time per case vs the sliding-window path on the same volume.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/segmamba_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from segmamba_tpu.infer.whole_volume import whole_volume_inference
    from segmamba_tpu.models import SegMamba

    model = SegMamba(in_chans=4, out_chans=4, dtype=jnp.bfloat16)
    x128 = jnp.zeros((1, 128, 128, 128, 4), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x128)

    # realistic skull-stripped case: brain-shaped nonzero support (~the
    # extent of a real BraTS brain) inside the 155x240x240 scanner frame
    rng = np.random.default_rng(0)
    case_np = rng.standard_normal((1, 155, 240, 240, 4)).astype(np.float32)
    zz, yy, xx = np.meshgrid(np.arange(155), np.arange(240), np.arange(240),
                             indexing="ij")
    brain = (((zz - 77) / 70.0) ** 2 + ((yy - 120) / 88.0) ** 2
             + ((xx - 120) / 72.0) ** 2) <= 1.0
    case_np *= brain[None, ..., None]
    case = jnp.asarray(case_np)

    @jax.jit
    def fetch(o):
        return jnp.sum(o)

    result = {"metric": "brats_case_whole_volume_single_shot",
              "shape": [155, 240, 240]}
    for name, crop in [("cropped", True), ("full_frame", False)]:
        t0 = time.perf_counter()
        out = whole_volume_inference(model, params, case,
                                     crop_to_nonzero=crop)
        float(fetch(out))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fetch(whole_volume_inference(model, params, case,
                                               crop_to_nonzero=crop)))
            times.append(time.perf_counter() - t0)
        result[f"sec_per_case_{name}"] = round(min(times), 3)
        result[f"first_call_incl_compile_s_{name}"] = round(compile_s, 1)
    result["out_shape"] = list(out.shape)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
