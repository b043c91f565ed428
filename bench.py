"""Benchmark entry point (driver contract): prints ONE JSON line.

Headline: BraTS-case sliding-window inference throughput (volumes/sec/chip)
on a synthetic preprocessed-size case (150x180x150, 4 modalities), single
pass (no TTA), roi 128^3 / overlap 0.5 / gaussian blending / sw_batch 1
(batch 1 beats 2 on the 16GB dev chip; the reference's published
1.51 s/case ablation figure is likewise a single sliding-window pass).
``vs_baseline`` compares against that 1.51 s/case
(images/segmamba_ablation.jpg) => 0.662 volumes/sec on the authors' GPU.
The full 8x-mirror-TTA eval protocol (4_predict.py:55-62) is measured
separately by benchmarks/bench_tta.py.

Extra fields (VERDICT r3 items 3 & 7; r4 items 2 & 6):
- ``mfu``: achieved model FLOP/s over the case divided by the chip's peak
  bf16 FLOP/s — model FLOPs from XLA's own cost analysis of the compiled
  128^3 forward, times the number of sliding windows per case.
- ``tta_sec_per_case``: the reference's ACTUAL eval protocol — 8x mirror
  TTA (4_predict.py:55-62, light_training/prediction.py:110-159) — run as
  window-level TTA inside one fused program (infer/sliding_window.py
  ``tta_flips``; exact vs the volume-level form at this bucketed shape,
  whose window grid is mirror-closed).
- ``train_step_sec`` / ``train_mfu``: jitted train step at the reference
  recipe shape (batch 2 x 128^3, bf16, device augmentation on), seconds
  and model-FLOP utilization (XLA-counted FLOPs of the compiled step).
- ``wholevol_sec_per_case``: the framework's own single-shot mode
  (infer/whole_volume.py): ONE forward over the whole preprocessed case
  (padded to 160x192x160, ~2.9M stage-0 tokens) instead of 8 overlapping
  128^3 windows — ~3.4x fewer voxel-forwards, a mode the reference's
  quadratic-attention baselines cannot express. Kept as an extra field
  (not the headline) because it changes the eval protocol; Dice parity
  vs the window path is validated per checkpoint
  (benchmarks/validate_whole_volume.py).
- ``wholevol_tta_sec_per_case``: the reference's full 8x-mirror-TTA
  protocol on the single-shot mode, as ONE compiled program (a
  lax.fori_loop over the 8 flip combos with lax.rev on device,
  infer/whole_volume.py ``whole_volume_tta``) — one dispatch per case.
"""

import json
import time

import numpy as np

BASELINE_VOLS_PER_SEC = 1.0 / 1.51

# peak dense bf16 FLOP/s per chip, by device_kind substring
_PEAK_BF16 = (
    ("v5p", 459e12),
    ("v5 lite", 197e12),  # v5e reports "TPU v5 lite..."
    ("v5e", 197e12),
    ("v6 lite", 918e12),
    ("v6e", 918e12),
    ("v4", 275e12),
)


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _PEAK_BF16:
        if key in kind:
            return peak
    return 197e12


def main():
    import jax
    try:  # persistent compile cache: first driver run pays, reruns are fast
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/segmamba_jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from segmamba_tpu.infer import SlidingWindowInferer
    from segmamba_tpu.models import SegMamba

    model = SegMamba(in_chans=4, out_chans=4, dtype=jnp.bfloat16)
    x128 = jnp.zeros((1, 128, 128, 128, 4), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x128)
    fwd = jax.jit(model.apply)

    def predictor(p, w):
        # params ride as jit args (predictor_args) so the fused window
        # program doesn't inline the weights as MLIR constants
        return fwd(p, w)

    case = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 150, 180, 150, 4)),
        jnp.float32)
    # sw_batch 1 outperforms 2 on the 16GB dev chip (batch-2 windows hit
    # memory pressure); the reference's own training inferer also uses 1
    inferer = SlidingWindowInferer((128, 128, 128), sw_batch_size=1,
                                   overlap=0.5)

    @jax.jit
    def fetch(o):
        return jnp.sum(o)

    import sys

    def run(host_loop, tta=None):
        # in_graph_pad=True: fixed-shape serving mode (one dispatch/case;
        # the bench repeats one case shape, so the per-shape compile is
        # paid once — a varied dataset uses the default host-pad mode)
        from segmamba_tpu.infer.sliding_window import sliding_window_inference
        return float(fetch(sliding_window_inference(
            case, inferer.roi_size, predictor, overlap=inferer.overlap,
            sw_batch_size=inferer.sw_batch_size, num_classes=4,
            host_loop=host_loop, predictor_args=(params,),
            in_graph_pad=None if host_loop else True, tta_flips=tta)))

    # A/B the fused single-program path against the per-group host loop and
    # report whichever is faster on this chip (the fused path removes
    # ~2 dispatches/window but must fit the remote-compile relay)
    sec_by_path = {}
    # host_loop=False = strict fused (no silent fallback), True = host loop
    for path, host_loop in (("fused", False), ("hostloop", True)):
        try:
            run(host_loop)  # compile
        except Exception as e:  # relay cap or compile failure: skip path
            print(f"# {path} path unavailable: {type(e).__name__}",
                  file=sys.stderr)
            continue
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            run(host_loop)
            times.append(time.perf_counter() - t0)
        sec_by_path[path] = min(times)
        print(f"# {path}: {min(times):.3f} s/case", file=sys.stderr)
    sec = min(sec_by_path.values())
    vps = 1.0 / sec

    # --- MFU: XLA-counted FLOPs of the compiled 128^3 forward, scaled by
    # windows/case (the sliding-window grid at 150x180x150, overlap .5,
    # roi 128^3 is 8 windows), over the chip's peak bf16 FLOP/s.
    mfu = None
    try:
        cost = jax.jit(model.apply).lower(params, x128).compile()
        ca = cost.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_fwd = float(ca["flops"])
        from segmamba_tpu.infer.sliding_window import _scan_starts
        n_windows = len(_scan_starts(
            (150, 180, 150), inferer.roi_size, inferer.overlap))
        mfu = (flops_fwd * n_windows / sec) / _peak_flops(jax.devices()[0])
        print(f"# fwd flops={flops_fwd:.3e} windows={n_windows} "
              f"mfu={mfu:.4f}", file=sys.stderr)
    except Exception as e:
        print(f"# mfu unavailable: {type(e).__name__}: {e}", file=sys.stderr)

    # --- the reference's real eval protocol: 8x mirror TTA, window-level
    # (one fused program per case; exact at this mirror-closed grid)
    tta_sec = None
    try:
        run(False, tta=(0, 1, 2))  # compile
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            run(False, tta=(0, 1, 2))
            times.append(time.perf_counter() - t0)
        tta_sec = min(times)
        print(f"# tta8: {tta_sec:.3f} s/case", file=sys.stderr)
    except Exception as e:
        print(f"# tta unavailable: {type(e).__name__}: {e}", file=sys.stderr)

    # --- whole-volume single shot: one forward over the padded case
    wv_sec = None
    try:
        from segmamba_tpu.infer.whole_volume import whole_volume_inference

        def run_wv():
            return float(fetch(whole_volume_inference(
                model, params, case, crop_to_nonzero=False)))

        run_wv()  # compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_wv()
            times.append(time.perf_counter() - t0)
        wv_sec = min(times)
        print(f"# wholevol: {wv_sec:.3f} s/case", file=sys.stderr)
    except Exception as e:
        print(f"# wholevol unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    # --- full 8x mirror TTA on the single-shot mode, one program/case
    wv_tta_sec = None
    try:
        from segmamba_tpu.infer.whole_volume import whole_volume_tta

        def run_wv_tta():
            return float(fetch(whole_volume_tta(
                model, params, case, crop_to_nonzero=False)))

        run_wv_tta()  # compile
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            run_wv_tta()
            times.append(time.perf_counter() - t0)
        wv_tta_sec = min(times)
        print(f"# wholevol tta8: {wv_tta_sec:.3f} s/case", file=sys.stderr)
    except Exception as e:
        print(f"# wholevol tta unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    # --- train step at the reference recipe shape (trainer.py:422-483 hot
    # loop): batch 2 x 128^3 bf16, device augmentation, poly-LR SGD.
    train_step_sec = None
    train_mfu = None
    try:
        from segmamba_tpu.train.train_state import (create_train_state,
                                                    train_step)
        tmodel = SegMamba(in_chans=4, out_chans=4, dtype=jnp.bfloat16,
                          remat="convs")
        tstate = create_train_state(tmodel, jax.random.key(0), x128,
                                    learning_rate=1e-2)
        batch = {
            "image": jnp.zeros((2, 128, 128, 128, 4), jnp.float32),
            "label": jnp.zeros((2, 128, 128, 128), jnp.int32),
        }

        def step(state, key):
            state, metrics = train_step(state, batch, num_classes=4,
                                        augment_key=key)
            return state, metrics["loss"]

        tstate, loss = step(tstate, jax.random.key(1))  # compile
        float(loss)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            tstate, loss = step(tstate, jax.random.key(2 + i))
            float(loss)  # scalar fetch forces completion through the relay
            times.append(time.perf_counter() - t0)
        train_step_sec = min(times)
        print(f"# train_step: {train_step_sec:.3f} s", file=sys.stderr)
        try:
            from segmamba_tpu.train.train_state import _train_step
            lowered = _train_step.lower(tstate, batch, 4, "ce", True,
                                        jax.random.key(9))
            ca = lowered.compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            train_flops = float(ca["flops"])
            train_mfu = (train_flops / train_step_sec
                         / _peak_flops(jax.devices()[0]))
            print(f"# train flops={train_flops:.3e} mfu={train_mfu:.4f}",
                  file=sys.stderr)
        except Exception as e:
            print(f"# train mfu unavailable: {type(e).__name__}: {e}",
                  file=sys.stderr)
    except Exception as e:
        print(f"# train_step unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    out = {
        "metric": "brats_case_sliding_window_inference",
        "value": round(vps, 4),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vps / BASELINE_VOLS_PER_SEC, 3),
    }
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    if tta_sec is not None:
        out["tta_sec_per_case"] = round(tta_sec, 3)
    if wv_sec is not None:
        out["wholevol_sec_per_case"] = round(wv_sec, 3)
    if wv_tta_sec is not None:
        out["wholevol_tta_sec_per_case"] = round(wv_tta_sec, 3)
    if train_step_sec is not None:
        out["train_step_sec"] = round(train_step_sec, 3)
    if train_mfu is not None:
        out["train_mfu"] = round(train_mfu, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
