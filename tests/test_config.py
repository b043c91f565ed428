"""Config system roundtrip + model construction."""

import jax.numpy as jnp

from segmamba_tpu.config import Config, ModelConfig


def test_roundtrip(tmp_path):
    cfg = Config(model=ModelConfig(in_chans=1, out_chans=2,
                                   feat_size=(4, 8, 16, 32)))
    p = tmp_path / "cfg.json"
    cfg.to_json(str(p))
    back = Config.from_json(str(p))
    assert back.model.in_chans == 1
    assert tuple(back.model.feat_size) == (4, 8, 16, 32)
    assert back.train.learning_rate == cfg.train.learning_rate


def test_build_model():
    cfg = Config(model=ModelConfig(in_chans=2, out_chans=3,
                                   feat_size=(4, 8, 16, 32), hidden_size=64,
                                   num_slices_list=(8, 4, 2, 1),
                                   dtype="float32"))
    m = cfg.build_model()
    assert m.in_chans == 2 and m.dtype == jnp.float32


def test_examples_importable():
    import importlib.util
    for name in ["aiib23_airway", "abdomen_atlas", "liver2017_ct"]:
        spec = importlib.util.spec_from_file_location(
            name, f"/root/repo/examples/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        cfg = mod.get_config()
        assert cfg.model.in_chans == 1


def test_ct_znorm_from_plan_stats():
    """CTNormalization semantics: plan percentile clip + dataset z-score
    (default_normalization_schemes.py:82-94)."""
    import numpy as np

    from segmamba_tpu.data.planning import ct_norm_params_from_plan
    from segmamba_tpu.data.preprocessing import ct_znorm_from_stats

    plan = {"intensity_statistics_per_channel": {"0": {
        "percentile_00_5": -17.0, "percentile_99_5": 201.0,
        "mean": 99.0, "std": 39.0}}}
    params = ct_norm_params_from_plan(plan)
    img = np.array([-500.0, -17.0, 99.0, 201.0, 3000.0], np.float32)
    out = ct_znorm_from_stats(img, **params)
    exp = (np.clip(img, -17.0, 201.0) - 99.0) / 39.0
    np.testing.assert_allclose(out, exp, rtol=1e-6)
    assert out[0] == out[1] and out[3] == out[4]  # clipped ends
