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
    for name in ["aiib23_airway", "abdomen_atlas"]:
        spec = importlib.util.spec_from_file_location(
            name, f"/root/repo/examples/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        cfg = mod.get_config()
        assert cfg.model.in_chans == 1
