"""Config system semantics (falsy missing attrs, merge, file loading)."""

from mft_tpu.config import Config, load_config, config_file_from_template
from mft_tpu.utils.misc import parse_scale_WH


def test_missing_attrs_are_falsy():
    c = Config()
    assert not c.foo
    assert not c.foo.bar.baz
    c.x = 5
    assert c.x == 5


def test_cfg_value_missing_vs_falsy():
    """cfg_value must treat ONLY missing (empty Config) / None as missing —
    an explicit 0.0 (e.g. occlusion_threshold=0.0) must survive."""
    from mft_tpu.config import Config, cfg_value
    c = Config()
    assert cfg_value(c.not_set, 0.02) == 0.02
    assert cfg_value(None, 0.02) == 0.02
    c.occlusion_threshold = 0.0
    assert cfg_value(c.occlusion_threshold, 0.02) == 0.0
    c.occlusion_threshold = 0.5
    assert cfg_value(c.occlusion_threshold, 0.02) == 0.5


def test_merge():
    a = Config()
    a.x = 1
    a.y = 2
    b = Config()
    b.y = 3
    b.z = 4
    a.merge(b)
    assert (a.x, a.y, a.z) == (1, 3, 4)


def test_load_config(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text(
        "from mft_tpu.config import Config\n"
        "def get_config():\n"
        "    c = Config()\n"
        "    c.name = 'test'\n"
        "    c.deltas = [1, 2]\n"
        "    return c\n")
    c = load_config(p)
    assert c.name == "test"
    assert c.deltas == [1, 2]


def test_config_template(tmp_path):
    p = tmp_path / "tpl.py"
    p.write_text("x = ___placeholder_val___\n")
    out = config_file_from_template(p, val=42)
    assert out == "x = 42\n"


def test_parse_scale_WH():
    shape = {"W": 854, "H": 480}
    assert parse_scale_WH("fullres", shape) == [shape]
    stages = parse_scale_WH("256x256_512x512", shape)
    assert [(s["W"], s["H"]) for s in stages] == [(256, 256), (512, 512)]
    (s,) = parse_scale_WH("x240", shape)
    assert s["H"] == 240 and s["W"] == round(854 * 240 / 480)
    (s,) = parse_scale_WH("427x", shape)
    assert s["W"] == 427 and s["H"] == round(480 * 427 / 854)
