"""Config system: YAML merge, --set overrides, validation."""

import numpy as np
import pytest

from mnc_tpu.config import AttrDict, cfg, cfg_from_file, cfg_from_list, get_output_dir


@pytest.fixture(autouse=True)
def restore_cfg():
    saved = cfg.clone()
    yield
    cfg.clear()
    cfg.update(saved)


def test_yaml_merge(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("""
TRAIN:
  RPN_NMS_THRESH: 0.65
  SCALES: [500]
NET:
  N_STAGES: 3
MASK_SIZE: 28
""")
    cfg_from_file(str(p))
    assert cfg.TRAIN.RPN_NMS_THRESH == 0.65
    assert cfg.TRAIN.SCALES == (500,)
    assert cfg.NET.N_STAGES == 3
    assert cfg.MASK_SIZE == 28


def test_yaml_rejects_unknown_key(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("TRAIN:\n  NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        cfg_from_file(str(p))


def test_cfg_from_list():
    cfg_from_list(["TRAIN.LEARNING_RATE", "0.01", "TEST.NMS", "0.4",
                   "NET.TRUNK", "resnet101"])
    assert cfg.TRAIN.LEARNING_RATE == 0.01
    assert cfg.TEST.NMS == 0.4
    assert cfg.NET.TRUNK == "resnet101"


def test_compat_only_mix_index_merges(tmp_path):
    """A reference YAML that sets TRAIN.MIX_INDEX is accepted-but-inert
    (COMPAT_ONLY_KEYS), like GPU_ID — not a merge KeyError (ADVICE r2)."""
    p = tmp_path / "c.yml"
    p.write_text("TRAIN:\n  MIX_INDEX: true\n")
    cfg_from_file(str(p))
    assert cfg.TRAIN.MIX_INDEX is True


def test_static_cap_is_loud():
    """Raising a reference RPN working-set knob past its STATIC budget warns
    (a parity experiment must not silently run the smaller compiled set)."""
    import warnings

    from mnc_tpu.models.mnc import MNCArch

    cfg_from_list(["TEST.RPN_PRE_NMS_TOP_N", "9999",
                   "STATIC.TEST_PRE_NMS_TOP_N", "1024"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        arch = MNCArch.from_cfg(train=False)
    assert arch.pre_nms_top_n <= 1024
    assert any("CAPPED by STATIC.TEST_PRE_NMS_TOP_N" in str(x.message)
               for x in w), [str(x.message) for x in w]

    cfg_from_list(["TEST.RPN_PRE_NMS_TOP_N", "512"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        arch = MNCArch.from_cfg(train=False)
    assert arch.pre_nms_top_n == 512
    assert not any("TEST.RPN_PRE_NMS_TOP_N" in str(x.message) for x in w)


def test_type_coercion_errors():
    with pytest.raises(ValueError):
        cfg_from_list(["TRAIN.LEARNING_RATE", "not_a_number"])


def test_get_output_dir(tmp_path, monkeypatch):
    monkeypatch.setitem(cfg, "ROOT_DIR", str(tmp_path))
    d = get_output_dir("voc_2012_seg_val", "mnc_5stage")
    assert d.endswith("output/default/voc_2012_seg_val/mnc_5stage")
    import os.path as osp

    assert osp.isdir(d)


def test_attrdict_clone_independent():
    a = AttrDict()
    a.X = AttrDict()
    a.X.Y = 1
    b = a.clone()
    b.X.Y = 2
    assert a.X.Y == 1


def test_no_dead_config_keys():
    """Every leaf key must be consumed somewhere outside config.py.

    Catches keys that imply semantics the code doesn't have (round-1 verdict:
    TRAIN.MIX_INDEX / TEST.MASK_MERGE_NMS_THRESH / NET.POOLED_HW were dead).
    Key names shared between trees (TRAIN.SCALES/TEST.SCALES) count once —
    the goal is "no phantom knobs", not exact reader attribution.
    """
    import os.path as osp
    import pathlib

    from mnc_tpu.config import COMPAT_ONLY_KEYS

    root = pathlib.Path(__file__).resolve().parents[1]
    source = ""
    for base in ("mnc_tpu", "tools"):
        for p in (root / base).rglob("*.py"):
            if p.name == "config.py":
                # keys may be consumed inside config.py itself (get_output_dir
                # reads ROOT_DIR/EXP_DIR) — count uses, not definitions
                source += "".join(l for l in p.read_text().splitlines()
                                  if not l.strip().startswith("__C."))
                continue
            source += p.read_text()

    def leaves(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from leaves(v, f"{prefix}{k}.")
            else:
                yield f"{prefix}{k}", k

    dead = [path for path, name in leaves(cfg)
            if name not in source and path not in COMPAT_ONLY_KEYS]
    assert not dead, f"config keys never read outside config.py: {dead}"


def test_shipped_experiment_yamls_load():
    """Every cfg under experiments/cfgs must merge cleanly (key renames/
    deletions in config.py would otherwise break them silently)."""
    import glob
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    ymls = sorted(glob.glob(str(root / "experiments" / "cfgs" / "*.yml")))
    assert ymls, "no experiment cfgs found"
    for f in ymls:
        cfg_from_file(f)
