import os

import pytest

from probav_tpu.config import Config, parse_cfg, BAND_STATS, BAND_OFFSETS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAGSHIP = os.path.join(REPO, "cfg", "p16t9c85r12.cfg")


def test_parse_flagship_types():
    cfg = parse_cfg(FLAGSHIP)
    assert cfg["batch_size"] == 128 and isinstance(cfg["batch_size"], int)
    assert cfg["learning_rate"] == pytest.approx(5e-4)
    assert cfg["optimizer"] == "nadam"
    assert cfg["loss"] == "l1"
    assert cfg["split"] == pytest.approx(0.2)
    assert cfg["num_res_blocks"] == 12
    assert cfg["decay_rate"] == pytest.approx(0.8)
    assert cfg["is_grayscale"] is True
    assert cfg["ckpt"] == [1, 2, 3, 4, 5]
    assert cfg["low_res_patch_thresholds"] == [0.85]
    assert cfg["low_res_threshold"] == pytest.approx(0.3)
    assert cfg["to_flip"] is False and cfg["to_rotate"] is False
    assert cfg["max_shift"] == 6 and cfg["patch_size"] == 16


def test_parse_appends_extension(tmp_path, monkeypatch):
    p = tmp_path / "x.cfg"
    p.write_text("[Train]\nbatch_size=4\n")
    assert parse_cfg(str(p)[:-4])["batch_size"] == 4


def test_unsupported_key_rejected(tmp_path):
    p = tmp_path / "bad.cfg"
    p.write_text("[Train]\nnot_a_key=1\n")
    with pytest.raises(ValueError, match="not_a_key"):
        parse_cfg(str(p))


def test_config_derived():
    cfg = Config.from_file(FLAGSHIP)
    assert cfg.basename == "p16t9c85r12"
    assert cfg.lr_input_size == 22
    assert cfg.hr_patch_size == 48
    assert cfg.ckpt_dir("NIR").endswith(os.path.join("ckpt_p16t9c85r12", "NIR"))
    assert cfg.log_dir("RED").endswith(os.path.join("logs_p16t9c85r12", "RED"))
    assert cfg.out_dir("TEST") == "testout_p16t9c85r12"
    assert cfg.band_stats("NIR") == BAND_STATS["NIR"]
    assert cfg.stage_dir("resolverDir").endswith("resolverDir")


def test_band_constants():
    assert BAND_OFFSETS[("TRAIN", "NIR")] == 594
    assert BAND_OFFSETS[("TEST", "NIR")] == 1306
    assert BAND_OFFSETS[("TEST", "RED")] == 1160
