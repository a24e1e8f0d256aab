"""The shipped config.example.yml must parse through Settings (with paths
substituted) — guarding the public config contract."""

import os

import yaml

from video_learning_tpu.config import Settings
from video_learning_tpu.defs import defs


def test_config_example_parses(tmp_path):
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "config.example.yml")) as f:
        docs = yaml.safe_load(f)
    run = docs["run"]
    run["run_folder"] = str(tmp_path / "run")
    # drop the aux branch (no aux dataset paths in the example test) and
    # point the main datasets at stub paths
    run["network"]["pipelines"] = [
        p for p in run["network"]["pipelines"]
        if list(p)[0] not in ("spectros", "ibias")]
    run["network"]["pipelines"].append(
        {"clf": {"input": "frames",
                 "representation": "defs.representation.nop",
                 "classifier": "defs.classifier.lstm",
                 "lstm_params": [64, 2, "defs.fusion_method.avg"]}})
    for p in run["network"]["pipelines"]:
        for spec in p.values():
            spec.pop("weights_file", None)
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump({"run": run}))
    s = Settings()
    s.initialize_from_file(str(cfg_path))
    assert s.num_classes == 20
    assert s.train.optimizer == defs.optim.sgd
    assert s.train.lr_decay == ["exp", "drops", 100, 0.96]
    assert s.val is None  # only the active phase's block is parsed
    assert s.captioning.caption_search == "max"
    assert s.captioning.beam_width == 4
    assert s.mesh_shape == {"data": 1, "model": 1}
    assert s.compute_dtype == "bfloat16"
    dsets = s.feeder.datasets["train"]
    assert dsets[0].raw_image_shape == (240, 320, 3)
    assert "rand_crop" in dsets[0].imgproc


def test_val_quantize_validation(tmp_path):
    """val.quantize accepts only 'int8'; typos must fail at parse time,
    not silently run unquantized."""
    import pytest
    from video_learning_tpu.utils import FrameworkError
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "config.example.yml")) as f:
        docs = yaml.safe_load(f)
    run = docs["run"]
    run["run_folder"] = str(tmp_path / "run")
    run["network"]["pipelines"] = [
        p for p in run["network"]["pipelines"]
        if list(p)[0] not in ("spectros", "ibias")]
    for p in run["network"]["pipelines"]:
        for spec in p.values():
            spec.pop("weights_file", None)
    run["phase"] = "defs.phase.val"
    for d in run["data"].values():
        d["phase"] = "defs.phase.val"
    run["val"] = {"batch_size": 2, "quantize": "int4"}
    cfg_path = tmp_path / "cfg_q.yml"
    cfg_path.write_text(yaml.safe_dump({"run": run}))
    s = Settings()
    with pytest.raises(FrameworkError, match="quantize"):
        s.initialize_from_file(str(cfg_path))
    # valid values parse
    for mode in ("int8", "int8_static"):
        run["val"]["quantize"] = mode
        cfg_path.write_text(yaml.safe_dump({"run": run}))
        s2 = Settings()
        s2.initialize_from_file(str(cfg_path))
        assert s2.val.quantize == mode


def test_serialize_example_section_parses(tmp_path):
    from video_learning_tpu.data.serialize import SerializationSettings
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "config.example.yml")) as f:
        docs = yaml.safe_load(f)
    docs["serialize"]["input_files"] = [str(tmp_path / "x.txt")]
    docs["serialize"]["output_folder"] = str(tmp_path)
    cfg_path = tmp_path / "ser.yml"
    cfg_path.write_text(yaml.safe_dump(
        {"serialize": docs["serialize"]}))
    s = SerializationSettings()
    s.initialize_from_file(["x", str(cfg_path)])
    assert s.num_frames_per_clip == 16
    assert s.clipframe_mode == defs.clipframe_mode.rand_clips
    assert s.seed == 42.0
