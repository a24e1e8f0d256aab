"""Tests for the pipeline DAG builder (Model): composition semantics of
the reference's models/model.py expressed over stub datasets."""

import jax
import numpy as np
import pytest

from video_learning_tpu.config import Network, Settings, TrainOpts
from video_learning_tpu.defs import defs
from video_learning_tpu.models.pipeline import Model


class StubDataset:
    def __init__(self, tag, shape, cpv, fpc):
        self.tag = tag
        self._shape = shape
        self.clips_per_video = cpv
        self.num_frames_per_clip = fpc
        self.embedding_matrix = None
        self.vocabulary = None
        self.max_sequence_length = None

    def get_image_shape(self):
        return self._shape

    def get_embedding_dim(self):
        return int(self.embedding_matrix.shape[-1])


class StubFeeder:
    def __init__(self, datasets):
        self._datasets = datasets

    def get_dataset_by_tag(self, tag):
        return [d for d in self._datasets if d.tag == tag]


def _settings(pipelines, names, datasets, num_classes=4):
    s = Settings()
    s.num_classes = num_classes
    s.pipelines = pipelines
    s.pipeline_names = names
    s.feeder = StubFeeder(datasets)
    s.train = TrainOpts()
    s.phase = defs.phase.train
    s.phases = [defs.phase.train]
    s.compute_dtype = "float32"
    return s


def _net(**kw):
    n = Network()
    n.input = kw.get("input")
    n.input_shape = kw.get("input_shape", [None])
    n.input_fusion = kw.get("input_fusion")
    n.representation = kw.get("representation", defs.representation.nop)
    n.frame_encoding_layer = kw.get("frame_encoding_layer")
    n.fc_output_dim = kw.get("fc_output_dim")
    n.classifier = kw.get("classifier")
    n.lstm_params = kw.get("lstm_params")
    n.weights_file = None
    n.frame_fusion = kw.get("frame_fusion")
    return n


def test_fc_vector_pipeline():
    """vectors -> FC repr -> FC classifier."""
    ds = StubDataset("main", (16,), 1, 1)
    net = _net(input=["main"], representation=defs.representation.fc,
               fc_output_dim=8, classifier=defs.classifier.fc)
    s = _settings({"p": net}, ["p"], [ds])
    m = Model(s)
    params = m.init_params(jax.random.PRNGKey(0))
    feed = {"p_main_input": np.random.randn(6, 16).astype(np.float32)}
    logits = m.apply(params, feed)
    assert logits.shape == (6, 4)
    assert ("p_main_input", "visual", "main") in m.required_input


def test_lstm_classifier_pipeline():
    """video frames (fpc=4) -> NOP -> LSTM avg classifier."""
    ds = StubDataset("main", (16,), 2, 4)
    net = _net(input=["main"], representation=defs.representation.nop,
               classifier=defs.classifier.lstm,
               lstm_params=[12, 2, defs.fusion_method.avg])
    s = _settings({"p": net}, ["p"], [ds])
    m = Model(s)
    params = m.init_params(jax.random.PRNGKey(0))
    # 3 clips x 4 fpc
    feed = {"p_main_input": np.random.randn(12, 16).astype(np.float32)}
    logits = m.apply(params, feed)
    assert logits.shape == (3, 4)
    reg, mod = m.param_groups()
    assert any("lstm" in x for x in mod)


def test_lstm_state_fusion_pipeline():
    ds = StubDataset("main", (16,), 1, 4)
    net = _net(input=["main"], classifier=defs.classifier.lstm,
               lstm_params=[12, 2, defs.fusion_method.state])
    s = _settings({"p": net}, ["p"], [ds])
    m = Model(s)
    params = m.init_params(jax.random.PRNGKey(0))
    feed = {"p_main_input": np.random.randn(8, 16).astype(np.float32)}
    logits = m.apply(params, feed)
    assert logits.shape == (2, 4)  # state -> convert_dim fc


def test_early_fusion_then_fc():
    ds = StubDataset("main", (16,), 1, 4)
    net = _net(input=["main"], representation=defs.representation.fc,
               fc_output_dim=8, classifier=defs.classifier.fc,
               frame_fusion=[defs.fusion_type.early,
                             defs.fusion_method.avg])
    s = _settings({"p": net}, ["p"], [ds])
    m = Model(s)
    params = m.init_params(jax.random.PRNGKey(0))
    feed = {"p_main_input": np.random.randn(8, 16).astype(np.float32)}
    logits = m.apply(params, feed)
    assert logits.shape == (2, 4)  # 8 frames / fpc 4 = 2 items


def test_late_fusion_fc():
    ds = StubDataset("main", (16,), 1, 4)
    net = _net(input=["main"], representation=defs.representation.fc,
               fc_output_dim=4, classifier=defs.classifier.fc,
               frame_fusion=[defs.fusion_type.late, defs.fusion_method.avg])
    s = _settings({"p": net}, ["p"], [ds])
    m = Model(s)
    params = m.init_params(jax.random.PRNGKey(0))
    feed = {"p_main_input": np.random.randn(8, 16).astype(np.float32)}
    logits = m.apply(params, feed)
    assert logits.shape == (2, 4)


def test_two_pipeline_dag_encoder_decoder():
    """pipeline1 encodes frames to vectors; pipeline2 consumes its output
    plus an aux pipeline output as LSTM initial state."""
    main = StubDataset("main", (16,), 1, 4)
    aux = StubDataset("aux", (10,), 1, 1)
    enc = _net(input=["main"], representation=defs.representation.fc,
               fc_output_dim=8)
    aux_enc = _net(input=["aux"], representation=defs.representation.fc,
                   fc_output_dim=6)
    dec = _net(input=["enc", "auxenc"],
               representation=defs.representation.nop,
               classifier=defs.classifier.lstm,
               lstm_params=[12, 1, defs.fusion_method.last])
    s = _settings({"enc": enc, "auxenc": aux_enc, "dec": dec},
                  ["enc", "auxenc", "dec"], [main, aux])
    m = Model(s)
    params = m.init_params(jax.random.PRNGKey(0))
    feed = {"enc_main_input": np.random.randn(8, 16).astype(np.float32),
            "auxenc_aux_input": np.random.randn(2, 10).astype(np.float32)}
    logits = m.apply(params, feed)
    assert logits.shape == (2, 4)


def test_input_fusion_ibias_pipeline():
    """two-branch composition fused with ibias then LSTM
    (config.example.yml:39-57 pattern)."""
    main = StubDataset("main", (8,), 1, 4)
    aux = StubDataset("aux", (8,), 1, 1)
    frames = _net(input=["main"], representation=defs.representation.fc,
                  fc_output_dim=8)
    spect = _net(input=["aux"], representation=defs.representation.fc,
                 fc_output_dim=8)
    comb = _net(input=["frames", "spectros"],
                representation=defs.representation.nop,
                input_fusion=defs.fusion_method.ibias,
                classifier=defs.classifier.lstm,
                lstm_params=[12, 1, defs.fusion_method.avg])
    s = _settings({"frames": frames, "spectros": spect, "ibias": comb},
                  ["frames", "spectros", "ibias"], [main, aux])
    m = Model(s)
    params = m.init_params(jax.random.PRNGKey(0))
    feed = {"frames_main_input": np.random.randn(8, 8).astype(np.float32),
            "spectros_aux_input": np.random.randn(2, 8).astype(np.float32)}
    logits = m.apply(params, feed)
    assert logits.shape == (2, 4)


def test_dcnn_pipeline_end_to_end_small():
    ds = StubDataset("main", (67, 67, 3), 1, 1)
    net = _net(input=["main"], representation=defs.representation.dcnn,
               frame_encoding_layer="fc6", classifier=defs.classifier.fc)
    s = _settings({"p": net}, ["p"], [ds])
    m = Model(s)
    params = m.init_params(jax.random.PRNGKey(0))
    feed = {"p_main_input":
            np.random.randn(2, 67, 67, 3).astype(np.float32)}
    logits = m.apply(params, feed)
    assert logits.shape == (2, 4)
    reg, mod = m.param_groups()
    assert any("conv1" in r for r in reg)


def test_example_feed_roundtrip():
    ds = StubDataset("main", (16,), 2, 4)
    net = _net(input=["main"], classifier=defs.classifier.lstm,
               lstm_params=[12, 1, defs.fusion_method.avg])
    s = _settings({"p": net}, ["p"], [ds])
    m = Model(s)
    params = m.init_params(jax.random.PRNGKey(0))
    feed = m.example_feed(batch_items=2)
    logits = m.apply(params, feed)
    assert logits.shape[0] == feed["labels"].shape[0]


def test_vectorizer_wrappers_direct():
    """The vectorizer strategy objects as library API
    (reference vectorizer.py:7-78): init/apply/output_dim/groups."""
    import jax.numpy as jnp
    from video_learning_tpu.models import vectorizer
    from video_learning_tpu.utils import FrameworkError

    rng = jax.random.PRNGKey(0)
    nop = vectorizer.NOP()
    x = jnp.asarray(np.random.randn(4, 16), jnp.float32)
    assert nop.init(rng, (16,)) is None
    assert nop.apply(None, x) is x
    assert nop.output_dim(16) == 16

    fc = vectorizer.FC(8)
    p = fc.init(rng, (16,))
    out = fc.apply(p, x)
    assert out.shape == (4, 8)
    assert fc.output_dim(16) == 8
    assert fc.train_modified == [""] and fc.train_regular == []
    with pytest.raises(FrameworkError):
        fc.apply(p, x[0])  # rank check

    dc = vectorizer.DCNN(num_classes=4, frame_encoding_layer="fc6")
    p = dc.init(rng, (67, 67, 3))
    frames = jnp.asarray(np.random.randn(2, 67, 67, 3), jnp.float32)
    out = dc.apply(p, frames)
    assert out.shape == (2, dc.output_dim(3))
    # two-tier groups: fc8 absent under fc6 truncation, convs regular
    assert "conv1" in dc.train_regular and "fc8" not in dc.train_modified

    lv = vectorizer.LSTM(num_hidden=8, num_layers=1, sequence_len=3)
    p = lv.init(rng, (16,))
    seq = jnp.asarray(np.random.randn(2 * 3, 16), jnp.float32)
    outs, states = lv.apply(p, seq)
    assert outs.shape == (2, 3, 8)
    assert lv.output_dim(16) == 8


def test_pipeline_dispatches_through_vectorizer(monkeypatch):
    """models/pipeline.py must run representations via the vectorizer
    wrappers (one code path, VERDICT round-2 §2.8)."""
    from video_learning_tpu.models import vectorizer

    calls = []
    orig = vectorizer.FC.apply

    def spy(self, params, x, compute_dtype=None, quant=None):
        calls.append(self.name)
        return orig(self, params, x, compute_dtype, quant)

    monkeypatch.setattr(vectorizer.FC, "apply", spy)
    ds = StubDataset("main", (16,), 1, 1)
    net = _net(input=["main"], representation=defs.representation.fc,
               fc_output_dim=8, classifier=defs.classifier.fc)
    s = _settings({"p": net}, ["p"], [ds])
    m = Model(s)
    assert m.specs[0]["vectorizer"].name == "FC"
    params = m.init_params(jax.random.PRNGKey(0))
    feed = {"p_main_input": np.random.randn(6, 16).astype(np.float32)}
    logits = m.apply(params, feed)
    assert logits.shape == (6, 4)
    assert calls == ["FC"]
