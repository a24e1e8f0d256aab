"""TF-parity anchors for the LSTM cell and checkpoint import.

The golden outputs below were produced by the actual TensorFlow kernel
(``tf.raw_ops.LSTMBlockCell`` with forget_bias=1.0, use_peephole=False —
the op implementing ``tf.contrib.rnn.BasicLSTMCell``'s math, the cell the
reference stacks in /root/reference/models/lstm/lstm.py:17) on TF 2.21,
then hardcoded as constants so this test needs no TF at runtime.  Inputs
are B=2, T=3, D=3, H=4, zero initial state, generated from
numpy RandomState(7) as x*0.5, w*0.3, b*0.1.

The import test round-trips the same weights through a checkpoint that
uses the reference's TF-1.x variable names
(``rnn/multi_rnn_cell/cell_N/basic_lstm_cell/{kernel,bias}`` — the names
dynamic_rnn over MultiRNNCell(BasicLSTMCell...) creates, which the
reference saves via tf.train.Saver in feeder.py:224-249), renames them
with tools/modify_checkpoint's regex rules, and restores into this
framework's param tree — making the "reference-trained checkpoints are
importable" claim an executed path, not an assertion.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from video_learning_tpu.models import lstm as lstm_mod

X = [[[0.8452628254890442, -0.23296868801116943, 0.016410082578659058],
      [0.2037581354379654, -0.3944615125656128, 0.0010327864438295364],
      [-0.0004451929416973144, -0.8773621320724487, 0.5088289976119995]],
     [[0.30024924874305725, -0.31271448731422424, -0.08577413111925125],
      [0.2526496946811676, -0.1306782066822052, -0.12137454003095627],
      [-0.7266207337379456, 0.2772901654243469, 0.061940453946590424]]]

W = [[0.08233798295259476, -0.45795738697052, 0.4952099323272705,
      0.04630066081881523, -0.11614198982715607, 0.6087217330932617,
      -0.013615810312330723, -0.4352036416530609, -0.12156836688518524,
      -0.6864945292472839, 0.31481897830963135, -0.12494229525327682,
      -0.22276607155799866, 0.3217410743236542, -0.49532270431518555,
      0.1606288105249405],
     [-0.6193244457244873, -0.19864781200885773, -0.36126595735549927,
      0.43859270215034485, 0.5298482775688171, -0.09882412850856781,
      0.2522199749946594, -0.053995922207832336, 0.17041857540607452,
      -0.2258511632680893, -0.5125017762184143, -0.5409296154975891,
      0.11493656039237976, 0.6742785573005676, 0.08082348853349686,
      -0.15738138556480408],
     [0.5736057162284851, 0.07119055837392807, 0.030430195853114128,
      0.07577332109212875, -0.03971315920352936, -0.09284290671348572,
      -0.43048906326293945, 0.1504872441291809, -0.028432637453079224,
      0.35792577266693115, -0.11064554005861282, -0.5719109773635864,
      -0.029883190989494324, 0.5098612308502197, -0.11502694338560104,
      -0.2669570744037628],
     [-0.3580775856971741, -0.31500503420829773, -0.09005811810493469,
      -0.3539946377277374, 0.44929173588752747, -0.08479057252407074,
      0.03259451314806938, 0.43147188425064087, 0.4509955942630768,
      -0.06381989270448685, 0.09959226846694946, 0.22050799429416656,
      -0.057856641709804535, -0.5334038734436035, 0.19641171395778656,
      0.2683057188987732],
     [0.12465078383684158, -0.27706339955329895, -0.05880819633603096,
      -0.17723095417022705, -0.08991336822509766, 0.38906559348106384,
      0.4588738977909088, 0.20082546770572662, 0.16462352871894836,
      0.20298871397972107, -0.003672656137496233, -0.022699039429426193,
      -0.20209357142448425, -0.016760235652327538, 0.6779841184616089,
      0.26071181893348694],
     [-0.10263510793447495, -0.14157800376415253, -0.25934699177742004,
      0.11231110244989395, 0.11746370792388916, -0.43293651938438416,
      0.14590056240558624, -0.17084167897701263, 0.42801639437675476,
      0.047053199261426926, 0.5153190493583679, -0.13743804395198822,
      -0.08639515936374664, 0.08994250744581223, 0.31678450107574463,
      0.16976475715637207],
     [-0.37005719542503357, 0.05487021058797836, 0.006673421710729599,
      -0.12872058153152466, -0.1944315880537033, 0.524273157119751,
      -0.11711595207452774, -0.25377681851387024, 0.19113387167453766,
      0.03918689489364624, -0.022744160145521164, 0.23439054191112518,
      0.14658762514591217, 0.10865700989961624, 0.2892601490020752,
      0.08509092777967453]]

B_ = [-0.06169219687581062, -0.03622822090983391, -0.05209723114967346,
      0.020972205325961113, -0.1077984943985939, -0.18324260413646698,
      0.008815492503345013, -0.13365206122398376, -0.19519780576229095,
      0.03733307868242264, -0.07110532373189926, 0.04961254447698593,
      -0.05308537557721138, -0.11219624429941177, -0.12435175478458405,
      -0.05149272084236145]

# tf.raw_ops.LSTMBlockCell outputs (h per step; final cell state)
H_OUT = [[[-0.07384524494409561, 0.06891966611146927,
           -0.01514856331050396, -0.115114226937294],
          [-0.13744713366031647, 0.034584805369377136,
           -0.026599962264299393, -0.1274735927581787],
          [-0.24167315661907196, -0.01205719169229269,
           -0.11223175376653671, -0.09736710786819458]],
         [[-0.0713907778263092, 0.007816213183104992,
           -0.008788925595581532, -0.061967913061380386],
          [-0.09937734156847, 0.0004446552484296262,
           0.0007004265789873898, -0.10977713763713837],
          [-0.05704749748110771, -0.15878362953662872,
           0.01544177532196045, -0.03068559430539608]]]

C_FINAL = [[-0.5933506488800049, -0.029838740825653076,
            -0.27050623297691345, -0.2070852816104889],
           [-0.10763926059007645, -0.3449368476867676,
            0.028090594336390495, -0.07076624035835266]]

B, T, D, H = 2, 3, 3, 4


def _golden_params():
    return {"cells": [{"w": jnp.asarray(W, jnp.float32),
                       "b": jnp.asarray(B_, jnp.float32)}]}


def test_lstm_matches_tf_blockcell_golden():
    params = _golden_params()
    x = jnp.asarray(X, jnp.float32).reshape(B * T, D)
    out, states = lstm_mod.evaluate_sequence(params, x, H, T)
    assert np.allclose(out, np.asarray(H_OUT), atol=1e-6), \
        np.max(np.abs(np.asarray(out) - np.asarray(H_OUT)))
    assert np.allclose(states[-1][0], np.asarray(C_FINAL), atol=1e-6)
    assert np.allclose(states[-1][1], np.asarray(H_OUT)[:, -1, :],
                       atol=1e-6)


def test_import_tf_named_checkpoint(tmp_path):
    """A checkpoint keyed by the reference's TF variable names imports
    through modify_checkpoint's regex renames and reproduces the TF
    golden outputs."""
    from video_learning_tpu.checkpoint import (restore_checkpoint,
                                               save_checkpoint)
    from video_learning_tpu.tools.modify_checkpoint import modify

    tf_named = str(tmp_path / "tf_named.ckpt")
    save_checkpoint(tf_named, {
        "rnn": {"multi_rnn_cell": {"cell_0": {"basic_lstm_cell": {
            "kernel": np.asarray(W, np.float32),
            "bias": np.asarray(B_, np.float32)}}}},
    })

    mapped = str(tmp_path / "mapped.ckpt")
    modify(tf_named, mapped, regex_renames=[
        (r"rnn/multi_rnn_cell/cell_(\d+)/basic_lstm_cell/kernel",
         r"cells/\1/w"),
        (r"rnn/multi_rnn_cell/cell_(\d+)/basic_lstm_cell/bias",
         r"cells/\1/b"),
    ])

    import jax
    params = lstm_mod.init(jax.random.PRNGKey(0), D, H, 1)
    params = jax.tree_util.tree_map(np.asarray, params)
    params = restore_checkpoint(mapped, params, strict=True)

    x = jnp.asarray(X, jnp.float32).reshape(B * T, D)
    out, _ = lstm_mod.evaluate_sequence(
        {"cells": [{"w": jnp.asarray(params["cells"][0]["w"]),
                    "b": jnp.asarray(params["cells"][0]["b"])}]},
        x, H, T)
    assert np.allclose(out, np.asarray(H_OUT), atol=1e-6)
