"""LSTM temporal model: scan-based sequence evaluation + greedy decode.

TPU-native counterpart of /root/reference/models/lstm/lstm.py.  The
reference evaluates sequences with ``tf.nn.dynamic_rnn`` over stacked
``BasicLSTMCell``s (lstm.py:9-20,102-143) and generates captions with
per-batch-item, per-step unrolled python loops (lstm.py:379-460,630-724).
Here:

* the cell math is BasicLSTMCell-compatible (gate order i,j,f,o;
  forget_bias=1.0; c' = c*sig(f+1) + sig(i)*tanh(j); h' = tanh(c')*sig(o))
  so reference-trained checkpoints are importable,
* the input projection x@Wx for ALL timesteps is hoisted out of the
  recurrence into one large (B*T, 4H) MXU matmul; the ``lax.scan`` carries
  only the small h@Wh recurrence — the classic TPU LSTM layout,
* per-sequence lengths are handled with masks inside the scan (outputs
  zeroed and state frozen past each sequence's length, matching
  dynamic_rnn semantics),
* greedy feedback decoding is one batched scan over time (argmax ->
  embedding gather feedback), replacing the reference's unrolled loops;
  all three visual conditioning modes are supported: state_bias /
  input_bias / input_concat (lstm.py:171-233).
"""

import jax
import jax.numpy as jnp

from video_learning_tpu.defs import defs
from video_learning_tpu.models.layers import truncated_normal
from video_learning_tpu.utils import error


# ---------------------------------------------------------------- params
def init(rng, input_dim, num_hidden, num_layers):
    """Parameter tree: per layer one fused kernel w: (D_l + H, 4H) and
    bias b: (4H,), matching TF BasicLSTMCell's variable layout."""
    layers = []
    keys = jax.random.split(rng, num_layers)
    for l in range(num_layers):
        d = input_dim if l == 0 else num_hidden
        layers.append({
            "w": truncated_normal(keys[l], (d + num_hidden, 4 * num_hidden),
                                  stddev=0.05),
            "b": jnp.zeros((4 * num_hidden,), jnp.float32),
        })
    return {"cells": layers}


def zero_state(batch_size, num_hidden, num_layers):
    z = jnp.zeros((batch_size, num_hidden), jnp.float32)
    return [(z, z) for _ in range(num_layers)]


def state_from_vector(vec, num_layers):
    """Replicate a (B, H) vector into (c, h) pairs for every layer —
    the reference's get_state_tuple (lstm.py:34-42) uses the same vector
    for both c and h."""
    return [(vec, vec) for _ in range(num_layers)]


# ------------------------------------------------------------------ cell
def _cell_step(wh, b, xproj, h, c):
    """One BasicLSTMCell step given the precomputed input projection.
    xproj: (B, 4H) = x @ Wx;  wh: (H, 4H)."""
    gates = xproj + jnp.dot(h, wh, preferred_element_type=jnp.float32) + b
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    new_c = c * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    return new_h, new_c


def _split_kernel(layer_params, input_dim):
    w = layer_params["w"]
    return w[:input_dim, :], w[input_dim:, :]


# ------------------------------------------------------------- evaluation
def evaluate_sequence(params, x, num_hidden, sequence_len, lengths=None,
                      init_state=None, compute_dtype=None):
    """Run the stacked LSTM over a (N*T, D) input laid out frames-first
    (reference evaluate_sequence, lstm.py:102-143).

    lengths: optional (N,) int32 per-sequence valid lengths.
    init_state: optional (N, H) vector used as every layer's (c, h).
    Returns (outputs (N, T, H), final_states list[(c, h)]).
    """
    input_dim = x.shape[-1]
    num_layers = len(params["cells"])
    x = x.reshape(-1, sequence_len, input_dim)
    batch = x.shape[0]

    if init_state is not None:
        if init_state.ndim == 1:
            init_state = init_state[None, :]
        states = state_from_vector(init_state, num_layers)
    else:
        states = zero_state(batch, num_hidden, num_layers)

    if lengths is not None:
        # (T, N, 1) validity mask
        t_idx = jnp.arange(sequence_len)[:, None]
        mask_t = (t_idx < lengths[None, :]).astype(jnp.float32)[..., None]
    else:
        mask_t = None

    seq = x
    final_states = []
    for l, layer in enumerate(params["cells"]):
        d = seq.shape[-1]
        wx, wh = _split_kernel(layer, d)
        b = layer["b"]
        if compute_dtype is not None:
            mm_in = seq.astype(compute_dtype)
            wx = wx.astype(compute_dtype)
        else:
            mm_in = seq
        # hoisted input projection: one big MXU matmul over all timesteps
        xproj = jnp.einsum("btd,dk->btk", mm_in, wx,
                           preferred_element_type=jnp.float32)
        xproj_t = jnp.swapaxes(xproj, 0, 1)  # (T, B, 4H)
        c0, h0 = states[l][0], states[l][1]

        def step(carry, inp):
            c, h = carry
            if mask_t is not None:
                xp, m = inp
            else:
                xp, m = inp, None
            new_h, new_c = _cell_step(wh, b, xp, h, c)
            if m is not None:
                new_h = jnp.where(m > 0, new_h, h)
                new_c = jnp.where(m > 0, new_c, c)
                out = new_h * m  # dynamic_rnn zeroes outputs past length
            else:
                out = new_h
            return (new_c, new_h), out

        xs = (xproj_t, mask_t) if mask_t is not None else xproj_t
        (cF, hF), outs = jax.lax.scan(step, (c0, h0), xs)
        seq = jnp.swapaxes(outs, 0, 1)  # (B, T, H)
        final_states.append((cF, hF))
    return seq, final_states


# ----------------------------------------------------------- greedy decode
def greedy_decode(params, out_fc_params, visual, embedding_matrix,
                  bos_index, sequence_len, num_hidden, visual_mode,
                  state_fc_params=None, return_type=None):
    """Batched greedy caption decoding (replaces the reference's unrolled
    per-item loops, lstm.py:379-460,630-724).

    visual: (B, Dv) visual encodings (may be None for unconditioned runs).
    visual_mode: defs.rnn_visual_mode.{state_bias,input_bias,input_concat}.
    state_fc_params: optional FC mapping visual -> H for state_bias
      (lstm.py:552-564).
    return_type: defs.return_type.argmax_index (default) returns (B, T)
      int32 word indices; defs.return_type.standard additionally returns
      the per-step output logits (B, T, V).  Note: the reference's
      'standard' mode accumulates the argmax words' EMBEDDINGS plus
      states (lstm.py:183-191,242-253); logits are returned here instead
      as the strictly more informative quantity — embeddings are
      recoverable as embedding_matrix[argmax(logits, -1)].  For
      input_bias the first emitted step (from the visual input) is
      dropped, matching lstm.py:245-252.
    """
    if return_type is None:
        return_type = defs.return_type.argmax_index
    if return_type not in defs.return_type:
        # the reference errors on undefined return types (lstm.py:192-193)
        error("Undefined lstm return type [%s]" % return_type)
    want_logits = return_type == defs.return_type.standard
    from video_learning_tpu.models.layers import fc_apply

    num_layers = len(params["cells"])
    emb = embedding_matrix
    emb_dim = emb.shape[1]
    bos_vec = emb[bos_index][None, :]

    if visual is not None and visual_mode == defs.rnn_visual_mode.state_bias \
            and state_fc_params is not None:
        visual = fc_apply(state_fc_params, visual)

    batch = visual.shape[0] if visual is not None else 1

    if visual is not None and visual_mode == defs.rnn_visual_mode.state_bias:
        states = state_from_vector(visual, num_layers)
    else:
        states = zero_state(batch, num_hidden, num_layers)

    steps = sequence_len + 1 if visual_mode == defs.rnn_visual_mode.input_bias \
        else sequence_len

    def stack_states(states):
        return (jnp.stack([s[0] for s in states]),
                jnp.stack([s[1] for s in states]))

    def unstack_states(cs, hs):
        return [(cs[l], hs[l]) for l in range(num_layers)]

    def cell_forward(x, states):
        seq_in = x
        new_states = []
        for l, layer in enumerate(params["cells"]):
            d = seq_in.shape[-1]
            wx, wh = _split_kernel(layer, d)
            xproj = jnp.dot(seq_in, wx, preferred_element_type=jnp.float32)
            h, c = states[l][1], states[l][0]
            new_h, new_c = _cell_step(wh, layer["b"], xproj, h, c)
            new_states.append((new_c, new_h))
            seq_in = new_h
        return seq_in, new_states

    def step(carry, t):
        cs, hs, word_vec = carry
        states = unstack_states(cs, hs)
        if visual_mode == defs.rnn_visual_mode.input_concat:
            x = jnp.concatenate([word_vec, visual], axis=1)
        elif visual_mode == defs.rnn_visual_mode.input_bias:
            # t=0 feeds the visual vector, t=1 the BOS, then feedback
            x = jnp.where(t == 0, _pad_to(visual, word_vec.shape[-1]),
                          jnp.where(t == 1,
                                    jnp.broadcast_to(bos_vec,
                                                     word_vec.shape),
                                    word_vec))
        else:  # state_bias: plain word inputs
            x = word_vec
        out, new_states = cell_forward(x, states)
        logits = fc_apply(out_fc_params, out)
        word_index = jnp.argmax(logits, axis=1)
        new_word_vec = emb[word_index]
        ncs, nhs = stack_states(new_states)
        emit = (word_index, logits) if want_logits else word_index
        return (ncs, nhs, new_word_vec), emit

    cs0, hs0 = stack_states(states)
    word0 = jnp.broadcast_to(bos_vec, (batch, emb_dim))
    (_, _, _), emitted = jax.lax.scan(
        step, (cs0, hs0, word0), jnp.arange(steps))
    indices, logits = emitted if want_logits else (emitted, None)
    indices = jnp.swapaxes(indices, 0, 1)    # (B, steps)
    if visual_mode == defs.rnn_visual_mode.input_bias:
        indices = indices[:, 1:]
    if want_logits:
        logits = jnp.swapaxes(logits, 0, 1)  # (B, steps, V)
        if visual_mode == defs.rnn_visual_mode.input_bias:
            logits = logits[:, 1:]
        return indices, logits
    return indices


def _pad_to(x, dim):
    """Zero-pad the trailing dim (input_bias feeds the visual vector
    through the word-embedding input slot, lstm.py:225-231).  A WIDER
    visual is an error — the reference's ibias concat fails loudly on
    mismatched dims (tf_util.py:153-176) and the pipeline builder
    projects the visual to the embedding dim (state_fc); silently
    truncating conditioning information would degrade decode quality
    with no signal."""
    cur = x.shape[-1]
    if cur == dim:
        return x
    if cur > dim:
        error("input_bias visual dim %d exceeds the embedding dim %d; "
              "project the visual down first (pipeline state_fc)"
              % (cur, dim))
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, dim - cur)])


# ------------------------------------------------------------- beam search
def beam_decode(params, out_fc_params, visual, embedding_matrix, bos_index,
                eos_index, sequence_len, num_hidden, visual_mode,
                beam_width=4, length_norm=0.0):
    """Batched beam-search caption decoding — a TPU-native extension
    beyond the reference's greedy-only search (defs.caption_search.max is
    the reference's sole mode, defs_.py:97-98).

    One `lax.scan` over time; per step all B*K beams run through the cell
    as one batch, `top_k` over (K * V) continuation scores selects the
    next beams, and states/tokens gather along the beam axis.  Finished
    beams (emitted EOS) are frozen: only an EOS continuation with
    unchanged score is allowed.

    visual: (B, D) visual conditioning; all three rnn_visual_mode
    conditioning strategies are supported (state_bias / input_concat /
    input_bias), mirroring greedy_decode.
    Returns (B, sequence_len) int32 tokens of each batch item's best beam.
    """
    from video_learning_tpu.models.layers import fc_apply

    num_layers = len(params["cells"])
    emb = embedding_matrix
    V = emb.shape[0]
    B = visual.shape[0]
    K = beam_width
    NEG = -1e9

    def expand(x):  # (B, ...) -> (B*K, ...)
        return jnp.repeat(x, K, axis=0)

    if visual_mode == defs.rnn_visual_mode.state_bias:
        states = state_from_vector(expand(visual), num_layers)
        vis_k = None
    elif visual_mode == defs.rnn_visual_mode.input_concat:
        states = zero_state(B * K, num_hidden, num_layers)
        vis_k = expand(visual)
    elif visual_mode == defs.rnn_visual_mode.input_bias:
        # conditioning is applied by a pre-roll below (the visual vector
        # fed once through the embedding input slot, lstm.py:732-810);
        # its emission is never scored, matching greedy_decode's dropped
        # first step
        states = zero_state(B * K, num_hidden, num_layers)
        vis_k = None
    else:
        error("Undefined rnn visual mode [%s]" % visual_mode)

    def cell_forward(x, cs, hs):
        seq_in = x
        new_cs, new_hs = [], []
        for l, layer in enumerate(params["cells"]):
            d = seq_in.shape[-1]
            wx, wh = _split_kernel(layer, d)
            xproj = jnp.dot(seq_in, wx, preferred_element_type=jnp.float32)
            new_h, new_c = _cell_step(wh, layer["b"], xproj, hs[l], cs[l])
            new_cs.append(new_c)
            new_hs.append(new_h)
            seq_in = new_h
        return seq_in, jnp.stack(new_cs), jnp.stack(new_hs)

    cs0 = jnp.stack([s[0] for s in states])   # (L, B*K, H)
    hs0 = jnp.stack([s[1] for s in states])
    if visual_mode == defs.rnn_visual_mode.input_bias:
        # pre-roll the visual step: state advances, output discarded
        x0 = _pad_to(expand(visual), emb.shape[1])
        _, cs0, hs0 = cell_forward(x0, cs0, hs0)
    word0 = jnp.broadcast_to(emb[bos_index][None, :], (B * K, emb.shape[1]))
    # only beam 0 is live initially (all beams identical otherwise)
    scores0 = jnp.tile(jnp.asarray([0.0] + [NEG] * (K - 1)), (B,))
    finished0 = jnp.zeros((B * K,), bool)
    tokens0 = jnp.zeros((B * K, sequence_len), jnp.int32)

    def step(carry, t):
        cs, hs, word_vec, scores, finished, tokens = carry
        x = word_vec if vis_k is None else \
            jnp.concatenate([word_vec, vis_k], axis=1)
        out, new_cs, new_hs = cell_forward(x, cs, hs)
        logits = fc_apply(out_fc_params, out)
        logp = jax.nn.log_softmax(logits, axis=-1)          # (B*K, V)
        # finished beams may only continue with EOS at zero cost
        eos_only = jnp.full((V,), NEG).at[eos_index].set(0.0)
        logp = jnp.where(finished[:, None], eos_only[None, :], logp)
        cand = scores[:, None] + logp                        # (B*K, V)
        cand = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(cand, K)         # (B, K)
        beam_idx = top_idx // V                              # within-item
        word_idx = top_idx % V
        flat_src = (jnp.arange(B)[:, None] * K + beam_idx).reshape(-1)
        new_cs = new_cs[:, flat_src, :]
        new_hs = new_hs[:, flat_src, :]
        tokens = tokens[flat_src]
        tokens = tokens.at[:, t].set(word_idx.reshape(-1))
        finished = finished[flat_src] | \
            (word_idx.reshape(-1) == eos_index)
        new_word = emb[word_idx.reshape(-1)]
        return (new_cs, new_hs, new_word, top_scores.reshape(-1),
                finished, tokens), None

    (cs, hs, _, scores, finished, tokens), _ = jax.lax.scan(
        step, (cs0, hs0, word0, scores0, finished0, tokens0),
        jnp.arange(sequence_len))

    scores = scores.reshape(B, K)
    tokens = tokens.reshape(B, K, sequence_len)
    if length_norm > 0:
        # scored tokens per beam: words before EOS plus the EOS itself;
        # beams that never emitted EOS scored exactly sequence_len tokens
        # (clip, so unfinished beams aren't favored by an inflated length)
        lengths = jnp.minimum(
            jnp.sum(jnp.cumprod(tokens != eos_index, axis=-1), axis=-1)
            + 1, sequence_len)
        scores = scores / jnp.power(lengths.astype(jnp.float32),
                                    length_norm)
    best = jnp.argmax(scores, axis=1)
    return tokens[jnp.arange(B), best]
