"""Captioning runtime data support: vocabulary / embedding loading, caption
label framing (BOS/EOS + padding), and logits -> caption-string conversion.

Counterpart of the captioning pieces of /root/reference/dataset_.py
(labels_to_words :337-384, apply_caption_padding :327-334,
validation_logits_to_captions :277-325) with the same BOS/EOS framing and
max-sequence-length padding, emitting additionally a dense (B, T) mask so
that the jitted LSTM caption graphs can use static shapes instead of
gathered non-pad indices.
"""

import os


def normalize_caption(text):
    """Canonical caption normalization: PTB tokenization rules with the
    COCO punctuation drop (metrics/ptb.py — the same normalization the
    reference's evaluation applies through Stanford's PTBTokenizer,
    pycocoevalcap/tokenizer/ptbtokenizer.py:21-67; the reference's
    process_annotations :74-97 lowercases/strips on the packing side).
    Shared by the annotation packer and the metric tokenizer so ground
    truth and evaluation can never normalize differently.

    MIGRATION: before round 3 this stripped punctuation in place
    ("don't" -> "dont"); the PTB rules split clitics instead ("do",
    "n't").  Vocabularies/annotations packed by the old normalizer should
    be regenerated (tools/process_annotations) — mixed-era vocab + eval
    silently maps mismatched tokens to UNK."""
    from video_learning_tpu.metrics.ptb import coco_tokenize
    return coco_tokenize(text)


import numpy as np

from video_learning_tpu.defs import defs
from video_learning_tpu.utils import (debug, error, labels_to_one_hot,
                                      warning)


def read_vocabulary_list(vocab_file):
    """Read a vocabulary file into an ordered list (one token per line;
    produced by tools/process_annotations)."""
    vocab = []
    with open(vocab_file, "r") as f:
        for line in f:
            token = line.strip()
            if token:
                vocab.append(token)
    return vocab


def read_embeddings(embeddings_file):
    """Read a '<token>\\t<v1 v2 ...>' embeddings TSV (the format written by
    tools/produce_vocab_embeddings, reference produce_vocab_embeddings.py:80-83).
    Returns (vocabulary list, float32 matrix [V, D]) in file order."""
    vocab, rows = [], []
    with open(embeddings_file, "r") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            token, vec = line.split("\t", 1)
            vocab.append(token)
            rows.append(np.asarray(vec.split(), dtype=np.float32))
    return vocab, np.stack(rows)


def attach_captioning(dataset, word_embeddings_file, include_labels,
                      do_padding, eval_type=defs.eval_type.coco):
    """Wire captioning metadata into a Dataset: vocabulary + embedding
    matrix (order defines the class indices) and framing flags."""
    vocab, matrix = read_embeddings(word_embeddings_file)
    dataset.vocabulary = vocab
    dataset.embedding_matrix = matrix
    dataset.include_labels = include_labels
    dataset.do_padding = do_padding
    dataset.eval_type = eval_type
    for special in ("BOS", "EOS", "UNK"):
        if special not in vocab:
            error("Vocabulary lacks required special token %s" % special)
    return dataset


def labels_to_words(raw_batch_labels, embedding_matrix, vocabulary,
                    num_classes, max_sequence_length, include_labels,
                    do_padding):
    """Convert per-item caption word-index labels into the LSTM's inputs
    (reference dataset_.py:337-384).

    Returns dict with:
      word_embeddings : (B*T, D) float32 — BOS + caption embeddings, padded
                        to T=max_sequence_length per item (when do_padding),
      onehot_labels   : (sum_len, num_classes) int32 — caption + EOS
                        one-hots (no padding),
      caption_lengths : list[int] raw caption lengths,
      non_padding_index : flat indices of non-pad entries in the (B*T)
                        embedding matrix,
      mask            : (B, T) float32 validity mask (TPU-friendly addition).
    """
    emb_dim = embedding_matrix.shape[1]
    bos_index = vocabulary.index("BOS")
    eos_index = vocabulary.index("EOS")
    all_vectors, all_labels, non_pad = [], [], []
    B = len(raw_batch_labels)
    T = max_sequence_length
    mask = np.zeros((B, T), np.float32)
    for batch_index, item_labels in enumerate(raw_batch_labels):
        item_labels = [int(x) for x in (item_labels if isinstance(
            item_labels, (list, tuple)) else [item_labels])]
        if include_labels and 1 + len(item_labels) > T:
            # BOS + caption must fit the padded grid; overflowing rows
            # would spill non_pad indices into the next item's slots
            error("Caption of %d tokens exceeds max sequence length %d"
                  % (len(item_labels), T))
        vectors = embedding_matrix[[bos_index], :]
        if include_labels:
            vectors = np.vstack((vectors,
                                 embedding_matrix[item_labels, :]))
        labels = labels_to_one_hot([[l] for l in item_labels], num_classes)
        if include_labels:
            eos_onehot = labels_to_one_hot(eos_index, num_classes)
            labels = np.vstack((labels, eos_onehot))
        if do_padding:
            rows = vectors.shape[0]  # 1+len in training; 1 (BOS) in val
            pad = T - rows
            offset = batch_index * T
            non_pad.extend(offset + i for i in range(rows))
            if pad > 0:
                vectors = np.vstack((vectors,
                                     np.zeros((pad, emb_dim), np.float32)))
            mask[batch_index, :rows] = 1.0
        all_vectors.append(vectors.astype(np.float32))
        all_labels.append(labels)
    return {
        "word_embeddings": np.vstack(all_vectors),
        "onehot_labels": np.vstack(all_labels).astype(np.int32),
        "caption_lengths": [len(l) if isinstance(l, (list, tuple)) else 1
                            for l in raw_batch_labels],
        "non_padding_index": non_pad,
        "mask": mask,
    }


def image_ids_from_paths_file(record_path, start_index, count):
    """Recover COCO image ids from the paths file backing a record file
    (reference dataset_.py:277-308): basenames like
    COCO_val2014_000000000042.jpg -> 42."""
    parts = record_path.split(".")
    image_paths_file = ".".join(parts[:-1])
    if not image_paths_file or not os.path.exists(image_paths_file):
        from video_learning_tpu.utils import error
        error("Cannot recover image ids: no paths file next to record "
              "[%s] (expected [%s] — records pack as <paths>.tfrecord)"
              % (record_path, image_paths_file or "<empty>"))
    ids = []
    item_no = 0  # dataset items skip blank lines, so count non-blank only
    with open(image_paths_file, "r") as fp:
        for line in fp:
            fields = line.strip().split()
            if not fields:
                continue
            item_no += 1
            if item_no - 1 < start_index:
                continue
            if len(ids) == count:
                break
            filename = os.path.basename(fields[0]).split(".")[0]
            image_id = filename.split("_")[-1]
            try:
                image_id = int(image_id)
            except ValueError:
                warning("Could not convert image id %s to int; keeping "
                        "string." % image_id)
            ids.append(image_id)
    return ids


def trim_at_eos(word_indices, vocabulary, max_caption_length):
    """Cut a decoded index sequence at the first EOS and cap its length
    (semantics of reference val.py:36-46)."""
    eos_index = vocabulary.index("EOS")
    out = []
    for idx in list(word_indices)[:max_caption_length]:
        if int(idx) == eos_index:
            break
        out.append(int(idx))
    return out


def validation_logits_to_captions(logit_index_rows, record_path, vocabulary,
                                  eval_type, start_index=0):
    """Map decoded word-index rows to [{'image_id':…, 'caption':…}]
    (reference dataset_.py:277-325)."""
    image_ids = []
    if eval_type == defs.eval_type.coco:
        image_ids = image_ids_from_paths_file(record_path, start_index,
                                              len(logit_index_rows))
    captions = []
    for row in logit_index_rows:
        words = [vocabulary[int(i)] for i in row]
        captions.append(" ".join(words) if words else " ")
    if eval_type == defs.eval_type.coco and \
            len(image_ids) != len(captions):
        error("Recovered %d image ids for %d decoded captions (stale or "
              "truncated paths file next to %s?)"
              % (len(image_ids), len(captions), record_path))
    for iid, cap in zip(image_ids, captions):
        debug("image id: %s caption: %s" % (iid, cap))
    return [{"image_id": iid, "caption": cap}
            for iid, cap in zip(image_ids, captions)]
