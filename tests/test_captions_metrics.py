"""Tests for caption preprocessing tools, runtime caption framing, and the
reimplemented COCO metrics."""

import json

import numpy as np
import pytest
import yaml

from video_learning_tpu.data import captions as cap
from video_learning_tpu.metrics import coco_eval as ce


# ------------------------------------------------------------ annotations
@pytest.fixture
def coco_gt(tmp_path):
    data = {
        "images": [{"id": 1, "file_name": "COCO_val_000000000001.jpg"},
                   {"id": 2, "file_name": "COCO_val_000000000002.jpg"}],
        "annotations": [
            {"image_id": 1, "caption": "A red dog runs fast."},
            {"image_id": 1, "caption": "The red dog is running!"},
            {"image_id": 2, "caption": "A cat sits on a mat."},
            {"image_id": 2, "caption": "Small cat on the mat."}],
    }
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(data))
    return p


def test_process_annotations_vocab_and_encode(tmp_path, coco_gt):
    from video_learning_tpu.tools import process_annotations as pa
    cfg = {"captions": {
        "vocabulary_file": None,
        "caption_files": [str(coco_gt)],
        "caption_file_formats": ["coco"],
        "vocab_replacement_file": None,
        "word_count_thresh": 0,
        "caption_max_length": 6}}
    cfgfile = tmp_path / "cap.yml"
    cfgfile.write_text(yaml.safe_dump(cfg))
    vocab_path = pa.main(["x", str(cfgfile)])
    vocab = [l for l in open(vocab_path).read().splitlines() if l]
    assert vocab[-3:] == ["UNK", "EOS", "BOS"]
    assert "dog" in vocab and "cat" in vocab

    # now encode with the produced vocabulary
    cfg["captions"]["vocabulary_file"] = vocab_path
    cfgfile.write_text(yaml.safe_dump(cfg))
    outputs = pa.main(["x", str(cfgfile)])
    lines = [l.split() for l in open(outputs[0]) if l.strip()]
    assert len(lines) == 4  # 2 images x 2 captions
    vmap = {w: i for i, w in enumerate(vocab)}
    # first token of image-1 captions should decode back to a word
    for parts in lines:
        assert parts[0].endswith(".jpg")
        idxs = [int(x) for x in parts[1:]]
        assert all(0 <= i < len(vocab) for i in idxs)
        assert len(idxs) <= 6


def test_produce_vocab_embeddings(tmp_path):
    from video_learning_tpu.tools import produce_vocab_embeddings as pve
    vocab_file = tmp_path / "v.vocab"
    vocab_file.write_text("dog\ncat\nUNK\nEOS\nBOS\n")
    emb_file = tmp_path / "glove.txt"
    emb_file.write_text("dog 0.1 0.2 0.3\ncat 0.4 0.5 0.6\n")
    out = pve.produce(str(vocab_file), str(emb_file),
                      randomize_missing_embeddings=True, seed=1)
    vocab, matrix = cap.read_embeddings(out)
    assert vocab == ["dog", "cat", "UNK", "EOS", "BOS"]
    assert matrix.shape == (5, 3)
    assert np.allclose(matrix[0], [0.1, 0.2, 0.3])
    # missing tokens randomized within observed min/max
    assert matrix[2:].min() >= 0.1 - 1e-6
    assert matrix[2:].max() <= 0.6 + 1e-6


def test_produce_vocab_embeddings_missing_strict(tmp_path, monkeypatch):
    from video_learning_tpu.tools import produce_vocab_embeddings as pve
    from video_learning_tpu.utils import FrameworkError
    vocab_file = tmp_path / "v.vocab"
    vocab_file.write_text("dog\nzebra\nUNK\nEOS\nBOS\n")
    emb_file = tmp_path / "glove.txt"
    emb_file.write_text("dog 0.1 0.2\n")
    monkeypatch.chdir(tmp_path)
    with pytest.raises(FrameworkError):
        pve.produce(str(vocab_file), str(emb_file),
                    randomize_missing_embeddings=False)


# ------------------------------------------------------- runtime framing
def test_labels_to_words_framing():
    vocab = ["a", "dog", "runs", "UNK", "EOS", "BOS"]
    emb = np.arange(6 * 4, dtype=np.float32).reshape(6, 4)
    out = cap.labels_to_words([[0, 1], [2]], emb, vocab, num_classes=6,
                              max_sequence_length=4, include_labels=True,
                              do_padding=True)
    # word grid: 2 items x 4 steps
    assert out["word_embeddings"].shape == (8, 4)
    # item 0: BOS, a, dog, pad
    assert np.allclose(out["word_embeddings"][0], emb[5])
    assert np.allclose(out["word_embeddings"][1], emb[0])
    assert np.allclose(out["word_embeddings"][3], 0.0)
    # labels: (2+1)+(1+1)=5 rows incl EOS
    assert out["onehot_labels"].shape == (5, 6)
    assert np.argmax(out["onehot_labels"][2]) == 4  # EOS after item0
    assert out["caption_lengths"] == [2, 1]
    assert out["non_padding_index"] == [0, 1, 2, 4, 5]
    assert np.allclose(out["mask"], [[1, 1, 1, 0], [1, 1, 0, 0]])


def test_trim_at_eos():
    vocab = ["a", "b", "EOS"]
    assert cap.trim_at_eos([0, 1, 2, 0], vocab, 10) == [0, 1]
    assert cap.trim_at_eos([0, 1, 0, 1], vocab, 3) == [0, 1, 0]


def test_image_ids_from_paths_file(tmp_path):
    paths = tmp_path / "imgs.txt"
    paths.write_text("COCO_val2014_000000000042.jpg 1 2\n"
                     "COCO_val2014_000000000099.jpg 3\n")
    rec = str(paths) + ".tfrecord"
    ids = cap.image_ids_from_paths_file(rec, 0, 2)
    assert ids == [42, 99]
    ids = cap.image_ids_from_paths_file(rec, 1, 1)
    assert ids == [99]


# ----------------------------------------------------------------- metrics
def _perfect_case():
    cands = {1: ce.tokenize("a red dog runs fast"),
             2: ce.tokenize("a cat sits on a mat")}
    refs = {1: [ce.tokenize("a red dog runs fast")],
            2: [ce.tokenize("a cat sits on a mat")]}
    return cands, refs


def test_bleu_perfect_and_zero():
    cands, refs = _perfect_case()
    scores = ce.bleu(cands, refs)
    assert all(s == pytest.approx(1.0) for s in scores)
    bad = {1: ce.tokenize("x y z w v"), 2: ce.tokenize("q r s t u q")}
    scores = ce.bleu(bad, refs)
    assert scores[0] < 1e-6


def test_bleu_known_value():
    # candidate with 4/5 unigram matches, reference same length
    cands = {1: "the cat sat on mat".split()}
    refs = {1: ["the cat sat on the".split()]}
    s = ce.bleu(cands, refs)
    assert s[0] == pytest.approx(4 / 5)


def test_rouge_l():
    cands, refs = _perfect_case()
    assert ce.rouge_l(cands, refs) == pytest.approx(1.0)
    cands2 = {1: "a dog".split(), 2: "a cat".split()}
    r = ce.rouge_l(cands2, refs)
    assert 0 < r < 1.0


def test_cider_positive_and_ranking():
    cands, refs = _perfect_case()
    perfect = ce.cider_d(cands, refs)
    noisy = ce.cider_d({1: "a red dog".split(), 2: "a cat".split()}, refs)
    assert perfect > noisy > 0


def test_meteor_lite():
    cands, refs = _perfect_case()
    perfect = ce.meteor_lite(cands, refs)
    assert perfect == pytest.approx(0.5 * (1 + 1), rel=1)  # ~ fmean*(1-pen)
    assert perfect > 0.9
    scrambled = {1: "fast runs dog red a".split(),
                 2: "mat a on sits cat a".split()}
    s = ce.meteor_lite(scrambled, refs)
    assert 0 < s < perfect  # fragmentation penalty bites


def test_evaluate_captions_end_to_end(tmp_path, coco_gt):
    results = [{"image_id": 1, "caption": "a red dog runs fast"},
               {"image_id": 2, "caption": "a cat sits on a mat"}]
    rf = tmp_path / "results.json"
    rf.write_text(json.dumps(results))
    scores = ce.evaluate_captions(str(rf), str(coco_gt))
    for k in ("Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr", "METEOR"):
        assert k in scores
        assert 0 <= scores[k] <= 10 + 1e-9
    assert scores["Bleu_1"] > 0.5


def test_coco_eval_cli(tmp_path, coco_gt):
    results = [{"image_id": 1, "caption": "a red dog runs fast"}]
    rf = tmp_path / "results.json"
    rf.write_text(json.dumps(results))
    ce.main(["prog", str(rf), str(coco_gt)])
    out = json.load(open(str(rf) + ".eval.json"))
    assert "CIDEr" in out


def test_rouge_l_max_precision_recall_independent():
    """pycocoevalcap semantics: max precision and max recall are taken
    independently across references before combining into F."""
    from video_learning_tpu.metrics.coco_eval import rouge_l
    cand = {"i": ["a", "b"]}
    refs = {"i": [["a", "b", "c", "c", "c", "c"], ["a", "x"]]}
    # prec_max = 1.0 (ref 1), rec_max = 0.5 (ref 2)
    beta = 1.2
    expect = ((1 + beta ** 2) * 1.0 * 0.5) / (0.5 + beta ** 2 * 1.0)
    assert abs(rouge_l(cand, refs) - expect) < 1e-9


def test_porter_stemmer_matches_reference_algorithm():
    """Spot pairs from the Porter (1980) paper + suffix rules."""
    from video_learning_tpu.metrics.porter import stem
    pairs = [("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
             ("cats", "cat"), ("feed", "feed"), ("agreed", "agre"),
             ("motoring", "motor"), ("hopping", "hop"), ("sized", "size"),
             ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
             ("conditional", "condit"), ("rational", "ration"),
             ("generalizations", "gener"), ("oscillators", "oscil"),
             ("controlling", "control"), ("running", "run")]
    for word, expect in pairs:
        assert stem(word) == expect, (word, stem(word), expect)


def test_meteor_stem_stage_scores_morphological_variants():
    """'running' must match reference 'runs' through the stem stage."""
    refs = {1: ["the dog runs fast".split()]}
    exact = ce.meteor_lite({1: "the dog runs fast".split()}, refs)
    stemmed = ce.meteor_lite({1: "the dog running fast".split()}, refs)
    none = ce.meteor_lite({1: "a cat sat quietly".split()}, refs)
    # stem matches count like exact matches (METEOR semantics): the
    # morphological variant scores identically, unrelated words score 0
    assert stemmed == pytest.approx(exact)
    assert stemmed > 0.9 > none
    assert none == 0.0


def test_meteor_matches_nltk_exact_plus_stem():
    """Cross-validate the scorer against NLTK's METEOR restricted to the
    same two match stages (dummy wordnet -> no synonym matches)."""
    nltk_ms = pytest.importorskip("nltk.translate.meteor_score")

    class _NoWordnet:
        def synsets(self, word):
            return []

    # duplicate-free sentences: with repeated words NLTK's backward-greedy
    # matcher can pick a different (more fragmented) alignment than our
    # forward-greedy one; real METEOR minimizes chunks, which forward
    # greedy approximates at least as well
    cases = [
        ("the quick brown fox jumps over a lazy dog",
         ["that quick brown fox jumped over some lazy dog"]),
        ("man is playing his guitar on stage",
         ["a man plays guitars", "someone performing music live"]),
        ("cats sitting on mats", ["a cat sits on the mat"]),
        ("identical words here", ["identical words here"]),
        ("completely unrelated tokens", ["nothing shared at all"]),
    ]
    for cand, refs in cases:
        ours = ce.meteor_lite({1: cand.split()},
                              {1: [r.split() for r in refs]})
        theirs = nltk_ms.meteor_score([r.split() for r in refs],
                                      cand.split(), wordnet=_NoWordnet())
        assert ours == pytest.approx(theirs, abs=1e-9), (cand, ours,
                                                         theirs)


# ---------------------------------------------------- PTB tokenizer rules
def test_ptb_tokenizer_rules():
    """Contractions, quotes, brackets, numbers, possessives — the
    Stanford-PTBTokenizer string rules the reference's eval chain applies
    (pycocoevalcap/tokenizer/ptbtokenizer.py)."""
    from video_learning_tpu.metrics.ptb import coco_tokenize, ptb_tokenize

    assert ptb_tokenize("A man doesn't run, he walks.") == \
        ["a", "man", "does", "n't", "run", ",", "he", "walks", "."]
    assert ptb_tokenize('"Hello," she said (loudly)!') == \
        ["``", "hello", ",", "''", "she", "said", "-LRB-", "loudly",
         "-RRB-", "!"]
    # numbers keep internal commas/periods/colons
    assert ptb_tokenize("at 3:30 it was 1,000 m or 3.5 km") == \
        ["at", "3:30", "it", "was", "1,000", "m", "or", "3.5", "km"]
    # clitics and multi-word splits
    assert ptb_tokenize("I cannot swim; we're gonna try it's fine") == \
        ["i", "can", "not", "swim", ";", "we", "'re", "gon", "na",
         "try", "it", "'s", "fine"]
    # possessives, hyphens survive
    assert ptb_tokenize("the well-known cat's hat and kids' toys") == \
        ["the", "well-known", "cat", "'s", "hat", "and", "kids", "'",
         "toys"]
    # the COCO evaluator drops its punctuation token list
    assert coco_tokenize('"Hello," she said -- really...') == \
        ["hello", "she", "said", "really"]
    assert coco_tokenize("A man doesn't run, he walks.") == \
        ["a", "man", "does", "n't", "run", "he", "walks"]


def test_ptb_tokenizer_matches_nltk_treebank():
    """Cross-validate against nltk's TreebankWordTokenizer (the same PTB
    sed rules, independently implemented; no corpus data needed).
    Bracket tokens differ by design (we emit the Stanford -LRB- names the
    COCO punctuation list expects), so they are mapped for comparison."""
    nltk_tok = pytest.importorskip("nltk.tokenize")
    from video_learning_tpu.metrics.ptb import ptb_tokenize
    t = nltk_tok.TreebankWordTokenizer()
    unmap = {"-LRB-": "(", "-RRB-": ")", "-LSB-": "[", "-RSB-": "]",
             "-LCB-": "{", "-RCB-": "}"}
    sentences = [
        "A man doesn't run, he walks.",
        '"Hello," she said (loudly)!',
        "The dog's ball -- it's red... really!",
        "I cannot swim; we're gonna try it's 3.5 km, 1,000 m.",
        "the well-known actor 'quoted' this",
        "kids' toys and the cat's hat",
        "two dogs don't sit; they'll run!",
        "she's here, isn't she?",
        "we've been there and we'd go again",
        "a {strange} [bracketed] (example)",
    ]
    for s in sentences:
        ours = [unmap.get(w, w) for w in ptb_tokenize(s)]
        theirs = t.tokenize(s.lower())
        assert ours == theirs, (s, ours, theirs)


def test_ptb_special_contractions():
    """tokenizer.sed's special contraction list beyond the common
    clitics: gimme/lemme/gonna-style splits plus the apostrophe forms
    'tis/'twas (apostrophe stays with the t), more'n and d'ye."""
    from video_learning_tpu.metrics.ptb import ptb_tokenize

    assert ptb_tokenize("gimme the ball") == ["gim", "me", "the", "ball"]
    assert ptb_tokenize("more'n enough") == ["more", "'n", "enough"]
    assert ptb_tokenize("'tis true") == ["'t", "is", "true"]
    assert ptb_tokenize("'twas night") == ["'t", "was", "night"]
    assert ptb_tokenize("d'ye know") == ["d", "'ye", "know"]
    # decade apostrophes are NOT contractions
    assert ptb_tokenize("it's the '90s again") == \
        ["it", "'s", "the", "'90s", "again"]


# -------------------------------------------- corpus-scale agreement
# Seeded generator composing sentences from fragment pools that cover
# every PTB rule family: clitics, multi-word contractions, digit-aware
# commas/colons, currency/percent, hyphenations, possessives (singular
# + plural), quotes (plain + nested), all three bracket kinds, ellipses,
# -- dashes, and trailing punctuation.  Measured agreement with nltk's
# TreebankWordTokenizer: 100% on 500 sentences (rate recorded in
# PARITY.md; any future divergence must be itemized there).
_CORPUS_SUBJECTS = [
    "a man", "the woman", "two dogs", "she", "he", "the well-known actor",
    "my mother-in-law", "the state-of-the-art system", "kids", "the cat",
    "a twenty-year-old runner", "the team", "everyone", "the girl",
    "an old gentleman", "three children", "it", "the dog's owner",
    "somebody's friend", "y'all"]
_CORPUS_VERBS = [
    "runs", "doesn't run", "can't stop", "won't wait", "isn't moving",
    "walks", "jumped", "sits quietly", "couldn't believe", "shouldn't leave",
    "gonna play", "wanna dance", "cannot swim", "gotta go", "lemme see",
    "they'll finish", "we're trying", "you've seen", "i'm sure",
    "he'd agree", "gimme", "ain't got", "shan't touch", "d'ye know",
    "more'n likes"]
_CORPUS_OBJECTS = [
    "the ball", "a red car", "1,000 meters", "3.5 km", "the 3:30 train",
    "$5,000", "100% of the cake", "the kids' toys", "the cat's hat",
    "a {strange} thing", "[bracketed] text", "(parenthetical) notes",
    "item #42", "the A&B company", "some e-mail", "the so-called 'plan'",
    "twenty-three apples", "a one-of-a-kind gift", "rock 'n' roll",
    "half the pie", "the '90s music", "x=1, y=2"]
_CORPUS_TAILS = [
    "", "", "", " -- really", "...", "; so it goes", ", obviously",
    " (as expected)", " -- or not", ": a mystery", ", isn't it",
    " at 12:45", " for $9.99", " by 50%", " e.g. twice", "... or more"]
_CORPUS_ENDS = [".", ".", ".", "!", "?", "...", ".", "!", "?", ".", "?!"]
_CORPUS_WRAPS = [
    lambda s: s, lambda s: s, lambda s: s,
    lambda s: '"%s"' % s,
    lambda s: "%s, she said" % s,
    lambda s: 'he said, "%s"' % s,
    lambda s: "wait... %s" % s,
    lambda s: "'tis said %s" % s]


def _gen_corpus_sentence(rng):
    s = "%s %s %s%s" % (rng.choice(_CORPUS_SUBJECTS),
                        rng.choice(_CORPUS_VERBS),
                        rng.choice(_CORPUS_OBJECTS),
                        rng.choice(_CORPUS_TAILS))
    return rng.choice(_CORPUS_WRAPS)(s) + rng.choice(_CORPUS_ENDS)


def test_ptb_tokenizer_corpus_agreement_nltk():
    """Corpus-scale cross-validation: 500 seeded composite sentences vs
    nltk's TreebankWordTokenizer, token-stream equality required on ALL
    of them (measured rate 100%, recorded in PARITY.md)."""
    import random as _random

    nltk_tok = pytest.importorskip("nltk.tokenize")
    from video_learning_tpu.metrics.ptb import ptb_tokenize
    t = nltk_tok.TreebankWordTokenizer()
    unmap = {"-LRB-": "(", "-RRB-": ")", "-LSB-": "[", "-RSB-": "]",
             "-LCB-": "{", "-RCB-": "}"}
    rng = _random.Random(20260819)
    mismatches = []
    for _ in range(500):
        s = _gen_corpus_sentence(rng)
        ours = [unmap.get(w, w) for w in ptb_tokenize(s)]
        theirs = t.tokenize(s.lower())
        if ours != theirs:
            mismatches.append((s, ours, theirs))
    assert not mismatches, mismatches[:5]


def test_meteor_corpus_agreement_nltk():
    """Corpus-scale METEOR cross-validation: 200 seeded (candidate,
    references) pairs spanning synonym swaps, reorderings, truncations,
    multi-reference sets and unrelated captions; EXACT score equality
    with nltk.translate.meteor_score running the identical stemmer and
    the bundled synonym table (measured rate 100%, PARITY.md)."""
    import random as _random

    nltk_ms = pytest.importorskip("nltk.translate.meteor_score")
    from video_learning_tpu.metrics import coco_eval as ce
    from video_learning_tpu.metrics.synonyms import wordnet_like

    words = ("a the big large small little dog cat hound man woman person "
             "guy runs sprints walks strolls sits stands jumps leaps "
             "quickly slowly fast red crimson blue azure car automobile "
             "road street field meadow toy toys child children kid kids "
             "play playing plays old elderly young gentleman lady across "
             "upon on in under over and or with").split()
    rng = _random.Random(42)
    mismatches = []
    for _ in range(200):
        ref = [rng.choice(words) for _ in range(rng.randint(3, 12))]
        if rng.random() < 0.7:
            cand = list(ref)
            for j in range(len(cand)):
                if rng.random() < 0.3:
                    cand[j] = rng.choice(words)
            if rng.random() < 0.5:
                rng.shuffle(cand)
            if len(cand) > 3 and rng.random() < 0.3:
                cand = cand[:-rng.randint(1, 2)]
        else:
            cand = [rng.choice(words) for _ in range(rng.randint(3, 10))]
        refs = [ref] + [[rng.choice(words)
                         for _ in range(rng.randint(3, 10))]
                        for _ in range(rng.randint(1, 3) - 1)]
        ours = ce.meteor({1: cand}, {1: refs})
        theirs = nltk_ms.meteor_score(refs, cand, stemmer=_OurStemmer(),
                                      wordnet=wordnet_like)
        if abs(ours - theirs) > 1e-12:
            mismatches.append((cand, refs, ours, theirs))
    assert not mismatches, mismatches[:5]


# ------------------------------------------------- METEOR synonym stage
class _OurStemmer:
    def stem(self, w):
        from video_learning_tpu.metrics.porter import stem
        return stem(w)


def test_meteor_matches_nltk_full_chain():
    """EXACT score equality with nltk.translate.meteor_score running the
    identical stemmer and the bundled synonym table injected as its
    wordnet — validating the whole matcher chain (exact + stem + synonym
    + chunk fragmentation) against an independent implementation."""
    nltk_ms = pytest.importorskip("nltk.translate.meteor_score")
    from video_learning_tpu.metrics import coco_eval as ce
    from video_learning_tpu.metrics.synonyms import wordnet_like

    pairs = [
        ("a big dog runs across the field",
         ["a large dog sprints across a meadow"]),
        ("the cat sits on the mat", ["a cat sat upon the mat quietly"]),
        ("it is a guide to action which ensures that the military "
         "always obeys the commands of the party",
         ["it is a guide to action that ensures that the military will "
          "forever heed party commands"]),
        ("a man riding a horse",
         ["a person rides a pony", "a guy on a horse"]),
        ("completely unrelated words here",
         ["nothing matches at all today"]),
        ("children playing with toys", ["kids play with a toy"]),
        ("a small red car on the street",
         ["a little crimson automobile on the road"]),
        ("an old man walks slowly", ["an elderly gentleman strolls"]),
    ]
    for cand, refs in pairs:
        ours = ce.meteor({1: cand.split()},
                         {1: [r.split() for r in refs]})
        theirs = nltk_ms.meteor_score(
            [r.split() for r in refs], cand.split(),
            stemmer=_OurStemmer(), wordnet=wordnet_like)
        assert ours == pytest.approx(theirs, abs=1e-12), (cand, ours,
                                                          theirs)


def test_meteor_synonym_stage_scores_synonyms():
    """Synonym-only paraphrases must outscore unrelated captions and the
    synonym stage must add over exact+stem alone."""
    from video_learning_tpu.metrics import coco_eval as ce

    refs = {1: ["a big dog runs fast".split()]}
    exact = ce.meteor({1: "a big dog runs fast".split()}, refs)
    synon = ce.meteor({1: "a large hound sprints fast".split()}, refs)
    none = ce.meteor({1: "purple elephants fly backwards".split()}, refs)
    assert exact == pytest.approx(0.9999, abs=1e-2)
    assert synon > 0.5
    assert none == 0.0
    # disabling the synonym source isolates the stage's contribution
    no_syn = ce.meteor({1: "a large hound sprints fast".split()}, refs,
                       synonyms_fn=lambda w: {w})
    assert synon > no_syn


def test_bundled_synonym_table_shapes():
    from video_learning_tpu.metrics.synonyms import (synonyms,
                                                     wordnet_like)
    assert "large" in synonyms("big")
    assert "big" in synonyms("large")      # symmetric
    assert synonyms("qwertyuiop") == {"qwertyuiop"}
    # the nltk-wordnet duck type
    syns = wordnet_like.synsets("big")
    names = {l.name() for s in syns for l in s.lemmas()}
    assert "huge" in names
    assert wordnet_like.synsets("qwertyuiop") == []
