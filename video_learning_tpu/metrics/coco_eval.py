"""COCO-style caption metrics: BLEU-1..4, ROUGE-L, CIDEr-D, METEOR.

Replaces the reference's vendored python2 ``pycocoevalcap`` +
Java-subprocess chain (/root/reference/tools/python2_coco_eval/**,
val.py:248-250; the METEOR and Stanford-CoreNLP jars are absent from the
reference repo anyway, `.MISSING_LARGE_BLOBS`) with a dependency-free
python3 implementation:

* tokenizer    — the PTB tokenization rules + COCO punctuation drop
  (metrics/ptb.py; the string rules of the Stanford PTBTokenizer the
  reference shells out to, with no JVM),
* BLEU-n       — corpus-level, clipped n-gram precision with the 'closest'
  reference length brevity penalty (pycocoevalcap/bleu semantics),
* ROUGE-L      — LCS-based F with beta=1.2, max over references, mean over
  images (pycocoevalcap/rouge semantics),
* CIDEr-D      — tf-idf n-gram cosine (n=1..4) with length gaussian
  (sigma=6) and count clipping, x10 (pycocoevalcap/ciderD semantics),
* METEOR       — the exact + Porter-stem + synonym matcher chain
  (classic parameters alpha=0.9/beta=3/gamma=0.5; synonyms from the
  bundled table in metrics/synonyms.py, score-identical to
  nltk.translate.meteor_score on the same synonymy).  The jar's fourth,
  paraphrase-table stage has no shipped data upstream.

CLI (mirrors reference coco_eval.py): writes ``<results>.eval.json``:
  python -m video_learning_tpu.metrics.coco_eval results.json gt.json
"""

import json
import math
import sys
from collections import Counter, defaultdict

from video_learning_tpu.utils import error, info

def tokenize(caption):
    # the exact normalization the ground-truth vocabularies were built
    # with — one shared implementation so eval cannot drift from packing
    from video_learning_tpu.data.captions import normalize_caption
    return normalize_caption(caption)


def _ngrams(tokens, n):
    return Counter(tuple(tokens[i:i + n])
                   for i in range(len(tokens) - n + 1))


# -------------------------------------------------------------------- BLEU
def bleu(candidates, references, max_n=4):
    """Corpus-level BLEU-1..max_n.  candidates: {id: [tokens]};
    references: {id: [[tokens], ...]}."""
    clipped = [0.0] * max_n
    totals = [0.0] * max_n
    cand_len, ref_len = 0, 0
    for iid, cand in candidates.items():
        refs = references[iid]
        cand_len += len(cand)
        # closest reference length (ties -> shorter)
        ref_len += min((abs(len(r) - len(cand)), len(r))
                       for r in refs)[1]
        for n in range(1, max_n + 1):
            cand_counts = _ngrams(cand, n)
            max_ref = Counter()
            for r in refs:
                for gram, cnt in _ngrams(r, n).items():
                    max_ref[gram] = max(max_ref[gram], cnt)
            totals[n - 1] += max(0, len(cand) - n + 1)
            clipped[n - 1] += sum(min(cnt, max_ref[gram])
                                  for gram, cnt in cand_counts.items())
    bp = 1.0 if cand_len > ref_len else \
        math.exp(1 - ref_len / max(cand_len, 1))
    scores = []
    log_sum = 0.0
    for n in range(max_n):
        # tiny-count smoothing mirrors pycocoevalcap's epsilon guard
        p = clipped[n] / totals[n] if totals[n] > 0 else 0.0
        log_sum += math.log(max(p, 1e-12))
        scores.append(bp * math.exp(log_sum / (n + 1)))
    return scores


# ------------------------------------------------------------------ ROUGE
def _lcs_len(a, b):
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        curr = [0]
        for j, y in enumerate(b):
            curr.append(prev[j] + 1 if x == y
                        else max(curr[j], prev[j + 1]))
        prev = curr
    return prev[-1]


def rouge_l(candidates, references, beta=1.2):
    scores = []
    for iid, cand in candidates.items():
        # pycocoevalcap semantics: max precision and max recall are taken
        # INDEPENDENTLY across references, then combined into one F score
        # (not the max of per-reference F values)
        prec_max, rec_max = 0.0, 0.0
        for ref in references[iid]:
            lcs = _lcs_len(cand, ref)
            if lcs == 0:
                continue
            if cand:
                prec_max = max(prec_max, lcs / len(cand))
            if ref:
                rec_max = max(rec_max, lcs / len(ref))
        if prec_max and rec_max:
            scores.append(((1 + beta ** 2) * prec_max * rec_max)
                          / (rec_max + beta ** 2 * prec_max))
        else:
            scores.append(0.0)
    return sum(scores) / max(len(scores), 1)


# ------------------------------------------------------------------ CIDEr
def cider_d(candidates, references, max_n=4, sigma=6.0):
    """CIDEr-D: tf-idf n-gram cosine with length gaussian + clipping."""
    # document frequency over reference sets
    df = defaultdict(float)
    for refs in references.values():
        seen = set()
        for ref in refs:
            for n in range(1, max_n + 1):
                seen.update(_ngrams(ref, n).keys())
        for gram in seen:
            df[gram] += 1.0
    log_num_imgs = math.log(max(len(references), 1))

    def vec(tokens):
        out, norms, lengths = [], [], []
        for n in range(1, max_n + 1):
            counts = _ngrams(tokens, n)
            v = {}
            for gram, cnt in counts.items():
                idf = log_num_imgs - math.log(max(df[gram], 1.0))
                v[gram] = cnt * idf
            out.append(v)
            norms.append(math.sqrt(sum(x * x for x in v.values())))
            lengths.append(len(tokens))
        return out, norms, lengths

    scores = []
    for iid, cand in candidates.items():
        cv, cn, _ = vec(cand)
        score_img = 0.0
        for ref in references[iid]:
            rv, rn, _ = vec(ref)
            delta = len(cand) - len(ref)
            sim_n = 0.0
            for n in range(max_n):
                num = sum(min(cv[n].get(g, 0.0), rv[n].get(g, 0.0)) *
                          rv[n].get(g, 0.0)
                          for g in cv[n])
                denom = cn[n] * rn[n]
                s = num / denom if denom > 0 else 0.0
                s *= math.exp(-(delta ** 2) / (2 * sigma ** 2))
                sim_n += s
            score_img += sim_n / max_n
        scores.append(10.0 * score_img / max(len(references[iid]), 1))
    return sum(scores) / max(len(scores), 1)


# ----------------------------------------------------------------- METEOR
def _meteor_match_surface(enum_hyp, enum_ref):
    """One surface-form matching pass: reverse hypothesis scan, each word
    matched to the highest still-unused reference position of the same
    surface form — the exact matching order of nltk's
    translate.meteor_score (and of the METEOR matcher it implements), so
    the two implementations produce identical alignments and the nltk
    oracle test can assert equality, not approximation."""
    ref_positions = defaultdict(list)
    for j, (_, w) in enumerate(enum_ref):
        ref_positions[w].append(j)
    matches, mh, mr = [], set(), set()
    for i in range(len(enum_hyp))[::-1]:
        positions = ref_positions.get(enum_hyp[i][1])
        if positions:
            j = positions.pop()
            mh.add(i)
            mr.add(j)
            matches.append((enum_hyp[i][0], enum_ref[j][0]))
    rem_h = [p for i, p in enumerate(enum_hyp) if i not in mh]
    rem_r = [p for j, p in enumerate(enum_ref) if j not in mr]
    return matches, rem_h, rem_r


def _meteor_match_synonyms(enum_hyp, enum_ref, synonyms_fn):
    """Synonym stage: a hypothesis word matches the highest still-unused
    reference position carrying ANY of its synonym candidates (nltk's
    _enum_wordnetsyn_match semantics, with the synonym source pluggable —
    the bundled table by default, a real WordNet reader when present)."""
    ref_positions = defaultdict(list)
    for j, (_, w) in enumerate(enum_ref):
        ref_positions[w].append(j)
    matches, mh, mr = [], set(), set()
    for i in range(len(enum_hyp))[::-1]:
        best_j, best_w = -1, None
        for s in synonyms_fn(enum_hyp[i][1]):
            positions = ref_positions.get(s)
            if positions and positions[-1] > best_j:
                best_j, best_w = positions[-1], s
        if best_w is not None:
            ref_positions[best_w].pop()
            mh.add(i)
            mr.add(best_j)
            matches.append((enum_hyp[i][0], enum_ref[best_j][0]))
    rem_h = [p for i, p in enumerate(enum_hyp) if i not in mh]
    rem_r = [p for j, p in enumerate(enum_ref) if j not in mr]
    return matches, rem_h, rem_r


def _meteor_align(cand, ref, synonyms_fn=None):
    """Three-stage METEOR alignment — exact, Porter-stem, synonym —
    mirroring the METEOR matcher module order (reference
    pycocoevalcap/meteor/meteor.py:80; the jar's fourth, paraphrase-table
    stage has no shipped data upstream).  Returns (matches, chunks)."""
    from video_learning_tpu.metrics.porter import stem

    if synonyms_fn is None:
        from video_learning_tpu.metrics.synonyms import synonyms
        synonyms_fn = synonyms
    enum_hyp = list(enumerate(cand))
    enum_ref = list(enumerate(ref))
    exact, enum_hyp, enum_ref = _meteor_match_surface(enum_hyp, enum_ref)
    stems, sh, sr = _meteor_match_surface(
        [(i, stem(w)) for i, w in enum_hyp],
        [(j, stem(w)) for j, w in enum_ref])
    # nltk's stem stage hands its STEMMED leftovers to the synonym stage
    # (quirk preserved for exact oracle equality) — synonym lookups run
    # on stems, which the bundled table covers via its base forms
    syns, _, _ = _meteor_match_synonyms(sh, sr, synonyms_fn)
    matches = sorted(exact + stems + syns)
    if not matches:
        return [], 0
    chunks = 1
    for (i0, j0), (i1, j1) in zip(matches, matches[1:]):
        if i1 != i0 + 1 or j1 != j0 + 1:
            chunks += 1
    return matches, chunks


# Classic METEOR parameters (Banerjee & Lavie 2005; NLTK defaults):
# fmean weight alpha, penalty exponent beta, penalty weight gamma.  The
# full matcher chain (exact + stem + synonym) and these parameters are
# cross-validated for EXACT score equality against
# nltk.translate.meteor_score (with the bundled synonym table injected as
# its wordnet) in tests/test_captions_metrics.py.  The reference's jar
# (METEOR 1.5) additionally runs a paraphrase-table module whose data
# upstream no longer ships (.MISSING_LARGE_BLOBS).
_METEOR_ALPHA, _METEOR_BETA, _METEOR_GAMMA = 0.9, 3.0, 0.5


def meteor(candidates, references, synonyms_fn=None):
    scores = []
    for iid, cand in candidates.items():
        best = 0.0
        for ref in references[iid]:
            matches, chunks = _meteor_align(cand, ref, synonyms_fn)
            m = len(matches)
            if m == 0 or not cand or not ref:
                continue
            p = m / len(cand)
            r = m / len(ref)
            fmean = p * r / (_METEOR_ALPHA * p +
                             (1.0 - _METEOR_ALPHA) * r)
            frag = chunks / m
            penalty = _METEOR_GAMMA * frag ** _METEOR_BETA
            best = max(best, fmean * (1.0 - penalty))
        scores.append(best)
    return sum(scores) / max(len(scores), 1)


# backward-compatible name (round-2 API; the matcher now runs the full
# exact+stem+synonym chain rather than the -lite two stages)
meteor_lite = meteor


# ------------------------------------------------------------------ driver
def load_ground_truth(gt_file):
    """COCO annotations json -> {image_id: [[tokens], ...]}."""
    with open(gt_file, "r") as f:
        data = json.load(f)
    refs = defaultdict(list)
    for annot in data["annotations"]:
        refs[annot["image_id"]].append(tokenize(annot["caption"]))
    return dict(refs)


def load_results(results_file):
    """COCO results json [{'image_id','caption'}] -> {id: [tokens]}."""
    with open(results_file, "r") as f:
        data = json.load(f)
    return {obj["image_id"]: tokenize(obj["caption"]) for obj in data}


def evaluate_captions(results_file, gt_file):
    """Full evaluation; returns {metric: score} for the image ids present
    in both files (reference coco eval restricts to the result ids)."""
    candidates = load_results(results_file)
    references = load_ground_truth(gt_file)
    common = [iid for iid in candidates if iid in references]
    if not common:
        error("No overlapping image ids between results and ground truth")
    if len(common) < len(candidates):
        info("Evaluating %d/%d results present in the ground truth"
             % (len(common), len(candidates)))
    cands = {iid: candidates[iid] for iid in common}
    refs = {iid: references[iid] for iid in common}
    bleu_scores = bleu(cands, refs)
    out = {"Bleu_%d" % (i + 1): s for i, s in enumerate(bleu_scores)}
    out["ROUGE_L"] = rouge_l(cands, refs)
    out["CIDEr"] = cider_d(cands, refs)
    out["METEOR"] = meteor(cands, refs)
    return out


def main(argv=None):
    from video_learning_tpu.utils import ensure_console_logging
    ensure_console_logging()
    argv = argv or sys.argv
    if len(argv) < 3:
        error("Usage: coco_eval <results.json> <ground_truth.json>")
    results_file, gt_file = argv[-2], argv[-1]
    scores = evaluate_captions(results_file, gt_file)
    out = results_file + ".eval.json"
    with open(out, "w") as f:
        json.dump(scores, f, indent=2)
    for k, v in scores.items():
        info("%s: %.4f" % (k, v))
    return scores


if __name__ == "__main__":
    main()
