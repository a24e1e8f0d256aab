"""COCO-style caption metrics: BLEU-1..4, ROUGE-L, CIDEr-D, METEOR-lite.

Replaces the reference's vendored python2 ``pycocoevalcap`` +
Java-subprocess chain (/root/reference/tools/python2_coco_eval/**,
val.py:248-250; the METEOR and Stanford-CoreNLP jars are absent from the
reference repo anyway, `.MISSING_LARGE_BLOBS`) with a dependency-free
python3 implementation:

* tokenizer    — lowercase + punctuation strip, the same normalization the
  annotation pipeline applies (PTBTokenizer's dominant effect; no JVM),
* BLEU-n       — corpus-level, clipped n-gram precision with the 'closest'
  reference length brevity penalty (pycocoevalcap/bleu semantics),
* ROUGE-L      — LCS-based F with beta=1.2, max over references, mean over
  images (pycocoevalcap/rouge semantics),
* CIDEr-D      — tf-idf n-gram cosine (n=1..4) with length gaussian
  (sigma=6) and count clipping, x10 (pycocoevalcap/ciderD semantics),
* METEOR-lite  — exact-match harmonic mean with fragmentation penalty
  (alpha=0.9 variant: F=10PR/(R+9P), penalty=0.5*(chunks/matches)^3).
  Stemming/synonym/paraphrase stages of full METEOR require the absent
  Java+data assets and are documented as out of scope.

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
def _meteor_align(cand, ref):
    """Two-stage greedy alignment: exact word matches first, then
    Porter-stem matches over the words both sides left unmatched
    (the METEOR 1.5 matcher's first two modules; the jar additionally
    runs WordNet-synonym and paraphrase-table stages,
    /root/reference/tools/python2_coco_eval/pycocoevalcap/meteor/meteor.py:80).

    Returns (m_exact, m_stem, chunks) where chunks counts maximal runs of
    contiguous-in-both alignment pairs, over the union alignment."""
    from video_learning_tpu.metrics.porter import stem

    ref_positions = defaultdict(list)
    for j, w in enumerate(ref):
        ref_positions[w].append(j)
    used = set()
    alignment = {}
    for i, w in enumerate(cand):
        for j in ref_positions.get(w, ()):
            if j not in used:
                used.add(j)
                alignment[i] = j
                break
    m_exact = len(alignment)

    stem_positions = defaultdict(list)
    for j, w in enumerate(ref):
        if j not in used:
            stem_positions[stem(w)].append(j)
    for i, w in enumerate(cand):
        if i in alignment:
            continue
        for j in stem_positions.get(stem(w), ()):
            if j not in used:
                used.add(j)
                alignment[i] = j
                break
    m_stem = len(alignment) - m_exact

    if not alignment:
        return 0, 0, 0
    pairs = sorted(alignment.items())
    chunks = 1
    for (i0, j0), (i1, j1) in zip(pairs, pairs[1:]):
        if i1 != i0 + 1 or j1 != j0 + 1:
            chunks += 1
    return m_exact, m_stem, chunks


# Classic METEOR parameters (Banerjee & Lavie 2005; NLTK defaults):
# fmean weight alpha, penalty exponent beta, penalty weight gamma.  The
# reference's jar (METEOR 1.5) additionally runs WordNet-synonym and
# paraphrase-table modules whose data upstream no longer ships
# (.MISSING_LARGE_BLOBS); captions matched only through synonyms
# therefore still score below the full jar.  Exact+stem behavior is
# cross-validated against nltk.translate.meteor_score in
# tests/test_captions_metrics.py.
_METEOR_ALPHA, _METEOR_BETA, _METEOR_GAMMA = 0.9, 3.0, 0.5


def meteor_lite(candidates, references):
    scores = []
    for iid, cand in candidates.items():
        best = 0.0
        for ref in references[iid]:
            m_exact, m_stem, chunks = _meteor_align(cand, ref)
            m = m_exact + m_stem
            if m == 0:
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
    out["METEOR"] = meteor_lite(cands, refs)
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
