"""Penn-Treebank tokenization rules, dependency-free.

The reference evaluates captions through Stanford's PTBTokenizer with
``-lowerCase``, then drops pure-punctuation tokens
(/root/reference/tools/python2_coco_eval/pycocoevalcap/tokenizer/
ptbtokenizer.py:21-67).  The Stanford jar is a JVM asset absent from the
reference repo itself, but the PTB tokenization *rules* are pure string
rewrites (the classic Robert McIntyre ``tokenizer.sed`` that Stanford's
tokenizer and nltk's TreebankWordTokenizer both implement), so they are
reproduced here directly:

* quote normalization — an opening double quote becomes the two-backtick
  PTB token and a closing one becomes '' (the LaTeX-style quote tokens),
* punctuation splitting — commas/semicolons/etc., sentence-final
  periods, ellipses, ``--`` dashes, and brackets (mapped to the PTB
  -LRB-/-RRB-/-LSB-/-RSB-/-LCB-/-RCB- names like Stanford does),
* clitic splitting — ``n't``, ``'ll``, ``'re``, ``'ve``, ``'m``, ``'d``,
  ``'s`` become separate tokens; ``cannot``/``gonna``/``wanna``/
  ``gotta``/``lemme`` split into their PTB word pairs,
* hyphenated words and decimal/comma numbers stay single tokens.

``ptb_tokenize`` returns the raw lowercased token stream;
``coco_tokenize`` additionally removes the COCO punctuation list —
exactly what the reference's evaluation pipeline feeds its metrics.
Cross-validated against nltk's TreebankWordTokenizer in
tests/test_captions_metrics.py.
"""

import re

# the COCO evaluator's punctuation drop list (ptbtokenizer.py:21-22)
PUNCTUATIONS = ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
                ".", "?", "!", ",", ":", "-", "--", "...", ";"]
_PUNCT_SET = frozenset(PUNCTUATIONS)

_BRACKETS = {"(": "-LRB-", ")": "-RRB-", "[": "-LSB-", "]": "-RSB-",
             "{": "-LCB-", "}": "-RCB-"}

# staged rewrites in tokenizer.sed order; every rule pads with spaces and
# the final whitespace split produces the token stream
_STAGES = [
    # opening quotes (start of text or after an opening delimiter)
    (re.compile(r'^"'), r"`` "),
    (re.compile(r'([ \(\[{<])"'), r"\1 `` "),
    # ellipsis before generic period handling
    (re.compile(r"\.\.\."), r" ... "),
    # unambiguous single-character separators
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    # commas/colons split only when not inside a number (1,000 / 3:30
    # stay single tokens — tokenizer.sed's digit-aware comma rules)
    (re.compile(r"([^0-9])([,:])"), r"\1 \2 "),
    (re.compile(r"([,:])([^0-9])"), r" \1 \2"),
    (re.compile(r"([,:])$"), r" \1 "),
    # sentence-final period (keeps abbreviation periods mid-sentence),
    # possibly followed by closing brackets/quotes
    (re.compile(r'([^\.])(\.)([\]\)}>"\']*)\s*$'), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"[\]\[\(\){}<>]"), r" \g<0> "),
    (re.compile(r"--"), r" -- "),
    # closing quotes
    (re.compile(r'"'), r" '' "),
    (re.compile(r"([^'])' "), r"\1 ' "),
    # clitics (case-insensitive; text is lowercased afterwards anyway)
    (re.compile(r"([^' ])('[sSmMdD]) "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
    # multi-word clitic words
    (re.compile(r"\b(can)(not)\b", re.I), r"\1 \2"),
    (re.compile(r"\b(gon|wan)(na)\b", re.I), r"\1 \2"),
    (re.compile(r"\b(got)(ta)\b", re.I), r"\1 \2"),
    (re.compile(r"\b(lem)(me)\b", re.I), r"\1 \2"),
    (re.compile(r"\b(gim)(me)\b", re.I), r"\1 \2"),
    # tokenizer.sed's remaining special contractions: 'tis/'twas keep
    # the apostrophe with the t, more'n and d'ye split at the apostrophe
    (re.compile(r"\b(more)('n)\b", re.I), r"\1 \2"),
    (re.compile(r"('t)(is|was)\b", re.I), r"\1 \2"),
    (re.compile(r"\b(d)('ye)\b", re.I), r"\1 \2"),
]


def ptb_tokenize(text, lowercase=True):
    """Tokenize one sentence with the PTB rules; returns the full token
    list (punctuation tokens included)."""
    s = " " + str(text).replace("\n", " ") + " "
    # normalize unicode quotes to their ascii forms first
    s = s.replace("“", '"').replace("”", '"')
    s = s.replace("‘", "'").replace("’", "'")
    s = s.replace("—", "--").replace("…", "...")
    for pattern, repl in _STAGES:
        s = pattern.sub(repl, s)
    tokens = [_BRACKETS.get(t, t) for t in s.split()]
    if lowercase:
        tokens = [t.lower() if t not in _BRACKETS.values() else t
                  for t in tokens]
    return tokens


def coco_tokenize(text):
    """PTB tokenization + the COCO evaluator's punctuation removal — the
    token stream the reference's metric chain consumes."""
    return [t for t in ptb_tokenize(text) if t not in _PUNCT_SET]
