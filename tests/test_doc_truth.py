"""Doc-truth lint: every quoted cross-reference from code/docs/scripts
to a documentation section must resolve to a real section, and every
"recorded at the end of this document" promise must be followed by
actual recorded numbers.  Round 4 shipped three dangling claims of this
class (VERDICT r4 Weak #2); this lint makes that drift unshippable."""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# documents that QUOTE references while discussing them, not making them
EXCLUDE = {"VERDICT.md", "ADVICE.md", "PROGRESS.jsonl",
           os.path.basename(__file__)}

REF_RE = re.compile(
    r'\b(BASELINE|SERVING|PARITY|MIGRATION|PERFORMANCE|SURVEY)\.md'
    r'\s+"([^"]+)"')
PROMISE_RE = re.compile(r"recorded\s+at\s+the\s+end\s+of\s+this\s+"
                        r"document")


def _repo_files(exts=(".py", ".sh", ".md")):
    for root, dirs, files in os.walk(REPO):
        dirs[:] = [d for d in dirs
                   if d not in (".git", ".bench_e2e", "__pycache__",
                                ".pytest_cache", ".claude")]
        for f in files:
            if f.endswith(exts) and f not in EXCLUDE:
                yield os.path.join(root, f)


def _normalized(path):
    """File text with line wraps inside comments/docstrings flattened so
    a quoted section name split across lines still matches."""
    text = open(path, encoding="utf-8", errors="replace").read()
    return re.sub(r"\n[ \t]*#?[ \t]*", " ", text)


def _doc_path(name):
    for cand in (os.path.join(REPO, name),
                 os.path.join(REPO, "docs", name)):
        if os.path.exists(cand):
            return cand
    return None


def _headings(doc_path):
    return [re.sub(r"\s+", " ", ln.lstrip("#").strip())
            for ln in open(doc_path, encoding="utf-8")
            if ln.startswith("#")]


def test_quoted_section_references_resolve():
    missing = []
    for path in _repo_files():
        for doc, section in REF_RE.findall(_normalized(path)):
            if section.startswith("<"):      # placeholder in a docstring
                continue
            doc_path = _doc_path(doc + ".md")
            rel = os.path.relpath(path, REPO)
            if doc_path is None:
                missing.append("%s -> %s.md (document absent)"
                               % (rel, doc))
                continue
            want = re.sub(r"\s+", " ", section).lower()
            if not any(want in h.lower() for h in _headings(doc_path)):
                missing.append('%s -> %s.md "%s" (no such section)'
                               % (rel, doc, section))
    assert not missing, "dangling doc references:\n" + "\n".join(missing)


def test_end_of_document_promises_have_numbers():
    broken = []
    for root in (REPO, os.path.join(REPO, "docs")):
        if not os.path.isdir(root):
            continue
        for f in sorted(os.listdir(root)):
            if not f.endswith(".md") or f in EXCLUDE:
                continue
            path = os.path.join(root, f)
            text = re.sub(r"\s+", " ", open(path, encoding="utf-8").read())
            if not PROMISE_RE.search(text):
                continue
            # the text after the LAST heading must contain measurements
            raw = open(path, encoding="utf-8").read()
            tail = raw[raw.rfind("\n#"):]
            if not re.search(r"\d+\.\d+", tail):
                broken.append("%s promises numbers at the end but its "
                              "final section has none" % f)
    assert not broken, "\n".join(broken)


def test_sections_this_repo_relies_on_exist():
    """The anchor sections the examples/tools point at, pinned by name —
    a rename or deletion of a recorded anchor must fail loudly even if
    every pointer is updated in the same commit."""
    base = _headings(os.path.join(REPO, "BASELINE.md"))
    for want in ("multi-class accuracy anchor", "caption anchor pair",
                 "accuracy parity anchors"):
        assert any(want in h.lower() for h in base), want
