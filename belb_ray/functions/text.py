"""Text normalization & tokenization kernels.

Replays the reference's normalizer family (SURVEY §2.3 M9/M13): unicode
oddity replacement (belb/corpora/medmentions.py:22-27,
belb/preprocessing/transform.py:154-163), quote removal
(belb/utils/__init__.py:29-32), whitespace collapsing — expressed as
vectorized pyarrow.compute / regex kernels over Arrow batches instead of
per-dataclass Python mutation.
"""

from __future__ import annotations

import re
import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

# unicode oddities the reference patches one by one
# (belb/corpora/medmentions.py:22-27; belb/corpora/bioid.py:45-50)
_UNICODE_FIXES = [
    ("‎", ""),   # left-to-right mark
    ("‐", "-"),  # hyphen
    ("−", "-"),  # minus sign
    ("\xa0", " "),    # nbsp
    ("‘", "'"),
    ("’", "'"),
    ("“", '"'),
    ("”", '"'),
]

_WS_RE = re.compile(r"\s+")
TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
# path tokenizer: split on /, ., -, _ (sorted-neighborhood key source)
PATH_SPLIT_RE = re.compile(r"[/\.\-_]+")


def normalize_text_array(arr: pa.Array) -> pa.Array:
    """Vectorized normalization: unicode fixes + whitespace collapse + strip.
    Arrow-native (pc.replace_substring), no Python row loop."""
    for old, new in _UNICODE_FIXES:
        arr = pc.replace_substring(arr, old, new)
    arr = pc.replace_substring_regex(arr, r"\s+", " ")
    return pc.utf8_trim_whitespace(arr)


def normalize_text(s: str) -> str:
    """Scalar twin of normalize_text_array (oracle / unit tests)."""
    for old, new in _UNICODE_FIXES:
        s = s.replace(old, new)
    return _WS_RE.sub(" ", s).strip()


def nfkc(s: str) -> str:
    return unicodedata.normalize("NFKC", s)


def tokenize(s: str) -> list[str]:
    """Word tokens (lowercased)."""
    return TOKEN_RE.findall(s.lower())


def path_tokens(path: str) -> list[str]:
    """Path → identifier tokens; drops empty segments."""
    return [t for t in PATH_SPLIT_RE.split(path.lower()) if t]


def sorted_neighborhood_key(path: str, width: int = 2) -> str:
    """Sorted-neighborhood blocking key from a file path: the sorted first
    tokens of the basename. Files whose names share leading sorted tokens
    land in adjacent sort positions (SURVEY §7.2 step 2)."""
    toks = path_tokens(path.rsplit("/", 1)[-1])
    return ".".join(sorted(toks)[:width]) if toks else ""
