"""HTML -> text extraction — THE byte-identity spec (FIXTURES.md §1.1).

The per-row invariant mandated by BASELINE.json input_hint is "byte-identical
extracted text per url". This module IS the spec: the fixture generator writes
``text = extract_text(html)`` and the pipeline re-extracts with the same
function, so pytest can assert byte-identity end-to-end.

Spec (deterministic, single semantic pass):
 1. replace ``<script>...</script>`` / ``<style>...</style>`` blocks with one
    space (case-insensitive, non-greedy);
 2. replace everything between ``<`` and the next ``>`` (tags, comments,
    meta) with one space — adjacent text nodes never concatenate;
 3. decode UTF-8 with ``errors="replace"``;
 4. decode ONLY these entities, in this order (so ``&amp;lt;`` single-decodes
    to the literal ``&lt;``): ``&lt; &gt; &quot; &#39;`` then ``&amp;`` last;
 5. collapse every ASCII-whitespace run (``[ \\t\\n\\r\\f\\v]+``) to one space;
 6. strip leading/trailing spaces.

Two implementations with identical output: a vectorized pyarrow/re2 path for
the hot pipeline stage, and a pure-Python per-row path used as fallback for
non-UTF8 html and as the oracle in tests.

Reference parity: replaces GeoTrellis's per-record parsers for the web-text
corpus (SURVEY.md §2.2 "HTML→text extractor"); no counterpart file exists in
/root/reference (dir empty at survey time, see SURVEY.md §0).
"""

from __future__ import annotations

import re

# --- pure-Python spec (oracle + fallback) ----------------------------------

# NOTE: no backreference (re2, used by the arrow path, has none) — a
# <script>...</style> cross-close matches at the first closer; spec'd so.
_SCRIPT_STYLE_B = re.compile(rb"(?is)<(?:script|style)\b[^>]*>.*?</(?:script|style)\s*>")
_TAG_B = re.compile(rb"<[^>]*>")
_WS = re.compile(r"[ \t\n\r\f\v]+")

# order matters: &amp; decoded LAST so "&amp;lt;" -> "&lt;" (single decode)
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def extract_text(html: bytes) -> str:
    """Extract visible text from html bytes. This function is the spec."""
    stripped = _SCRIPT_STYLE_B.sub(b" ", html)
    stripped = _TAG_B.sub(b" ", stripped)
    s = stripped.decode("utf-8", errors="replace")
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS.sub(" ", s).strip(" ")


# --- vectorized pyarrow path (hot pipeline stage) --------------------------

def extract_text_arrow(html_col):
    """Vectorized extract over a pyarrow binary array; falls back to the
    per-row spec for chunks containing invalid UTF-8.

    Returns a pyarrow string array with identical bytes to mapping
    :func:`extract_text` over each row.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        s = pc.cast(html_col, pa.large_string())
    except pa.ArrowInvalid:
        # rare path: invalid utf-8 somewhere — per-row spec (still deterministic)
        return pa.array(
            [None if v is None else extract_text(v) for v in html_col.to_pylist()],
            type=pa.large_string(),
        )
    s = pc.replace_substring_regex(s, pattern=r"(?is)<(?:script|style)\b[^>]*>.*?</(?:script|style)\s*>", replacement=" ")
    s = pc.replace_substring_regex(s, pattern=r"<[^>]*>", replacement=" ")
    for ent, ch in _ENTITIES:
        s = pc.replace_substring(s, pattern=ent, replacement=ch)
    s = pc.replace_substring_regex(s, pattern=r"[ \t\n\r\f\v]+", replacement=" ")
    s = pc.utf8_trim(s, characters=" ")
    return s
