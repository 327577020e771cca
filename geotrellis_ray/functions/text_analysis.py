"""Text-analysis batch functions for the training-data pipeline: token
counting, quality scoring, n-gram language ID, document fingerprinting.
All Arrow-vectorized (pyarrow.compute regex kernels) except where a Python
loop is inherent (langid per-doc ngram profile, fingerprints) — those are
meant to run inside actor-pool map_batches stages.

These operators are engine additions (no GeoTrellis counterpart; driver
mandate). The integer metrics are defined so the DuckDB oracle can reproduce
them exactly (regexp_extract_all lengths — no float divergence).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import rolling_fingerprint

# deterministic stopword profiles for the 8 corpus languages (tiny n-gram
# heuristic: score = sum of profile-ngram occurrences; argmax wins, tie ->
# lexicographically first lang). Profiles are OUR spec, fixed constants.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "und", "das", "ein", "ich"),
    "fr": ("le", "la", "les", "et", "des", "une"),
    "es": ("el", "la", "los", "que", "de", "una"),
    "pt": ("o", "a", "os", "que", "de", "uma"),
    "zh": ("的", "是", "了", "在", "我", "有"),
    "ru": ("и", "в", "не", "на", "что", "он"),
    "ja": ("の", "に", "は", "を", "た", "が"),
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds n_tokens: count of \\S+ runs (whitespace tokenization)."""
    counts = pc.count_substring_regex(batch[text_col], r"\S+")
    return batch.append_column("n_tokens", counts.cast(pa.int64()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds integer quality metrics (SQL-reproducible): n_chars, n_tokens,
    n_punct (.,!?;:), n_digits, n_upper; plus quality_ok: a boolean
    length/punct gate (50 <= n_chars <= 20000 and n_punct*10 <= n_tokens*3+10)."""
    t = batch[text_col]
    n_chars = pc.utf8_length(t).cast(pa.int64())
    n_tokens = pc.count_substring_regex(t, r"\S+").cast(pa.int64())
    n_punct = pc.count_substring_regex(t, r"[.,!?;:]").cast(pa.int64())
    n_digits = pc.count_substring_regex(t, r"[0-9]").cast(pa.int64())
    n_upper = pc.count_substring_regex(t, r"[A-Z]").cast(pa.int64())
    n_stop = pc.count_substring_regex(t, STOPWORD_PATTERN).cast(pa.int64())
    ok = pc.and_(
        pc.and_(pc.greater_equal(n_chars, 50), pc.less_equal(n_chars, 20000)),
        pc.less_equal(pc.multiply(n_punct, 10), pc.add(pc.multiply(n_tokens, 3), 10)),
    )
    out = batch.append_column("n_chars_m", n_chars)
    out = out.append_column("n_tokens", n_tokens)
    out = out.append_column("n_punct", n_punct)
    out = out.append_column("n_digits", n_digits)
    out = out.append_column("n_upper", n_upper)
    out = out.append_column("n_stop", n_stop)
    return out.append_column("quality_ok", ok)


class LangId:
    """Actor-pool language-ID stage: profiles compiled once in __init__."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = sorted(LANG_PROFILES)
        self.words = {lang: set(LANG_PROFILES[lang]) for lang in self.langs}

    def predict(self, texts: list[str]) -> list[str]:
        out = []
        for t in texts:
            toks = t.lower().split()
            best_lang, best_score = "en", -1
            for lang in self.langs:
                prof = self.words[lang]
                score = sum(1 for w in toks if w in prof)
                # CJK profiles are substrings, not space-tokens
                if lang in ("zh", "ja"):
                    score = sum(t.count(w) for w in prof)
                if score > best_score:
                    best_lang, best_score = lang, score
            out.append(best_lang)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "lang_pred", pa.array(self.predict(batch[self.text_col].to_pylist()), pa.string())
        )


class Fingerprinter:
    """Actor-pool rolling-hash document fingerprint stage."""

    def __init__(self, window: int = 32, keep_mod: int = 8, text_col: str = "text"):
        self.window = window
        self.keep_mod = keep_mod
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [
            rolling_fingerprint(t, self.window, self.keep_mod).tolist()
            for t in batch[self.text_col].to_pylist()
        ]
        return batch.append_column("fingerprint", pa.array(fps, pa.list_(pa.uint64())))


def bpe_ish_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds n_bpe_tokens: GPT-2-style pre-tokenizer piece count (ASCII
    simplification, RE2-compatible so pyarrow and DuckDB agree exactly):
    contraction suffixes | optional-space+letters | optional-space+digits |
    optional-space+punct-run | whitespace-run-not-before-nonspace."""
    counts = pc.count_substring_regex(batch[text_col], BPE_ISH_PATTERN)
    return batch.append_column("n_bpe_tokens", counts.cast(pa.int64()))


# RE2 syntax (no lookahead): the trailing \s+ alternative matches residual
# whitespace runs; order matters — alternation is first-match-wins at each
# position in both RE2 engines.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"

# RE2-compatible in both pyarrow and DuckDB (\b word boundaries, (?i))
STOPWORD_PATTERN = r"(?i)\b(?:the|and|of|to|in|a|is|that|for|it|on|as|with|was|at)\b"
