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
    """Actor-pool language-ID stage, fully Arrow-vectorized (VERDICT r03
    finding #1 removed the per-row, per-language Python loop).

    Scoring spec (unchanged from the loop version, proven by the parity
    test in tests/test_ops_pure.py):
    - non-CJK langs: number of whitespace tokens of lower(text) equal to a
      profile word (multiplicity counts). Vectorized by normalizing every
      whitespace run to TWO spaces and padding the ends, so each token is
      flanked by spaces no match consumes twice; one
      ``count_substring_regex(" (?:w1|..|w6) ")`` per language then counts
      token-exact hits without lookahead (RE2 has none).
    - zh/ja: profile entries are single CJK chars — plain substring counts
      on the ORIGINAL text, one ``count_substring`` per profile char.
    - winner: argmax over langs sorted lexicographically, first max wins.
    Patterns are built once per actor in __init__."""

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.langs = sorted(LANG_PROFILES)
        self.token_patterns = {
            lang: " (?:" + "|".join(re.escape(w) for w in LANG_PROFILES[lang]) + ") "
            for lang in self.langs if lang not in ("zh", "ja")
        }
        self.cjk_chars = {lang: LANG_PROFILES[lang] for lang in ("ja", "zh")}

    def predict_table(self, texts: pa.ChunkedArray | pa.Array) -> pa.Array:
        texts = pc.fill_null(texts, "")
        padded = pc.binary_join_element_wise(
            pa.scalar(" "),
            pc.replace_substring_regex(pc.utf8_lower(texts), r"\s+", "  "),
            pa.scalar(" "), "",
        )
        scores = np.empty((len(self.langs), len(texts)), dtype=np.int64)
        for li, lang in enumerate(self.langs):
            if lang in self.cjk_chars:
                s = np.zeros(len(texts), dtype=np.int64)
                for ch in self.cjk_chars[lang]:
                    s += pc.count_substring(texts, ch).to_numpy(zero_copy_only=False)
                scores[li] = s
            else:
                scores[li] = pc.count_substring_regex(
                    padded, self.token_patterns[lang]).to_numpy(zero_copy_only=False)
        best = np.argmax(scores, axis=0)  # first max = lexicographically first lang
        lang_arr = np.array(self.langs)
        return pa.array(lang_arr[best], pa.string())

    def predict(self, texts: list[str]) -> list[str]:
        return self.predict_table(pa.array(texts, pa.string())).to_pylist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column("lang_pred", self.predict_table(batch[self.text_col]))


class Fingerprinter:
    """Actor-pool rolling-hash document fingerprint stage. The rolling scan
    is the batched numpy Horner pass (rolling_fingerprints_batch) — one
    window-step vector scan over the batch's concatenated bytes, not a
    per-byte Python loop per doc."""

    def __init__(self, window: int = 32, keep_mod: int = 8, text_col: str = "text"):
        self.window = window
        self.keep_mod = keep_mod
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .hashing import rolling_fingerprints_batch

        texts = [t if t is not None else "" for t in batch[self.text_col].to_pylist()]
        fps = [f.tolist() for f in rolling_fingerprints_batch(texts, self.window, self.keep_mod)]
        return batch.append_column("fingerprint", pa.array(fps, pa.list_(pa.uint64())))


class HashedNgramScorer:
    """fastText-style hashed char-n-gram linear quality scorer — the batched
    model-inference pattern as a first-class actor-pool stage: the
    bucketized weight table (the "model") is built ONCE per actor in
    ``__init__``; ``__call__`` applies it per batch as pure numpy — one
    rolling polynomial gram hash over the batch's flat Arrow byte buffer
    (same prime/powers as stages.dedup._gram_hash64), a LUT gather, and a
    prefix-sum range reduction per doc. No per-row Python, no shuffle.

    Weights are sha256-derived stand-ins (there is no training data
    in-sandbox) chosen so the WHOLE score is integer-exact and
    SQL-replayable; swapping in real trained weights is an ``np.load`` in
    ``__init__``. Emits (id_col, n_grams, score, keep) with
    keep = 1 iff score > 0."""

    _PRIME = np.uint64(1099511628211)

    def __init__(self, seed: str = "quality-v1", n: int = 4,
                 buckets: int = 4096, scale: int = 1000,
                 id_col: str = "doc_id", text_col: str = "text",
                 passthrough: tuple = ()):
        from .hashing import sha256_64

        self.n = n
        self.buckets = buckets
        self.id_col = id_col
        self.text_col = text_col
        # extra input columns to carry into the output batch unchanged
        # (e.g. the text itself when a downstream chain stage needs it) —
        # same-batch passthrough, never a join
        self.passthrough = tuple(passthrough)
        self.lut = np.array(
            [sha256_64(f"{seed}|{j}") % (2 * scale + 1) - scale
             for j in range(buckets)], dtype=np.int64)
        pows = np.empty(n, dtype=np.uint64)
        pows[0] = np.uint64(1)
        with np.errstate(over="ignore"):
            for j in range(1, n):
                pows[j] = pows[j - 1] * self._PRIME
        self.pows = pows

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        nrows = len(texts)
        b = texts.cast(pa.binary())
        offs = np.frombuffer(b.buffers()[1], dtype=np.int32, count=nrows + 1,
                             offset=b.offset * 4).astype(np.int64)
        data = np.frombuffer(b.buffers()[2], dtype=np.uint8) if b.buffers()[2] \
            else np.empty(0, dtype=np.uint8)
        flat = data[offs[0]:offs[-1]]
        starts = offs[:-1] - offs[0]
        lens = offs[1:] - offs[:-1]
        n = self.n
        npos = max(len(flat) - n + 1, 0)
        cw = np.zeros(npos + 1, dtype=np.int64)
        if npos:
            h = np.zeros(npos, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(n):
                    h += flat[j:j + npos].astype(np.uint64) * self.pows[j]
            w = self.lut[(h % np.uint64(self.buckets)).astype(np.int64)]
            np.cumsum(w, out=cw[1:])
        g = np.maximum(lens - n + 1, 0)
        # docs shorter than n contribute no grams; clip their (degenerate)
        # ranges into the prefix-sum so score = cw[x] - cw[x] = 0
        s0 = np.minimum(starts, npos)
        s1 = np.minimum(starts + g, npos)
        score = cw[s1] - cw[s0]
        cols = {self.id_col: batch[self.id_col],
                "n_grams": pa.array(g, pa.int64()),
                "score": pa.array(score, pa.int64()),
                "keep": pa.array((score > 0).astype(np.int64), pa.int64())}
        for c in self.passthrough:
            cols[c] = batch[c]
        return pa.table(cols)


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


# --- round 3: TF-IDF + repetition filters ------------------------------------

_WORD_RE = r"[a-z]{2,}"


def terms_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Explode each doc into (id, term, tf): lowercase alpha tokens of length
    >= 2 (regexp_extract_all semantics, matching the DuckDB oracle exactly).
    One extract_regex_all + one explode + one pandas groupby — no row loop."""
    import pandas as pd

    # pyarrow 16 has no extract_regex_all: split on non-alpha runs instead,
    # then drop the <2-char fragments (same token set as the oracle's
    # regexp_extract_all(lower(text), '[a-z]{2,}'))
    toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), "[^a-z]+")
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ids = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), lens)
    keep = pc.greater_equal(pc.utf8_length(flat), 2)
    flat = flat.filter(keep)
    ids = ids[keep.to_numpy(zero_copy_only=False)]
    df = pd.DataFrame({"doc_id": ids, "term": flat.to_pandas()})
    tf = df.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
    return pa.table({
        id_col: pa.array(tf["doc_id"].to_numpy()),
        "term": pa.array(tf["term"], pa.string()),
        "tf": pa.array(tf["tf"].to_numpy().astype(np.int64), pa.int64()),
    })


def tfidf_top_terms(ds, k: int = 3, id_col: str = "doc_id", text_col: str = "text",
                    num_partitions: int | None = None):
    """Per-doc top-k terms by tf-idf (idf = ln(N/df), df = docs containing
    the term). The canonical two-phase shape: (1) per-doc term counts (batch-
    local), (2) DF via partial_groupby over the term stream (only (term, 1)
    partials shuffle), (3) hash-join DF back onto the term stream — at 100 TB
    the DF table is corpus-vocabulary-sized, so a join, not a broadcast —
    (4) grouped top-k with deterministic term tie-break.

    idf is computed with math.log on (N, df) INTEGERS inside a vectorized
    map over the joined stream, so the score is bit-reproducible against the
    SQL oracle's ln()."""
    import math

    import ray

    from ..stages.agg import grouped_top_k, partial_groupby

    terms = ds.map_batches(
        lambda b: terms_batch(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    # ^ reused twice (df + join). Tradeoff, stated: the pinned term stream
    # is corpus-sized-slim ((id, term, tf) rows, ~tens of B each) and rides
    # the object store's spill path at 100 TB; the alternative is
    # recomputing the tokenize pass for each consumer (two full text
    # scans). One spillable slim pass < two corpus scans.
    n_docs = ds.count()
    # vocabulary cardinality is corpus-sized at web scale -> sort-based final
    # (Ray's Aggregate pays ~300x per group when #groups ~ #rows; r5 finding)
    df_tbl = partial_groupby(terms, ["term"], [("doc_id", "count", "df")],
                             final="sort")
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_partitions = max(2, min(16, cpus // 2))
    joined = terms.join(df_tbl, join_type="inner", num_partitions=num_partitions,
                        on=("term",))

    def score(batch: pa.Table) -> pa.Table:
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = batch["df"].to_numpy(zero_copy_only=False)
        # ln over the handful of distinct df values via libm (math.log):
        # bit-identical to the SQL oracle's ln(N/df) with double division
        uniq, inv = np.unique(dfv, return_inverse=True)
        idf = np.array([math.log(n_docs / int(d)) for d in uniq], dtype=np.float64)
        return batch.append_column("tfidf", pa.array(tf * idf[inv], pa.float64()))

    scored = joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_top_k(scored, [id_col], "tfidf", k, descending=True, tie_col="term")


# --- round 3 (cont.): PII redaction + URL/domain analytics --------------------
#
# Both engines (pyarrow.compute and DuckDB) use RE2, so replace/count with the
# SAME pattern string is bit-reproducible. Patterns are applied sequentially
# (email -> ipv4 -> phone) on the progressively redacted text: order matters
# because the phone pattern would otherwise eat IPv4 octets.

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9](?:[ ().-]{0,2}[0-9]){6,12}"


def pii_redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redacts emails / IPv4s / phone-like digit runs (in that order) and
    adds match counts. Fully vectorized: three count_substring_regex + three
    replace_substring_regex kernels per batch, no row loop. The DuckDB oracle
    is the same three-step CTE chain (SQL_PII in entry_queries)."""
    t = batch[text_col]
    n_emails = pc.count_substring_regex(t, PII_EMAIL).cast(pa.int64())
    t = pc.replace_substring_regex(t, PII_EMAIL, "<EMAIL>")
    n_ips = pc.count_substring_regex(t, PII_IPV4).cast(pa.int64())
    t = pc.replace_substring_regex(t, PII_IPV4, "<IP>")
    n_phones = pc.count_substring_regex(t, PII_PHONE).cast(pa.int64())
    t = pc.replace_substring_regex(t, PII_PHONE, "<PHONE>")
    out = batch.drop_columns([text_col])
    out = out.append_column("n_emails", n_emails)
    out = out.append_column("n_ips", n_ips)
    out = out.append_column("n_phones", n_phones)
    return out.append_column("text_redacted", t)


def synth_pii_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Deterministically plants PII derived from doc_id (the synthetic corpus
    contains none): every 3rd doc gets an email, every 5th a phone, every 7th
    an IPv4. The SQL oracle performs the IDENTICAL concat, so the redaction
    patterns are exercised on known-positive text on both sides."""
    ids = batch[id_col].cast(pa.int64())
    idn = ids.to_numpy(zero_copy_only=False)
    s = pc.cast(ids, pa.string())
    empty = pa.scalar("", pa.string())
    email = pc.if_else(pa.array(idn % 3 == 0),
                       pc.binary_join_element_wise(" mail user", s, "@ex-mail.org", ""),
                       empty)
    phone = pc.if_else(pa.array(idn % 5 == 0),
                       pc.binary_join_element_wise(" call +1 (555) 01", s, "-9876", ""),
                       empty)
    ip = pc.if_else(pa.array(idn % 7 == 0),
                    pc.binary_join_element_wise(" host 10.0.", s, ".255 up", ""),
                    empty)
    t = pc.binary_join_element_wise(batch[text_col], email, phone, ip, "")
    return batch.set_column(batch.column_names.index(text_col), text_col, t)


# named group for pyarrow extract_regex; still group 1 for DuckDB's
# regexp_extract(url, pattern, 1) — both RE2
URL_DOMAIN_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?(?P<host>[^/:?#]+)"


def synth_url_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic URL per doc (documents has no url column): doc_id i ->
    https://w{i%7}.site{i%97}.example/p/{i} — same concat in the SQL oracle."""
    ids = batch[id_col].cast(pa.int64())
    idn = ids.to_numpy(zero_copy_only=False)
    s = pc.cast(ids, pa.string())
    url = pc.binary_join_element_wise(
        "https://w", pc.cast(pa.array(idn % 7), pa.string()),
        ".site", pc.cast(pa.array(idn % 97), pa.string()),
        ".example/p/", s, "")
    return batch.append_column("url", url)


def domain_of_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Adds domain: lowercased host extracted with URL_DOMAIN_RE (RE2 capture
    group 1 in both engines; userinfo and port stripped)."""
    dom = pc.extract_regex(pc.utf8_lower(batch[url_col]), URL_DOMAIN_RE)
    return batch.append_column("domain", pc.struct_field(dom, 0))


def line_stats_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals, integer-exact for the SQL oracle:
    n_lines (newline-split segments), n_distinct_lines, n_dup_lines
    (occurrences beyond each line's first). Batch-local: explode lines,
    one pandas groupby-nunique — no row loop."""
    import pandas as pd

    lines = pc.split_pattern(batch[text_col], "\n")
    lens = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
    ids = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), lens)
    flat = pc.list_flatten(lines)
    df = pd.DataFrame({"doc_id": ids, "line": flat.to_pandas()})
    g = df.groupby("doc_id", sort=False)["line"].agg(["size", "nunique"])
    n_lines = g["size"].to_numpy().astype(np.int64)
    n_distinct = g["nunique"].to_numpy().astype(np.int64)
    return pa.table({
        id_col: pa.array(g.index.to_numpy()),
        "n_lines": pa.array(n_lines, pa.int64()),
        "n_distinct_lines": pa.array(n_distinct, pa.int64()),
        "n_dup_lines": pa.array(n_lines - n_distinct, pa.int64()),
    })


_SCRIPTS = [("latin", r"\p{Latin}"), ("cyrillic", r"\p{Cyrillic}"),
            ("han", r"\p{Han}"), ("kana", r"[\p{Hiragana}\p{Katakana}]")]


def script_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Unicode-script profile per doc (the script-detection signal a
    crawl pipeline gates langid with): per-script char counts via RE2
    \\p{Script} classes (vectorized; DuckDB's regexp_extract_all counts the
    identical sets, verified bit-exact) + dominant script with a fixed
    priority tie-break (latin > cyrillic > han > kana — first max wins;
    all-zero docs -> latin)."""
    t = batch[text_col]
    counts = {name: pc.count_substring_regex(t, pat).cast(pa.int64())
              for name, pat in _SCRIPTS}
    arrs = [counts[n].to_numpy(zero_copy_only=False) for n, _ in _SCRIPTS]
    stack = np.stack(arrs)  # (4, n) in priority order
    best = np.zeros(stack.shape[1], dtype=np.int64)
    best_c = stack[0].copy()
    for i in range(1, stack.shape[0]):
        take = stack[i] > best_c
        best = np.where(take, i, best)
        best_c = np.maximum(best_c, stack[i])
    names = np.array([n for n, _ in _SCRIPTS], dtype=object)
    out = batch
    for n, _ in _SCRIPTS:
        out = out.append_column(f"n_{n}", counts[n])
    return out.append_column("dominant_script",
                             pa.array(names[best], pa.string()))


def ngram_repetition_batch(batch: pa.Table, id_col: str = "doc_id",
                           text_col: str = "text", top_ns=(2, 3),
                           dup_n: int = 5) -> pa.Table:
    """Gopher-style word-n-gram repetition fractions (Rae et al. 2021 §A1.1
    quality filters), integer-exact so the SQL oracle replays them:

    - top{n}_chars / top{n}_frac (n in top_ns): characters claimed by the
      MOST FREQUENT word n-gram = count x (sum of its token lengths); ties
      break to the lexicographically smallest gram string.
    - dup{dup_n}_chars / dup{dup_n}_frac: characters of tokens covered by
      ANY word dup_n-gram that occurs more than once in the doc (overlapping
      occurrences count each token once — interval-union semantics).
    - total_chars: sum of token lengths (fraction denominators; docs with
      no tokens emit 0 totals and 0.0 fractions).

    Tokens are maximal [a-z0-9]+ runs of the lowercased text (split on the
    complement, empties dropped — regexp_split_to_array semantics shared
    with the DuckDB oracle). Batch-local and shuffle-free: token explode via
    Arrow kernels, gram keys via vectorized pandas string concat, coverage
    via a numpy running-max over duplicate-start flags (a VALID dup start's
    window never crosses a doc boundary, so no per-doc guard is needed).
    Fractions are int64/int64 double divisions — bit-identical in DuckDB."""
    import pandas as pd

    sep = "\x1f"  # below '0' in ASCII, so gram-string order == token-tuple order
    n_rows = batch.num_rows
    toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), "[^a-z0-9]+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    drow = np.repeat(np.arange(n_rows), lens)
    flat = pc.list_flatten(toks)
    keep = pc.greater(pc.utf8_length(flat), 0)
    flat = flat.filter(keep)
    drow = drow[keep.to_numpy(zero_copy_only=False)]
    clen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    tokpd = flat.to_pandas()
    n_tok = len(drow)
    total = np.zeros(n_rows, dtype=np.int64)
    np.add.at(total, drow, clen)

    def gram_arrays(n: int):
        """(start flat-indices, gram strings, gram char lens) of every
        n-token window whose tokens share one doc."""
        if n_tok < n:
            return (np.zeros(0, np.int64), pd.Series([], dtype=object),
                    np.zeros(0, np.int64))
        valid = drow[:n_tok - n + 1] == drow[n - 1:]
        idx = np.nonzero(valid)[0]
        parts = [tokpd.iloc[idx + j].reset_index(drop=True) for j in range(n)]
        gram = parts[0].str.cat(parts[1:], sep=sep) if n > 1 else parts[0]
        gl = np.zeros(len(idx), np.int64)
        for j in range(n):
            gl += clen[idx + j]
        return idx, gram, gl

    out = {id_col: batch[id_col], "total_chars": pa.array(total, pa.int64())}
    fracs = {}
    denom = np.maximum(total, 1)
    for n in top_ns:
        idx, gram, gl = gram_arrays(int(n))
        topc = np.zeros(n_rows, dtype=np.int64)
        if len(idx):
            df = pd.DataFrame({"d": drow[idx], "g": gram.to_numpy(), "gl": gl})
            cnt = (df.groupby(["d", "g"], sort=False)
                     .agg(c=("gl", "size"), gl=("gl", "first")).reset_index())
            cnt = cnt.sort_values(["d", "c", "g"],
                                  ascending=[True, False, True], kind="mergesort")
            best = cnt.drop_duplicates("d")
            topc[best["d"].to_numpy()] = (best["c"].to_numpy(dtype=np.int64)
                                          * best["gl"].to_numpy(dtype=np.int64))
        out[f"top{n}_chars"] = pa.array(topc, pa.int64())
        fracs[f"top{n}_frac"] = np.where(total > 0, topc / denom, 0.0)

    idx, gram, _ = gram_arrays(int(dup_n))
    dupc = np.zeros(n_rows, dtype=np.int64)
    if len(idx):
        df = pd.DataFrame({"d": drow[idx], "g": gram.to_numpy()})
        occ = df.groupby(["d", "g"], sort=False)["g"].transform("size").to_numpy()
        flag = np.zeros(n_tok, dtype=np.int64)
        flag[idx[occ > 1]] = 1
        pos = np.arange(n_tok)
        last = np.where(flag > 0, pos, -1)
        np.maximum.accumulate(last, out=last)
        covered = (last >= 0) & (last >= pos - (int(dup_n) - 1))
        np.add.at(dupc, drow[covered], clen[covered])
    out[f"dup{dup_n}_chars"] = pa.array(dupc, pa.int64())
    fracs[f"dup{dup_n}_frac"] = np.where(total > 0, dupc / denom, 0.0)
    for name, v in fracs.items():
        out[name] = pa.array(v, pa.float64())
    return pa.table(out)


# PII scrubbing rules, applied IN ORDER (the order is part of the spec —
# the SQL oracle replays the same sequence). RE2-only syntax: pyarrow's
# replace_substring_regex and DuckDB's regexp_replace(…, 'g') are both RE2,
# which is what makes the scrubbed text bit-reproducible cross-engine.
PII_RULES: tuple = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{3}[- ]?\d{3,4}[- ]?\d{4}\b", "<PHONE>"),
)


def scrub_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact emails / IPv4s / phone-shaped numbers from ``text_col``
    (standard corpus-cleaning pass before training). Replaces the text
    column with the scrubbed version and appends one ``n_<rule>`` count per
    rule (counted against the text as it stood when that rule ran —
    sequential application is the contract). Vectorized: one RE2 count +
    one RE2 global replace per rule over the whole Arrow column."""
    cur = batch[text_col]
    counts = {}
    for name, pat, repl in PII_RULES:
        counts[f"n_{name}"] = pc.count_substring_regex(cur, pat).cast(pa.int64())
        cur = pc.replace_substring_regex(cur, pat, repl)
    out = batch.set_column(batch.schema.get_field_index(text_col), text_col, cur)
    for k, v in counts.items():
        out = out.append_column(k, v)
    return out
