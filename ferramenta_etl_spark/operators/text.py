"""Text-analysis operators for training-data pipelines.

Language ID (marker-token heuristic), quality scoring, token counting,
and content fingerprinting — all pure SQL expressions (regexp/array
functions), so they run inside whole-stage codegen at full scan speed;
no Python in the hot path. Each has an exact DuckDB-oracle counterpart
in plans/extensions.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker tokens per language, derived from the corpus' distinctive token
# frequencies. Order of LANGS is the deterministic tiebreak (alphabetical).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("small", "data", "scan", "line"),
    "en": ("column", "sort", "key", "window"),
    "es": ("column", "line", "part", "hash"),
    "fr": ("order", "sort", "query", "group"),
    "zh": ("group", "order", "merge", "vector"),
}
LANGS = tuple(sorted(LANG_MARKERS))

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "on")

# "BPE-ish" tokenizer regex: letter runs | single digits | single
# non-alphanumeric marks — a crude proxy for subword token counts.
BPE_ISH_RE = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens, lowercased. Single-space split kept identical
    to the oracle's string_split."""
    return F.split(F.lower(text), " ")


def marker_score(text: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens of ``text`` are in the marker set (with
    multiplicity)."""
    return F.size(F.filter(ws_tokens(text), lambda t: t.isin(*markers)))


def lang_id(text: Column) -> Column:
    """Predicted language = argmax of marker scores, alphabetical-first
    tiebreak — deterministic by construction."""
    scores = {lang: marker_score(text, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    expr = F.lit(None).cast("string")
    for lang in reversed(LANGS):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return expr


def n_tokens(text: Column) -> Column:
    return F.size(ws_tokens(text))


def bpe_ish_count(text: Column) -> Column:
    return F.regexp_count(F.lower(text), F.lit(BPE_ISH_RE))


def digit_ratio(text: Column) -> Column:
    return F.length(F.regexp_replace(text, "[^0-9]", "")).cast("double") / F.length(text)


def punct_ratio(text: Column) -> Column:
    return (
        F.length(F.regexp_replace(F.lower(text), "[a-z0-9 ]", "")).cast("double")
        / F.length(text)
    )


def stopword_ratio(text: Column) -> Column:
    stops = F.size(F.filter(ws_tokens(text), lambda t: t.isin(*STOPWORDS)))
    return stops.cast("double") / n_tokens(text).cast("double")


def avg_token_len(text: Column) -> Column:
    compact = F.length(F.replace(text, F.lit(" "), F.lit("")))
    return compact.cast("double") / n_tokens(text).cast("double")


def quality_score(text: Column) -> Column:
    """Composite quality score in [0, 1]: favors prose-like stopword
    density, penalizes digit/punctuation noise, rewards length up to 100
    tokens. Expression order fixed so both engines compute bit-identical
    doubles."""
    length_factor = F.least(n_tokens(text).cast("double") / 100.0, F.lit(1.0))
    return (
        stopword_ratio(text) * 0.3
        + (1.0 - digit_ratio(text)) * 0.3
        + (1.0 - punct_ratio(text)) * 0.2
        + length_factor * 0.2
    )


def content_fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set. Robust to token reordering — pairs docs that are shuffles
    of each other; 32-byte digest is what shuffles, not the text."""
    toks = F.array_sort(F.array_distinct(ws_tokens(text)))
    return F.md5(F.concat_ws(" ", toks))


def winnowing_fingerprints(text: Column, k: int = 3, window: int = 4) -> Column:
    """Rolling-hash document fingerprints by winnowing (the MOSS scheme):
    hash every k-token shingle with the polynomial rolling hash
    (operators/dedup.shingle_hashes), slide a ``window`` over the hash
    sequence, keep each window's minimum, distinct the selections.

    The winnowing guarantee: any shared token run of length >=
    ``window + k - 1`` between two documents produces at least one
    SHARED fingerprint — which makes the fingerprints joinable for
    partial-overlap detection (explode -> equi-join on the hash), unlike
    a whole-document digest. Docs shorter than one window keep the
    minimum of what they have; sub-k-token docs fingerprint to an empty
    set (no shingles), like empty sets in set-similarity.

    Pure SQL higher-order expressions; selections-per-doc ~= 2/(window+1)
    of the shingle count, so the exploded join input is a fraction of
    the token stream."""
    from .dedup import shingle_hashes

    h = shingle_hashes(text, k)
    n_win = F.greatest(F.size(h) - F.lit(window - 1), F.least(F.size(h), F.lit(1)))
    mins = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda i: F.array_min(F.slice(h, i, window)),
    )
    # sequence(1, 0) would count DOWN; route the empty case explicitly
    return F.array_sort(
        F.array_distinct(
            F.when(F.size(h) > 0, mins).otherwise(F.array().cast("array<bigint>"))
        )
    )
