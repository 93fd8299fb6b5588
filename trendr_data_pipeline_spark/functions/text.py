"""Text functions ST1–ST12 (SURVEY §2.7).

Builtin ``pyspark.sql.functions`` everywhere the semantics allow —
those stay inside whole-stage codegen. Three functions need exact
parity with Python stdlib behavior (unicodedata NFD, difflib
SequenceMatcher, char-trigram sets) and are vectorized pandas UDFs:
they are the *only* Python on the text path, and each call sites them
after filters/dedup so the slow path sees minimal rows.
"""

from __future__ import annotations

import difflib
import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# ST1 — normalize (reference scripts/mention_scanner/matching.py:19-72)
# ---------------------------------------------------------------------------

#: ordered variation rewrites applied after lowercasing, before
#: punctuation stripping (reference matching.py:36-66)
_VARIATIONS = [
    ("’", "'"),
    ("'", ""),
    ("`", ""),
    ("café", "cafe"),
    ("cafés", "cafes"),
    ("œ", "oe"),
    ("æ", "ae"),
    (" & ", " and "),
    ("&", "and"),
    (" st ", " saint "),
    (" ste ", " sainte "),
]

_RE_PUNCT = re.compile(r"[^\w\s]")
_RE_WS = re.compile(r"\s+")


def _normalize_py(text: str | None) -> str:
    """Exact reimplementation of the reference's `_normalize_core`
    (matching.py:19-34): NFD accent strip → variation rewrites →
    punctuation→space → whitespace collapse → lower/strip."""
    if not text:
        return ""
    text = unicodedata.normalize("NFD", text)
    text = "".join(c for c in text if unicodedata.category(c) != "Mn")
    text = text.lower()
    for old, new in _VARIATIONS:
        text = text.replace(old, new)
    text = _RE_PUNCT.sub(" ", text)
    text = _RE_WS.sub(" ", text)
    return text.lower().strip()


def _normalize_series(s: pd.Series) -> pd.Series:
    return s.map(_normalize_py)


def normalize_text(col: Column) -> Column:  # ST1 (exact)
    """pandas-UDF wrapper built at call time — module import stays
    session-free so executors can re-import this module."""
    return F.pandas_udf(_normalize_series, "string")(col)


def normalize_text_fast(col: Column) -> Column:
    """Builtin-only approximation of ST1 for the 100 TB hot path:
    accent strip via explicit `translate` of the Latin-1/Latin-Ext
    range instead of full NFD. Per-character parity with
    :func:`normalize_text` is pinned by tests for every char in the
    table except ``ł`` and ``ı``, which have no NFD decomposition (the
    exact path keeps them verbatim; the fast path folds them to l/i —
    the more useful mapping for cross-source name matching, and the
    documented approximation boundary)."""
    src = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿāăąćčďēĕėęěğīįıłńňōŏőřśšťūůűźżž"
    dst = "aaaaaaceeeeiiiinooooouuuuyyaaaccdeeeeegiiilnnooorsstuuuzzz"
    c = F.lower(col)
    c = F.translate(c, "’`'", "")
    c = F.translate(c, src, dst)
    c = F.regexp_replace(c, r"œ", "oe")
    c = F.regexp_replace(c, r"æ", "ae")
    c = F.regexp_replace(c, r" & | ?& ?", " and ")
    c = F.regexp_replace(c, r" st ", " saint ")
    c = F.regexp_replace(c, r" ste ", " sainte ")
    c = F.regexp_replace(c, r"[^\w\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


# ---------------------------------------------------------------------------
# ST2 — trigram similarity (reference scoring.py:250-267; padding '  s  ')
# ---------------------------------------------------------------------------


def _trigrams(s: str) -> set[str]:
    s = f"  {s.lower()}  "
    return {s[i : i + 3] for i in range(len(s) - 2)}


def _trigram_sim_py(a: str | None, b: str | None) -> float:
    if not a or not b:
        return 0.0
    ta, tb = _trigrams(a), _trigrams(b)
    if not ta or not tb:
        return 0.0
    union = len(ta | tb)
    return len(ta & tb) / union if union else 0.0


def _trigram_sim_series(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([_trigram_sim_py(x, y) for x, y in zip(a, b)])


def trigram_similarity(a: Column, b: Column) -> Column:  # ST2 (exact)
    return F.pandas_udf(_trigram_sim_series, "double")(a, b)


# ---------------------------------------------------------------------------
# ST3 — fuzzy ratio (reference scoring.py:219: difflib SequenceMatcher)
# ---------------------------------------------------------------------------


def _fuzzy_py(a: str | None, b: str | None) -> float:
    if not a or not b:
        return 0.0
    return difflib.SequenceMatcher(None, a.lower(), b.lower()).ratio()


def _fuzzy_series(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([_fuzzy_py(x, y) for x, y in zip(a, b)])


def fuzzy_ratio(a: Column, b: Column) -> Column:  # ST3 (exact)
    return F.pandas_udf(_fuzzy_series, "double")(a, b)


# ---------------------------------------------------------------------------
# ST5 — stopword removal (reference scoring.py:270-279)
# ---------------------------------------------------------------------------

KISS_STOPWORDS = [
    "le", "la", "les", "du", "de", "des", "un", "une", "et", "ou",
    "restaurant", "cafe", "bar", "chez", "aux", "au", "paris",
]


def remove_stopwords(col: Column, stopwords: list[str] | None = None) -> Column:
    """Drop stopwords and words ≤2 chars; rejoin with single spaces.
    Pure builtins: split → higher-order filter → array_join."""
    sw = F.array(*[F.lit(w) for w in (stopwords or KISS_STOPWORDS)])
    words = F.split(F.lower(col), r"\s+")
    kept = F.filter(words, lambda w: (~F.array_contains(sw, w)) & (F.length(w) > 2))
    return F.array_join(kept, " ")


# ---------------------------------------------------------------------------
# ST4 — name score (reference scoring.py:209-230)
# ---------------------------------------------------------------------------


def _name_score_py(poi_name: str | None, title: str | None, snippet: str | None) -> float:
    """Direct transcription of the reference's
    `_calculate_name_score_kiss` (scoring.py:209-230)."""
    if not poi_name:
        return 0.0
    text = f"{title or ''} {snippet or ''}"
    if not text.strip():
        return 0.0
    fuzzy = difflib.SequenceMatcher(None, poi_name.lower(), text.lower()).ratio()
    tri = _trigram_sim_py(poi_name, text)
    sw = set(KISS_STOPWORDS)
    strip = lambda s: " ".join(w for w in s.lower().split() if w not in sw and len(w) > 2)  # noqa: E731
    np_, nt = strip(poi_name), strip(text)
    if np_ and nt:
        fuzzy = max(fuzzy, difflib.SequenceMatcher(None, np_.lower(), nt.lower()).ratio())
    return max(fuzzy, tri)


def name_score(poi_name: Column, title: Column, snippet: Column) -> Column:
    """ST4 — max(fuzzy(poi, title+snippet), fuzzy(stopword-stripped),
    trigram). ONE fused pandas UDF (a composition of three separate
    UDF calls costs 3× the Arrow transfers and interleaves JVM
    expression trees between Python stages)."""

    def batch(p: pd.Series, t: pd.Series, s: pd.Series) -> pd.Series:
        return pd.Series([_name_score_py(a, b, c) for a, b, c in zip(p, t, s)])

    return F.pandas_udf(batch, "double")(poi_name, title, snippet)


# ---------------------------------------------------------------------------
# ST6 — URL normalization (reference scanner.py:864-883)
# ---------------------------------------------------------------------------


def normalize_url(col: Column) -> Column:
    """Strip #fragment, utm_* params, collapse '?&'→'?', drop trailing
    slash — regexp_replace chain, no UDF."""
    c = F.regexp_replace(col, r"#.*$", "")
    c = F.regexp_replace(c, r"[?&]utm_(source|medium|campaign|content|term)=[^&]*", "")
    c = F.regexp_replace(c, r"\?&", "?")
    c = F.regexp_replace(c, r"/+$", "")
    return c


# ---------------------------------------------------------------------------
# ST7 — dedupe_key (reference dedup.py:18-45)
# ---------------------------------------------------------------------------


def _dedupe_host_stem(url: Column) -> tuple[Column, Column]:
    """(host, bare path stem): extension and -partN/-update/-vN/-digit
    suffixes stripped — the state the reference holds BEFORE choosing
    between the override pattern and language normalization
    (dedup.py:25-44)."""
    host = F.parse_url(url, F.lit("HOST"))
    path = F.regexp_replace(F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")), r"/+$", "")
    stem = F.regexp_replace(path, r"\.[^/]*$", "")
    stem = F.regexp_replace(stem, r"-(part\d+|update|v\d+|\d+)$", "")
    return F.coalesce(host, F.lit("")), stem


def dedupe_key(url: Column) -> Column:
    """netloc + path-stem: strip extension, -partN/-update/-vN/-digits
    suffixes, and leading language/country path prefixes (the default,
    no-override branch of reference dedup.py:42-44)."""
    host, stem = _dedupe_host_stem(url)
    stem = F.regexp_replace(
        stem, r"^/(?:us|uk|ca|au|br|de|it|es|fr)/(?:en|fr|de|it|es|pt_BR|pt)/", "/"
    )
    stem = F.regexp_replace(stem, r"^/(?:en|fr|de|it|es|pt)/", "/")
    return F.concat(host, stem)


def dedupe_key_override(url: Column, pattern: Column, replacement: Column) -> Column:
    """ST7 per-source override branch (reference dedup.py:36-41): the
    custom regex rewrites the BARE path stem — language normalization
    does NOT run for override sources.

    The reference's default replacement is ``\\1`` and it swallows
    ``re.sub`` errors, so a pattern with no capture group leaves the
    stem unchanged; here that guard is the expression ``has unescaped
    '(' OR replacement references no group`` (a group-referencing
    replacement over a groupless pattern would otherwise throw in
    Java's regex engine). Python-style ``\\N`` group references in
    stored replacements are translated to Java's ``$N``."""
    host, stem = _dedupe_host_stem(url)
    repl = F.coalesce(replacement, F.lit("$1"))
    # stored configs use Python \N syntax; Java wants $N
    repl = F.regexp_replace(repl, r"\\(\d)", r"\$$1")
    has_group = pattern.rlike(r"(^|[^\\])\(")
    refs_group = repl.contains("$")
    overridden = F.regexp_replace(stem, pattern, repl)
    safe = F.when(has_group | ~refs_group, overridden).otherwise(stem)
    return F.concat(host, safe)


# ---------------------------------------------------------------------------
# ST8 — domain_of / apex (reference domains.py:13-100)
# ---------------------------------------------------------------------------


def domain_of(url: Column, display_link: Column | None = None) -> Column:
    """Host of the url (scheme-defaulted), displayLink fallback,
    strip leading www."""
    with_scheme = F.when(url.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), url).otherwise(
        F.concat(F.lit("https://"), url)
    )
    host = F.parse_url(with_scheme, F.lit("HOST"))
    if display_link is not None:
        host = F.coalesce(host, display_link)
    return F.lower(F.regexp_replace(host, r"^www\.", ""))


def apex_domain(host: Column) -> Column:
    """Last two labels of the hostname (reference domains.py apex)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(n <= 2, host).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    )


# ---------------------------------------------------------------------------
# ST10 — slug transforms (reference ai/collection_generator.py:359-362)
# ---------------------------------------------------------------------------


def slugify(col: Column) -> Column:
    c = F.lower(col)
    c = F.regexp_replace(c, r"ème", "e")
    c = F.regexp_replace(c, r"[^a-z0-9]+", "-")
    c = F.regexp_replace(c, r"^-+|-+$", "")
    return c


# ---------------------------------------------------------------------------
# ST11 — country from address tail (reference google_places_ingester.py:297-309)
# ---------------------------------------------------------------------------


def country_from_address(col: Column) -> Column:
    last = F.element_at(F.split(col, r", "), -1)
    return F.when(F.length(last) > 2, last).otherwise(F.lit(None).cast("string"))


# ---------------------------------------------------------------------------
# Tokenization / n-gram helpers (shared by text analysis + dedup ops)
# ---------------------------------------------------------------------------

#: BPE-ish token regex: word pieces, numbers, or single non-space symbols
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokens, empty strings removed."""
    return F.filter(F.split(col, r"\s+"), lambda w: F.length(w) > 0)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count via regexp extraction (letters runs,
    digit runs, isolated symbols)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), 0))


def word_ngrams(col: Column, n: int = 2) -> Column:
    """Array of word n-grams ('a b', 'b c', …) built with builtins:
    transform over index positions, then filter trailing partials."""
    ws = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(-1)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(ws, (i + j + 1).cast("int")) for j in range(n)])
    )
