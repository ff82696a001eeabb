"""Text-analysis expressions for large-scale training-data pipelines.

Beyond-reference surface (the reference system has no text analytics;
these are the operators a 100 TB document pipeline needs): token
counting, quality scoring, n-gram shingling, language-ID heuristics,
and document fingerprinting. All built-in-expression based — at 100 TB
these run inside whole-stage codegen over the parquet scan, with no
Python in the row path.

Portability note: fingerprints/minhashes are built from ``md5`` hex
(identical across Spark, DuckDB, and most engines) rather than
engine-private hash functions, so results are verifiable against a SQL
oracle bit-for-bit. Lexicographic MIN over fixed-width hex equals
numeric MIN, so a minhash can stay a string end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny multilingual stopword seed lists for the lang-id heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr": ("le", "la", "les", "et", "est", "pas", "une", "des", "dans", "que"),
    "es": ("el", "la", "los", "que", "de", "no", "una", "por", "con", "para"),
    "it": ("il", "la", "che", "di", "non", "una", "per", "con", "del", "sono"),
}

EN_STOPWORDS = LANG_MARKERS["en"]


def tokens(c: Column) -> Column:
    """Whitespace tokenization -> array<string>, empties removed."""
    arr = F.split(F.trim(c), r"\s+")
    return F.filter(arr, lambda t: t != "")


def token_count(c: Column) -> Column:
    """Whitespace token count (long)."""
    return F.size(tokens(c)).cast("bigint")


def bpe_ish_token_count(c: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punctuation boundaries — a cheap, deterministic proxy
    for a BPE tokenizer's token count (regex segmentation; counts runs
    of letters, runs of digits, and individual punctuation marks).
    """
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0)
    return F.size(pieces).cast("bigint")


def punct_ratio(c: Column) -> Column:
    """share of non-space chars that are punctuation/symbols (double)."""
    nonspace = F.length(F.regexp_replace(c, r"\s", ""))
    punct = F.length(F.regexp_replace(c, r"[\sA-Za-z0-9]", ""))
    return F.when(nonspace > 0, punct.cast("double") / nonspace.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(c: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """share of tokens that are (lowercase) stopwords (double)."""
    toks = tokens(F.lower(c))
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    total = F.size(toks)
    return F.when(total > 0, hits.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def mean_token_len(c: Column) -> Column:
    toks = tokens(c)
    total_chars = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t).cast("bigint")
    )
    return F.when(F.size(toks) > 0, total_chars.cast("double") / F.size(toks).cast("double")).otherwise(
        F.lit(0.0)
    )


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, not
    punctuation-soup, contains stopwords, sane mean token length.
    Deterministic and SQL-expressible (oracle-checkable).
    """
    len_ok = F.least(F.length(c).cast("double") / F.lit(200.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(c) * 4.0, F.lit(1.0))
    stop_ok = F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    tok_len = mean_token_len(c)
    tok_ok = F.when((tok_len >= 3.0) & (tok_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_ok * 0.3 + punct_ok * 0.2 + stop_ok * 0.3 + tok_ok * 0.2).alias("quality")


def lang_id(c: Column) -> Column:
    """Stopword-marker language ID over {en,de,fr,es,it}; 'und' when no
    marker hits. Greedy argmax with deterministic tie-break by language
    code order (the WHEN-chain encodes strict '>' so earlier languages
    win ties).
    """
    toks = tokens(F.lower(c))

    def marker_hits(markers: tuple[str, ...]):
        # NB: the higher-order lambda must be unary — pyspark treats
        # extra (even defaulted) parameters as lambda variables.
        wordlist = list(markers)
        return F.size(F.filter(toks, lambda t: t.isin(wordlist)))

    scores = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        s = scores[lang]
        is_better = s > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best


def char_shingles(c: Column, k: int = 8) -> Column:
    """All k-char shingles of the lowercased text -> array<string>.

    Built with ``sequence`` + ``transform`` (JVM-side); at 100 TB this
    is the explode input for minhash — no Python involved.
    """
    s = F.lower(c)
    n = F.length(s)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.when(n >= k, F.transform(idx, lambda i: s.substr(i, F.lit(k)))).otherwise(F.array(s))


def word_shingles(c: Column, n: int = 3) -> Column:
    """Word n-grams (space-joined) -> array<string>; whole text when
    shorter than n tokens."""
    toks = tokens(F.lower(c))
    cnt = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(cnt - F.lit(n - 1), F.lit(1)))
    gram = lambda i: F.array_join(F.slice(toks, i, n), " ")  # noqa: E731
    return F.when(cnt >= n, F.transform(idx, gram)).otherwise(F.array(F.array_join(toks, " ")))


def fingerprint(c: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized,
    lowercased text. Exact-dup detection key (content hash), portable
    across engines.
    """
    normalized = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.md5(normalized)


def repetition_ratio(c: Column, n: int = 2) -> Column:
    """Duplicate word-n-gram fraction (Gopher-style repetition
    signal): 1 - distinct_ngrams/total_ngrams. High values flag
    boilerplate/spam; 0 when every n-gram is unique."""
    grams = word_shingles(c, n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.when(
        total > 0, F.lit(1.0) - distinct.cast("double") / total.cast("double")
    ).otherwise(F.lit(0.0))


# --- PII scrubbing ---------------------------------------------------------
# Training corpora are scrubbed of direct identifiers before use; the
# two regexes below are the deterministic, cross-engine-portable core
# (same RE semantics in Java regex and RE2). Real deployments layer
# NER models on top — that stage is external to the engine, like the
# multimodal decoders.

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"


def pii_email_count(c: Column) -> Column:
    return F.regexp_count(c, F.lit(EMAIL_RE)).cast("bigint")


def pii_phone_count(c: Column) -> Column:
    return F.regexp_count(c, F.lit(PHONE_RE)).cast("bigint")


def redact_pii(c: Column) -> Column:
    """Replace every email/phone occurrence with a typed placeholder.
    Order matters: emails first, so a phone-like digit run inside an
    address is consumed by the email rule."""
    out = F.regexp_replace(c, EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(out, PHONE_RE, "[PHONE]")


# Windows-1252's 27 printable specials (bytes 0x80–0x9F) and the C1
# control characters those bytes decode to under Latin-1. Real-world
# mojibake shows the SPECIALS (web stacks decode bad bytes as cp1252,
# not ISO-8859-1): '’' double-encodes to 'â€™', not 'â\x80\x99'.
# Folding specials → C1 before the Latin-1 encode is the
# "sloppy-windows-1252" bridge ftfy uses, expressed as a translate()
# so we never need a non-standard JVM charset (Spark 4's encode/decode
# only accept the java.nio standard set without a legacy flag).
CP1252_SPECIALS = (
    "€‚ƒ„…†‡ˆ‰Š"
    "‹ŒŽ‘’“”•–—"
    "˜™š›œžŸ"
)
CP1252_C1 = (
    "\x80\x82\x83\x84\x85\x86\x87\x88\x89\x8a"
    "\x8b\x8c\x8e\x91\x92\x93\x94\x95\x96\x97"
    "\x98\x99\x9a\x9b\x9c\x9e\x9f"
)


def fix_mojibake(c: Column) -> Column:
    """Repair UTF-8-read-as-cp1252/Latin-1 mojibake (``cafÃ©`` →
    ``café``, ``donâ€™t`` → ``don’t``) — the most common encoding
    corruption in web corpora; the inverse transcode is what ftfy's
    default pass applies. Pure JVM expressions: cp1252 specials are
    folded to their C1 bytes with ``translate``, then
    ``decode(encode(s, ISO-8859-1), UTF-8)`` — applied only when
    (a) the text shows a mojibake marker character — any UTF-8
    lead byte read as Latin-1/cp1252, i.e. U+00C2–U+00F4 (``Ã``, ``â``,
    ``å``/``æ`` for CJK, ``ð`` for emoji/astral 4-byte sequences) — a
    cheap prefilter, since (b) every character
    is Latin-1/cp1252-representable (Spark 4's ``encode`` throws
    MALFORMED_CHARACTER_CODING on unmappable chars — e.g. a stray
    emoji or CJK char next to an ``Ã`` marker), and (c) the
    folded byte reading is valid UTF-8 (``is_valid_utf8`` guards the
    equally-throwing ``decode``). Genuinely accented text fails (c) —
    a lone 0xE9 byte is not valid UTF-8 — so it passes through
    untouched.

    The throwing expressions sit in NESTED ``when`` branches, not
    conjuncts (ADVICE r7 #3): CaseWhen evaluates only the taken
    branch, a documented guarantee, whereas ``And``'s left-to-right
    short-circuit is an implementation detail a future optimizer rule
    could reorder or speculate."""
    folded = F.translate(c, CP1252_SPECIALS, CP1252_C1)
    b = F.encode(folded, "ISO-8859-1")
    representable = ~c.rlike("[^\\x00-\\xff" + CP1252_SPECIALS + "]")
    return F.when(
        c.rlike("[Â-ô]") & representable,
        # encode/is_valid_utf8/decode are reachable ONLY on rows proven
        # representable by the outer branch
        F.when(F.is_valid_utf8(b), F.decode(b, "UTF-8")).otherwise(c),
    ).otherwise(c)
