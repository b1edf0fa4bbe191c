"""Text-analysis scalar layer for web-text pipelines. Pure Column math.

Everything is expression-only (no Python UDFs): tokenization via
``split``/``filter``, hashing via ``md5`` (stable across engines — the DuckDB
oracle uses the byte-identical formula), folds via ``aggregate``/``transform``.

Hash design: ``tok_hash = int(md5(tok)[:15 hex], 16)`` (60 bits) reduced
mod ``M31 = 2^31 - 1`` before any arithmetic so products stay far from BIGINT
overflow in both Spark (ANSI mode) and DuckDB.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

M31 = 2147483647  # 2^31 - 1, Mersenne prime

# tiny per-language stopword lists for the n-gram/stopword language heuristic.
# Deliberately small + ASCII so the identical lists inline into oracle SQL.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "this"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "pour", "dans", "une", "que"],
    "pt": ["de", "que", "uma", "para", "com", "os", "dos", "mais", "como", "foi"],
    "ja": ["no", "wa", "ni", "wo", "ga", "desu", "shite", "kara", "made", "koto"],
}

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(text: Column) -> Column:
    """lowercased alnum tokens, empties dropped. Same regex as the oracle."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def tokens_sql(text: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({text}), '{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )


def tok_hash(tok: Column) -> Column:
    """60-bit md5-derived hash reduced mod M31. Engine-portable."""
    return (F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long") % F.lit(M31)).cast("long")


def tok_hash_sql(tok: str) -> str:
    return f"(('0x' || substr(md5({tok}), 1, 15))::BIGINT % {M31})"


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def token_count_sql(text: str) -> str:
    return f"CAST(len({tokens_sql(text)}) AS BIGINT)"


# BPE-style pretokenizer count: a letter RUN is one pretoken while every
# digit and every punctuation mark counts alone — the GPT-2 pretokenizer's
# shape reduced to the Java/RE2/Python common regex subset (the real
# pattern's \s+(?!\S) lookahead and contraction alternates are not
# RE2-expressible; this approximation tracks subword-tokenizer counts far
# closer than whitespace counting on code/numeric text, which is what a
# token-budget estimator needs)
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pretokens (JVM ``regexp_count``, no Python)."""
    return F.regexp_count(text, F.lit(BPE_SPLIT_RE)).cast("long")


def bpe_token_count_sql(text: str) -> str:
    return f"CAST(len(regexp_extract_all({text}, '{BPE_SPLIT_RE}')) AS BIGINT)"


def stopword_hits(text: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(arr, t))).cast("long")


def stopword_hits_sql(text: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"CAST(len(list_filter({tokens_sql(text)}, t -> list_contains([{words}], t))) AS BIGINT)"
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish web-text quality heuristic.

    0.4 * stopword-ratio(en) + 0.3 * alnum-char ratio + 0.3 * length factor,
    rounded to 4 dp (cross-engine float hygiene).
    """
    toks = tokens(text)
    ntok = F.size(toks).cast("double")
    sw = stopword_hits(text, "en").cast("double")
    sw_ratio = F.when(ntok > 0, sw / ntok).otherwise(F.lit(0.0))
    nchar = F.length(text).cast("double")
    alnum = F.length(F.regexp_replace(F.lower(text), TOKEN_SPLIT_RE, "")).cast("double")
    alnum_ratio = F.when(nchar > 0, alnum / nchar).otherwise(F.lit(0.0))
    len_factor = F.least(nchar / F.lit(500.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * sw_ratio + F.lit(0.3) * alnum_ratio + F.lit(0.3) * len_factor, 4
    )


def quality_score_sql(text: str) -> str:
    toks = tokens_sql(text)
    sw = stopword_hits_sql(text, "en")
    return (
        f"ROUND(0.4 * (CASE WHEN len({toks}) > 0 THEN CAST({sw} AS DOUBLE) / len({toks}) ELSE 0.0 END) "
        f"+ 0.3 * (CASE WHEN length({text}) > 0 THEN CAST(length(regexp_replace(lower({text}), '{TOKEN_SPLIT_RE}', '', 'g')) AS DOUBLE) / length({text}) ELSE 0.0 END) "
        f"+ 0.3 * LEAST(CAST(length({text}) AS DOUBLE) / 500.0, 1.0), 4)"
    )


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    return [(lang, stopword_hits(text, lang)) for lang in STOPWORDS]


def lang_id(text: Column) -> Column:
    """argmax over per-language stopword hits; ties -> lexicographically
    smallest language code; zero hits everywhere -> 'und'."""
    scores = lang_scores(text)
    pairs = F.array(*[F.struct(s.alias("hits"), F.lit(lang).alias("lang")) for lang, s in scores])
    best = F.array_max(
        F.transform(pairs, lambda p: F.struct(p["hits"].alias("hits"), (-F.ascii(p["lang"])).alias("_o"), p["lang"].alias("lang")))
    )
    # array_max on struct compares fields in order: hits asc, then -ascii(first
    # char) asc == lang desc... we want lexicographically smallest on ties, so
    # compare (hits, negated-rank). Simpler + portable: explicit CASE chain.
    langs = sorted(STOPWORDS)
    expr = F.lit("und")
    best_hits = F.greatest(*[s for _, s in scores])
    for lang in reversed(langs):
        hit = dict(scores)[lang]
        expr = F.when((best_hits > 0) & (hit == best_hits), F.lit(lang)).otherwise(expr)
    return expr


def lang_id_sql(text: str) -> str:
    langs = sorted(STOPWORDS)
    hits = {lang: stopword_hits_sql(text, lang) for lang in langs}
    best = "GREATEST(" + ", ".join(hits[lang] for lang in langs) + ")"
    # same CASE chain, first (lexicographically smallest) winning lang
    cases = " ".join(
        f"WHEN {hits[lang]} = __best THEN '{lang}'" for lang in langs
    )
    return (
        f"(SELECT CASE WHEN __best = 0 THEN 'und' {cases} ELSE 'und' END "
        f"FROM (SELECT {best} AS __best) __b)"
    )


def fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: sum((i+1) * tok_hash_i) mod M31.

    Position-weighted so permuted documents differ; bounded (< 2^59) so the
    arithmetic is exact in both engines.
    """
    hs = F.transform(tokens(text), lambda t, i: (i + F.lit(1)).cast("long") * tok_hash(t))
    return (F.aggregate(hs, F.lit(0).cast("long"), lambda acc, h: acc + h) % F.lit(M31)).cast(
        "long"
    )


def fingerprint_sql(text: str) -> str:
    # COALESCE: list_sum([]) is NULL in DuckDB but the Spark fold starts at 0.
    # CAST: list_sum widens to HUGEINT, which the driver hashes differently
    # from Spark's BIGINT even when values are equal.
    return (
        f"CAST((COALESCE(list_sum(list_transform({tokens_sql(text)}, "
        f"(t, i) -> i * {tok_hash_sql('t')})), 0) % {M31}) AS BIGINT)"
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram strings (space-joined), sorted — the near-dup unit.

    Built with slice + zip_with (elementwise, one tokenization per slice).
    The naive ``element_at(tokens(text), i)``-per-gram formulation re-runs
    the whole tokenizer for every element_at (higher-order lambdas are
    interpreted, no common-subexpression elimination) — measured O(tokens^2)
    per row and ~50x slower.
    """
    toks = tokens(text)
    k = F.size(toks) - F.lit(n - 1)

    def build(kk: Column) -> Column:
        acc = F.slice(toks, 1, kk)
        for j in range(1, n):
            acc = F.zip_with(
                acc,
                F.slice(toks, j + 1, kk),
                lambda x, y: F.concat(x, F.lit(" "), y),
            )
        return acc

    grams = F.when(k > 0, build(k)).otherwise(F.array().cast("array<string>"))
    return F.array_sort(F.array_distinct(grams))


def shingles_sql(text: str, n: int = 3) -> str:
    toks = tokens_sql(text)
    parts = " || ' ' || ".join(f"__t[i + {j}]" for j in range(n))
    return (
        f"list_sort(list_distinct((SELECT CASE WHEN len(__t) >= {n} THEN "
        f"list_transform(generate_series(1, len(__t) - {n - 1}), i -> {parts}) "
        f"ELSE [] END FROM (SELECT {toks} AS __t) __s)))"
    )


def minhash_sig(shingle_arr: Column, num_hashes: int = 16) -> Column:
    """array<long> minhash signature over shingle strings.

    Universal-hash family h_i(s) = (a_i * tok_hash(s) + b_i) mod M31 with
    fixed seeded coefficients; empty shingle set -> all M31 (sentinel max).
    """
    return minhash_sig_from_hashes(F.transform(shingle_arr, tok_hash), num_hashes)


def minhash_sig_from_hashes(hash_arr: Column, num_hashes: int = 16) -> Column:
    """Signature over a PRE-HASHED array<long>. Callers should materialize the
    md5 hashes into a real column first — inlining ``tok_hash`` here would
    recompute the md5 of every shingle ``num_hashes`` times (measured ~10x
    cost of the whole LSH stage)."""
    coeffs = _minhash_coeffs(num_hashes)
    sig = []
    for a, b in coeffs:
        mapped = F.transform(hash_arr, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(M31))
        sig.append(F.coalesce(F.array_min(mapped), F.lit(M31).cast("long")).alias("m"))
    return F.array(*sig)


def minhash_sig_vec(shingle_arr: Column, num_hashes: int = 16) -> Column:
    """``minhash_sig`` as ONE vectorized pandas UDF — bit-identical values.

    Why: the expression form computes JVM ``md5`` per shingle, and
    ``MessageDigest.getInstance`` serializes across task threads (the same
    lock that froze geotag scaling, see operators/geotag.py), plus a
    num_hashes-wide affine-map expression tree. Here hashlib runs at C
    speed in one process per core and the affine maps + min collapse to a
    single (shingles x hashes) numpy broadcast. The DuckDB oracle formula
    is unchanged — values match the expression form exactly
    (tests/test_dedup.py asserts the driver pair)."""
    coeffs = _minhash_coeffs(num_hashes)
    a = np.array([c[0] for c in coeffs], dtype=np.int64)
    b = np.array([c[1] for c in coeffs], dtype=np.int64)
    empty = np.full(num_hashes, M31, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def _sig(col: pd.Series) -> pd.Series:
        out = []
        for sh in col:
            if sh is None or len(sh) == 0:
                out.append(empty)
                continue
            hs = np.fromiter(
                (
                    int(hashlib.md5(x.encode("utf-8")).hexdigest()[:15], 16) % M31
                    for x in sh
                ),
                dtype=np.int64,
                count=len(sh),
            )
            out.append(((a[None, :] * hs[:, None] + b[None, :]) % M31).min(axis=0))
        return pd.Series(out)

    return _sig(shingle_arr)


def _minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    # fixed LCG-derived coefficients (deterministic, engine-independent)
    coeffs, state = [], 88172645463325252
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = state % (M31 - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % M31
        coeffs.append((a % 65521 + 1, b % M31))  # keep a small: a*h < 2^47
    return coeffs


def simhash(text: Column, bits: int = 32) -> Column:
    """SimHash over token hashes: bit j set iff sum over tokens of
    (+1 if bit j of tok_hash else -1) > 0. 32 bits (tok_hash is mod M31)."""
    hs = F.transform(tokens(text), tok_hash)
    seq = F.sequence(F.lit(0), F.lit(bits - 1))
    zero = F.array_repeat(F.lit(0).cast("long"), bits)
    # single fold over tokens accumulating a 32-wide vote vector (one pass;
    # the naive per-bit version compiles 32 independent folds and is ~10x
    # slower to codegen+run)
    votes = F.aggregate(
        hs,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            seq,
            lambda a, j: a
            + F.when(
                F.floor(h.cast("double") / F.pow(F.lit(2.0), j.cast("double"))).cast("long") % 2
                == 1,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        ),
    )
    weights = F.transform(seq, lambda j: F.pow(F.lit(2.0), j.cast("double")).cast("long"))
    return F.aggregate(
        F.zip_with(votes, weights, lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )


def simhash_vec(tokens_arr: Column, bits: int = 32) -> Column:
    """``simhash`` over a pre-tokenized array<string> as ONE vectorized
    pandas UDF — bit-identical values (tests assert against the expression
    form). Tokenization stays in the expression layer (split/filter
    semantics must match the SQL oracle); only the MessageDigest-lock-bound
    md5 hashing and the vote fold move to hashlib + numpy."""
    jbits = np.arange(bits, dtype=np.int64)

    @F.pandas_udf("long")
    def _sh(col: pd.Series) -> pd.Series:
        out = np.zeros(len(col), dtype=np.int64)
        for i, toks in enumerate(col):
            if toks is None or len(toks) == 0:
                continue
            hs = np.fromiter(
                (
                    int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16) % M31
                    for t in toks
                ),
                dtype=np.int64,
                count=len(toks),
            )
            votes = (((hs[:, None] >> jbits[None, :]) & 1) * 2 - 1).sum(axis=0)
            out[i] = int(((votes > 0).astype(np.int64) << jbits).sum())
        return pd.Series(out)

    return _sh(tokens_arr)


def simhash_sql(text: str, bits: int = 32) -> str:
    toks = tokens_sql(text)
    hs = f"list_transform({toks}, t -> {tok_hash_sql('t')})"
    terms = []
    for j in range(bits):
        vote = (
            f"list_sum(list_transform(__h, h -> CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN COALESCE({vote}, 0) > 0 THEN {1 << j}::BIGINT ELSE 0 END)")
    return f"(SELECT {' + '.join(terms)} FROM (SELECT {hs} AS __h) __sh)"
