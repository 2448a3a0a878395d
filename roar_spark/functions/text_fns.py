"""Text-analysis column expressions: tokenization, shingling, portable
hashing. All built-in Catalyst expressions (split/transform/md5) — the
same primitives the DuckDB oracles mirror, so results hash-match exactly.

Portable-hash design note: cross-engine minhash/simhash needs a hash both
engines compute identically. Integer hashes differ (Spark xxhash64 vs
DuckDB's hash), but ``md5`` of a UTF-8 string is standard everywhere, so:

- minhash uses MIN over *hex-string prefixes* of salted md5 — string min is
  total-ordered and portable, no hex→int conversion needed;
- simhash extracts bits arithmetically from md5 hex digits via
  ``strpos('0123456789abcdef', digit)`` (1-based in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"

# Explode fan-out estimate for per-token/per-shingle row tables built from
# this corpus family's documents: ~60-token docs yield ~58 word-3-grams and
# ~60 tokens per row, rounded up to 64. Shared by every operator that sizes
# its shuffle width from `n_docs * SHINGLE_FANOUT` (dedup shingle tables,
# explode-heavy text aggregations) so the estimate and its rationale live
# in one place (ADVICE r5). The derived width is clamped in
# session.shuffle_width_for, so moderate over/under-estimates only shift
# task granularity, never correctness.
SHINGLE_FANOUT = 64


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens (DuckDB: string_split_regex)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Overlapping word n-grams as space-joined strings. Caller filters
    docs with fewer than ``n`` tokens (F.sequence would run backwards)."""
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)]),
    )


def minhash_str(shingle: Column, salt: int, width: int = 16) -> Column:
    """Salted md5 hex prefix — the per-shingle value whose MIN is the
    minhash component. Pure strings end to end (portable)."""
    return F.substring(F.md5(F.concat(F.lit(f"{salt}|"), shingle)), 1, width)


def minhash_signed_sql(md5_col: str) -> str:
    """SQL snippet: the 16-hex-char prefix of ``md5_col`` as a SIGNED long
    whose signed order equals the hex string's lexicographic order.

    Why: ``min(string)`` is not hash-aggregable — Spark plans the minhash
    signature aggregation as a SortAggregate, sorting the whole shingle
    table twice (partial + final). A long min runs as a HashAggregate
    (no sorts) and its shuffle rows are 8 B where the 16-char string is
    ~2.2x wider (guide §2.3 "narrower types").

    Construction: the prefix's unsigned 64-bit value u, reinterpreted as
    a signed long with the top bit flipped (s = u XOR 2^63), preserves
    order: signed(s) order == unsigned(u) order == lexicographic order of
    the fixed-width lowercase hex string. Built without overflow as
    ``shiftleft(digit1 XOR 8, 60) + value(digits 2..16)`` — the two terms
    occupy disjoint bits (top 4 / low 60), and the top-bit flip is the
    XOR 8 on digit 1. Inverse (when a caller needs the portable hex
    string back): ``lower(lpad(hex(s XOR 2^63), 16, '0'))`` — but the
    minhash consumers compare keys for equality/order only, and fixed-
    width concatenation is injective, so banding on the longs directly
    is exactly the oracle's banding on the concatenated hex strings."""
    return (
        f"(shiftleft(cast(conv(substring({md5_col}, 1, 1), 16, 10) as bigint) ^ 8, 60)"
        f" + cast(conv(substring({md5_col}, 2, 15), 16, 10) as bigint))"
    )


def hex_digit_val(token_md5: Column, pos: int) -> Column:
    """Value 0-15 of the ``pos``-th (1-based) hex digit of an md5 string."""
    return F.instr(F.lit(HEX_DIGITS), F.substring(token_md5, pos, 1)) - 1


def hex_prefix_long(token_md5: Column, n_digits: int) -> Column:
    """First ``n_digits`` hex digits of an md5 string as ONE long (``conv``
    base-16 parse). Callers needing every digit of a prefix should extract
    them arithmetically from this — digit d (1-based) is
    ``(value >> (4*(n_digits-d))) & 15`` — instead of n separate
    :func:`hex_digit_val` probes: one conv replaces n strpos+substr string
    scans per row, which dominates wide extractions (the 15-digit simhash
    pack measured ~2x faster end-to-end at 4M docs). Bit-identical to the
    digit-loop form (both are the big-endian base-16 value), so DuckDB
    oracle parity is untouched. n_digits must be <= 15 (60 bits < int64)."""
    if n_digits > 15:
        raise ValueError("hex_prefix_long: more than 15 hex digits overflows int64")
    return F.conv(F.substring(token_md5, 1, n_digits), 16, 10).cast("long")


def simhash_bit_sign(token_md5: Column, bit: int) -> Column:
    """±1 contribution of one token to simhash bit ``bit`` (0-based,
    bit = (digit_index * 4) + bit_in_digit over the md5 hex digits)."""
    digit = hex_digit_val(token_md5, bit // 4 + 1)
    bit_val = (digit / (2 ** (bit % 4))).cast("int") % 2
    return bit_val * 2 - 1
