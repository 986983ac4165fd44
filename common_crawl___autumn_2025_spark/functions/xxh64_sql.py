"""XXH64 (Spark ``xxhash64``, seed 42) as pure DuckDB SQL.

The d03 MinHash+LSH operator hashes shingles and band signatures with
Spark's ``xxhash64`` — a JVM Catalyst expression DuckDB does not
ship. To give d03 a full value oracle (the driver's DuckDB
side-by-side), this module unrolls the public XXH64 algorithm
(Y. Collet's xxHash spec; the same algorithm
``org.apache.spark.sql.catalyst.expressions.XxHash64`` implements
over a string's UTF-8 bytes, and the same one ``crawl/hashing.py``
mirrors in Python) into a DuckDB CTE chain:

- all 64-bit wraparound arithmetic runs in HUGEINT with values kept
  in ``[0, 2^64)``: ``mulmod`` splits the constant multiplier into
  32-bit halves so no intermediate exceeds 2^96, ``rotl`` is a
  multiply + integer divide, shifts are divides, and DuckDB's
  ``xor`` works on HUGEINT directly;
- the variable-length loops (32-byte stripes, 8-byte tail chunks,
  single tail bytes) become ``list_reduce`` folds with the
  accumulator prepended — lambda variable binding is what keeps the
  generated SQL linear instead of exponentially nested;
- per-byte access is TRUE UTF-8: ``hex(encode(s))`` yields the
  string's UTF-8 bytes as hex pairs computed once per row, and each
  byte is decoded with two ``strpos`` lookups into the hex alphabet —
  exact for any text (ASCII, accented, CJK), matching what Spark's
  ``xxhash64`` hashes (the UTF8String's bytes).  Earlier rounds used
  ``unicode(char)`` over ``string_split``, which is only byte-exact
  for ASCII; that caveat is gone.

Bit-equality with the Python mirror (itself pinned bit-exact against
Spark by ``test_python_xxh64_matches_spark``) is tested across every
length class (empty, <4, <8, <32, stripe boundaries, long) AND over
non-ASCII (accented/CJK/emoji, multi-byte spans crossing stripe
boundaries, hypothesis-generated unicode) in
``tests/test_dedup_similarity.py::test_duckdb_xxh64_matches_python``
and ``tests/test_nonascii_oracles.py``.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 1 << 64
XXH64_SEED = 42  # Spark's fixed seed


def _mul(x: str, c: int) -> str:
    """(x * c) mod 2^64 for HUGEINT x in [0,2^64) and constant c."""
    lo, hi = c % (1 << 32), c >> 32
    return (
        f"((({x})*{lo} + ((({x})*{hi})%4294967296)*4294967296) % {_M})"
    )


def _rotl(x: str, r: int) -> str:
    """64-bit rotate-left; the low and high parts occupy disjoint
    bits so OR is plain addition."""
    return f"((({x})*{1 << r})%{_M} + ({x})//{1 << (64 - r)})"


def _round0(x: str) -> str:
    """XXH64 round with accumulator 0: rotl31(x*P2)*P1."""
    return _mul(_rotl(_mul(x, _P2), 31), _P1)


def _u64(bs: str, pos: str) -> str:
    """Little-endian u64 from 8 byte-list elements at 1-based pos."""
    return (
        "("
        + " + ".join(f"({bs})[({pos})+{j}]*{256 ** j}" for j in range(8))
        + ")"
    )


def _u32(bs: str, pos: str) -> str:
    return (
        "("
        + " + ".join(f"({bs})[({pos})+{j}]*{256 ** j}" for j in range(4))
        + ")"
    )


def xxh64_ctes(
    prefix: str, src: str, keys: list[str], s_col: str = "s",
    seed: int = XXH64_SEED,
) -> tuple[str, str]:
    """CTE chain computing unsigned XXH64(seed) of ASCII column
    ``s_col`` for every row of CTE ``src``.

    Returns ``(cte_text, final_cte)``; the final CTE carries ``keys``
    plus ``h`` (HUGEINT in [0, 2^64), the unsigned view of Spark's
    signed ``xxhash64``).  ``cte_text`` is a fragment to splice into
    a ``WITH`` list (no leading/trailing comma).
    """
    k = ", ".join(keys)
    p = prefix
    stripe_lane = {
        f"f{j}": _u64("bs", f"32*t+{8 * j + 1}") for j in range(4)
    }
    stripe_struct = (
        "{"
        + ", ".join(f"'f{j}': {stripe_lane[f'f{j}']}" for j in range(4))
        + "}"
    )
    acc_init = (
        "{"
        + ", ".join(
            f"'f{j}': CAST({v} AS HUGEINT)"
            for j, v in enumerate(
                [
                    (seed + _P1 + _P2) % _M,
                    (seed + _P2) % _M,
                    seed % _M,
                    (seed - _P1) % _M,
                ]
            )
        )
        + "}"
    )

    def _vround(a: str, x: str) -> str:
        # full XXH64 round: rotl31(acc + lane*P2)*P1
        return _mul(_rotl(f"(({a}) + {_mul(x, _P2)}) % {_M}", 31), _P1)

    acc_step = (
        "{"
        + ", ".join(
            f"'f{j}': {_vround(f'A.f{j}', f'X.f{j}')}" for j in range(4)
        )
        + "}"
    )
    h_from_acc = (
        f"({_rotl('acc.f0', 1)} + {_rotl('acc.f1', 7)} + "
        f"{_rotl('acc.f2', 12)} + {_rotl('acc.f3', 18)}) % {_M}"
    )
    r0v, r0k = _round0("V"), _round0("K")
    merge_step = f"({_mul(f'xor(H, {r0v})', _P1)} + {_P4}) % {_M}"
    chunk_step = (
        f"({_mul(_rotl(f'xor(H, {r0k})', 27), _P1)} + {_P4}) % {_M}"
    )
    mc5 = _mul("C", _P5)
    byte_step = _mul(_rotl(f"xor(H, {mc5})", 11), _P1)
    u32p1 = _mul(_u32("bs", "n - n%8 + 1"), _P1)
    four_expr = (
        f"({_mul(_rotl(f'xor(h2, {u32p1})', 23), _P2)}"
        f" + {_P3}) % {_M}"
    )
    # UTF-8 bytes via hex(encode(s)): hx is computed once per row in
    # its own CTE; byte j = 16*digit(hx[2j+1]) + digit(hx[2j+2]), and
    # n is the OCTET length (= len(hx)/2), not the character count
    hexdig = "'0123456789ABCDEF'"
    byte_j = (
        f"CAST(16*(strpos({hexdig}, hx[2*j+1:2*j+1])-1)"
        f" + (strpos({hexdig}, hx[2*j+2:2*j+2])-1) AS HUGEINT)"
    )
    return (
        f"""{p}x AS MATERIALIZED (SELECT {k}, hex(encode({s_col})) AS hx
    FROM {src}),
    {p}0 AS MATERIALIZED (SELECT {k}, length(hx)//2 AS n,
      list_transform(range(0, length(hx)//2), j -> {byte_j}) AS bs
    FROM {p}x),
    {p}1 AS MATERIALIZED (SELECT {k}, n, bs,
      list_reduce(
        list_prepend({acc_init},
          list_transform(range(0, n//32), t -> {stripe_struct})),
        (A, X) -> {acc_step}) AS acc
    FROM {p}0),
    {p}2 AS MATERIALIZED (SELECT {k}, n, bs,
      CASE WHEN n >= 32 THEN
        list_reduce(
          list_prepend(CAST(({h_from_acc}) AS HUGEINT),
                       [acc.f0, acc.f1, acc.f2, acc.f3]),
          (H, V) -> {merge_step})
      ELSE CAST({(seed + _P5) % _M} AS HUGEINT) END AS h0
    FROM {p}1),
    {p}3 AS MATERIALIZED (SELECT {k}, n, bs,
      list_reduce(
        list_prepend(CAST((h0 + n) % {_M} AS HUGEINT),
          list_transform(range(0, (n%32)//8),
                         q -> {_u64('bs', '(n//32)*32 + q*8 + 1')})),
        (H, K) -> {chunk_step}) AS h2
    FROM {p}2),
    {p}4 AS MATERIALIZED (SELECT {k}, n, bs,
      CASE WHEN n%8 >= 4 THEN {four_expr} ELSE h2 END AS h3
    FROM {p}3),
    {p}5 AS MATERIALIZED (SELECT {k},
      list_reduce(list_prepend(h3, bs[n - n%4 + 1 : n]),
                  (H, C) -> {byte_step}) AS h4
    FROM {p}4),
    {p}6 AS MATERIALIZED (SELECT {k}, {_mul(f"xor(h4, h4//{1 << 33})", _P2)} AS h5
    FROM {p}5),
    {p}7 AS MATERIALIZED (SELECT {k}, {_mul(f"xor(h5, h5//{1 << 29})", _P3)} AS h6
    FROM {p}6),
    {p}f AS MATERIALIZED (SELECT {k}, xor(h6, h6//{1 << 32}) AS h FROM {p}7)""",
        f"{p}f",
    )
