"""String-distance + base58 scalars (functions/strdist.py).

The strongest oracle available here is DuckDB itself: its
``damerau_levenshtein`` / ``jaro_similarity`` / ``jaro_winkler_similarity``
are the same functions the driver's oracle harness evaluates, so the
fuzz tests pin the Python implementations BIT-EXACT against DuckDB —
that equality is what lets q225/q226 hash-match end-to-end.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ed_clickhouse_spark.chsql import translate
from ed_clickhouse_spark.functions.strdist import (
    MAX_BYTES,
    base58_decode,
    base58_encode,
    damerau_levenshtein,
    jaro_similarity,
    jaro_winkler_similarity,
    register_strdist,
)

_SET = settings(max_examples=300, deadline=None)


def test_known_vectors():
    # full Damerau-Levenshtein, NOT optimal-string-alignment: the
    # CA->ABC case distinguishes them (OSA says 3)
    assert damerau_levenshtein("CA", "ABC") == 2
    assert damerau_levenshtein("ab", "ba") == 1
    assert damerau_levenshtein("kitten", "sitting") == 3
    assert damerau_levenshtein("", "abc") == 3
    assert damerau_levenshtein("abc", "") == 3
    assert damerau_levenshtein("", "") == 0
    # textbook Jaro/Winkler values
    assert jaro_similarity("MARTHA", "MARHTA") == pytest.approx(
        0.9444444444444445, abs=0
    )
    assert jaro_winkler_similarity("MARTHA", "MARHTA") == pytest.approx(
        0.9611111111111111, abs=0
    )
    assert jaro_similarity("DIXON", "DICKSONX") == pytest.approx(
        0.7666666666666666, abs=0
    )
    assert jaro_similarity("abc", "abc") == 1.0
    # strcmp95/DuckDB empty-string convention (0.0, even both-empty)
    assert jaro_similarity("", "") == 0.0
    assert jaro_similarity("", "a") == 0.0
    # below the 0.7 gate the Winkler boost must NOT apply
    assert jaro_winkler_similarity("CRATE", "TRACE") == jaro_similarity(
        "CRATE", "TRACE"
    )


@given(
    st.text(alphabet="abcdef", max_size=10),
    st.text(alphabet="abcdef", max_size=10),
)
@_SET
def test_damerau_matches_duckdb(a, b):
    con = duckdb.connect()
    assert (
        con.execute("select damerau_levenshtein(?, ?)", [a, b]).fetchone()[0]
        == damerau_levenshtein(a, b)
    )


@given(
    st.text(alphabet="abcdefgh", max_size=12),
    st.text(alphabet="abcdefgh", max_size=12),
)
@_SET
def test_jaro_family_bit_exact_vs_duckdb(a, b):
    con = duckdb.connect()
    dj, djw = con.execute(
        "select jaro_similarity(?, ?), jaro_winkler_similarity(?, ?)",
        [a, b, a, b],
    ).fetchone()
    # == on doubles on purpose: bit-exactness is what makes the 4-dp
    # rounding in q226 engine-independent
    assert dj == jaro_similarity(a, b)
    assert djw == jaro_winkler_similarity(a, b)


@given(st.binary(max_size=40))
@_SET
def test_base58_roundtrip(raw):
    enc = base58_encode(raw)
    assert set(enc) <= set(
        "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
    )
    dec = base58_decode(enc)
    assert dec.encode("utf-8", errors="replace") == raw or dec == raw.decode(
        "utf-8", errors="replace"
    )


def test_base58_known_vectors():
    # the standard test vector (Bitcoin wiki)
    assert base58_encode("Hello World!") == "2NEpo7TZRRrLZSi2U"
    assert base58_decode("2NEpo7TZRRrLZSi2U") == "Hello World!"
    # leading zero bytes -> leading '1's
    assert base58_encode(b"\x00\x00abc") == "11ZiCa"
    assert base58_encode("") == ""
    assert base58_decode("") == ""
    with pytest.raises(ValueError, match="tryBase58Decode"):
        base58_decode("0OIl")  # chars outside the Bitcoin alphabet


def test_length_guard():
    with pytest.raises(ValueError, match="fingerprint"):
        damerau_levenshtein("x" * (MAX_BYTES + 1), "y")
    with pytest.raises(ValueError, match="fingerprint"):
        jaro_similarity("y", "x" * (MAX_BYTES + 1))


def test_sql_end_to_end(spark):
    """The dialect renames the ClickHouse spellings to the registered
    ch_* pandas UDFs; a translated query must execute and agree with
    the Python reference, and NULLs must propagate."""
    register_strdist(spark)
    spark.sql(
        "SELECT * FROM VALUES ('query', 'qurey'), ('merge', 'mrege'),"
        " (NULL, 'x') AS t(a, b)"
    ).createOrReplaceTempView("__strdist")
    rows = spark.sql(
        translate(
            "SELECT a, b, damerauLevenshteinDistance(a, b) AS d,"
            " jaroSimilarity(a, b) AS j,"
            " jaroWinklerSimilarity(a, b) AS jw,"
            " base58Encode(b) AS enc,"
            " tryBase58Decode(base58Encode(b)) AS dec,"
            " tryBase58Decode('0invalid') AS bad"
            " FROM __strdist"
        ).sql
    ).collect()
    by_b = {r["b"]: r for r in rows}
    assert by_b["qurey"]["d"] == 1
    assert by_b["qurey"]["j"] == jaro_similarity("query", "qurey")
    assert by_b["mrege"]["jw"] == jaro_winkler_similarity("merge", "mrege")
    assert by_b["mrege"]["dec"] == "mrege"
    assert by_b["x"]["d"] is None and by_b["x"]["j"] is None
    assert all(r["bad"] is None for r in rows)
    # base58Decode (non-try) surfaces the loud error through the UDF
    with pytest.raises(Exception, match="base58"):
        spark.sql(
            translate("SELECT base58Decode('0x') FROM __strdist").sql
        ).collect()


def test_bit_slice_vectors():
    from ed_clickhouse_spark.functions.strdist import bit_slice

    def bits(x):
        return "".join(f"{c:08b}" for c in x)

    # ClickHouse doc semantics: 1-based bit offset, right-zero-padded
    assert bit_slice("Hello", 1, 8) == b"H"
    assert bits(bit_slice("Hello", 1, 2)) == "01000000"
    assert bits(bit_slice("Hello", 3, 4)) == "00100000"
    assert bit_slice("Hello", -8) == b"o"  # negative offset: from end
    assert bit_slice("Hello", 9, -8) == b"ell"  # negative len: trim end
    assert bit_slice("Hi", 20) == b""  # past the end
    assert bit_slice("Hi", 1, 0) == b""


@given(
    st.binary(min_size=0, max_size=6),
    st.integers(min_value=-60, max_value=60),
    st.one_of(st.none(), st.integers(min_value=-60, max_value=60)),
)
@_SET
def test_bit_slice_matches_bitstring_reference(raw, offset, length):
    """The int-shift implementation equals a naive '0'/'1'-string
    slicer for every (offset, length) shape."""
    from ed_clickhouse_spark.functions.strdist import bit_slice

    s = "".join(f"{c:08b}" for c in raw)
    start = (offset - 1) if offset > 0 else (len(s) + offset if offset < 0 else 0)
    end = (
        len(s)
        if length is None
        else (start + length if length >= 0 else len(s) + length)
    )
    start = max(0, min(start, len(s)))
    end = max(start, min(end, len(s)))
    sel = s[start:end]
    sel += "0" * ((-len(sel)) % 8)
    want = bytes(int(sel[i: i + 8], 2) for i in range(0, len(sel), 8))
    assert bit_slice(raw, offset, length) == want


def test_bit_slice_sql(spark):
    register_strdist(spark)
    spark.sql("SELECT 'Hello' AS s").createOrReplaceTempView("__bs")
    rows = spark.sql(
        translate(
            "SELECT hex(bitSlice(s, 9, -8)) AS mid,"
            " hex(bitSlice(s, 1, 8)) AS first FROM __bs"
        ).sql
    ).collect()
    assert rows[0]["mid"] == "656C6C" and rows[0]["first"] == "48"


def test_punycode_idna_vectors():
    from ed_clickhouse_spark.functions.strdist import (
        idna_decode,
        idna_encode,
        punycode_decode,
        punycode_encode,
    )

    assert punycode_encode("München") == "Mnchen-3ya"
    assert punycode_decode("Mnchen-3ya") == "München"
    assert punycode_encode("abc") == "abc-"
    assert punycode_encode("") == ""  # empty in, empty out
    # IDNA2008 + UTS46 (ClickHouse's ada-idna behavior): sharp s is
    # NOT transitionally mapped to 'ss'
    assert idna_encode("straße.münchen.de") == (
        "xn--strae-oqa.xn--mnchen-3ya.de"
    )
    assert idna_encode("München.DE") == "xn--mnchen-3ya.de"  # UTS46 fold
    assert idna_decode("xn--strae-oqa.de") == "straße.de"
    assert idna_encode("plain.example.com") == "plain.example.com"
    assert idna_encode("") == "" and idna_decode("") == ""
    with pytest.raises(ValueError, match="tryIdnaEncode"):
        idna_encode("bad..domain")
    with pytest.raises(ValueError, match="tryPunycodeDecode"):
        punycode_decode("München")  # non-ASCII input is not punycode


@given(st.text(max_size=20))
@_SET
def test_punycode_roundtrip(s):
    from ed_clickhouse_spark.functions.strdist import (
        punycode_decode,
        punycode_encode,
    )

    try:
        enc = punycode_encode(s)
    except UnicodeError:
        return  # surrogates etc. — codec refuses, nothing to pin
    assert punycode_decode(enc) == s


def test_punycode_idna_sql(spark):
    register_strdist(spark)
    spark.sql(
        "SELECT * FROM VALUES ('München.de'), ('plain.org'), (NULL)"
        " AS t(h)"
    ).createOrReplaceTempView("__puny")
    rows = spark.sql(
        translate(
            "SELECT h, idnaEncode(h) AS a, tryIdnaEncode('x..y') AS bad,"
            " punycodeDecode(punycodeEncode(h)) AS rt,"
            " tryPunycodeDecode('ü') AS badp"
            " FROM __puny WHERE h IS NOT NULL"
        ).sql
    ).collect()
    by_h = {r["h"]: r for r in rows}
    assert by_h["München.de"]["a"] == "xn--mnchen-3ya.de"
    assert by_h["plain.org"]["a"] == "plain.org"
    assert all(r["bad"] is None and r["badp"] is None for r in rows)
    assert by_h["München.de"]["rt"] == "München.de"


@given(
    st.text(alphabet="abcd", max_size=10),
    st.text(alphabet="abcd", max_size=10),
)
@_SET
def test_array_levenshtein_matches_duckdb_string_form(a, b):
    """arrayLevenshteinDistance over single-char element lists must
    equal DuckDB's string levenshtein — the same DP, different carrier."""
    from ed_clickhouse_spark.functions.strdist import array_levenshtein

    con = duckdb.connect()
    want = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
    assert array_levenshtein(list(a), list(b)) == want


def test_ip_range_and_ipv6_vectors():
    from ed_clickhouse_spark.functions.strdist import (
        ip_in_range,
        ipv6_cidr_to_range,
        ipv6_normalize,
    )

    assert ip_in_range("192.168.1.5", "192.168.0.0/16") == 1
    assert ip_in_range("192.169.0.1", "192.168.0.0/16") == 0
    assert ip_in_range("2001:db8::7", "2001:db8::/32") == 1
    assert ip_in_range("::1", "192.168.0.0/16") == 0  # mixed families
    with pytest.raises(ValueError, match="isIPAddressInRange"):
        ip_in_range("not-an-ip", "10.0.0.0/8")
    assert ipv6_cidr_to_range("2001:db8::1", 32) == (
        "2001:db8::",
        "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff",
    )
    # full-width and zero-width prefixes
    assert ipv6_cidr_to_range("::1", 128) == ("::1", "::1")
    assert ipv6_cidr_to_range("::", 0)[1] == (
        "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff"
    )
    assert ipv6_normalize("2001:0DB8::0001") == "2001:db8::1"
    assert ipv6_normalize("10.1.2.3") == "::ffff:10.1.2.3"
