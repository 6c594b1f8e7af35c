"""The pure-SQL xxhash64 emulation behind the HLL/CMS/Bloom oracles
(__spark_entry__._xxh64_chain) must match Spark's F.xxhash64 bit-for-bit —
64-bit wraparound, rotations, and two's-complement input handling are all
emulated with HUGEINT arithmetic and are easy to get subtly wrong."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def hash_inputs():
    rng = np.random.default_rng(99)
    edge = [0, 1, -1, 42, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    rand = rng.integers(-(2**63), 2**63 - 1, size=2000).tolist()
    return edge + [int(v) for v in rand]


def test_sql_xxhash64_matches_spark(spark, hash_inputs):
    frag, fin, hcol = entry._xxh64_chain("t", "src")
    con = duckdb.connect()
    con.execute("CREATE TABLE vals(x BIGINT)")
    con.executemany("INSERT INTO vals VALUES (?)", [(v,) for v in hash_inputs])
    sql = f"""
WITH src AS (SELECT x FROM vals){frag}
SELECT x, CAST(CASE WHEN {hcol} >= 9223372036854775808
                    THEN CAST({hcol} AS HUGEINT) - 18446744073709551616
                    ELSE CAST({hcol} AS HUGEINT) END AS BIGINT) AS h
FROM {fin}
"""
    duck = dict(con.execute(sql).fetchall())
    sp = {
        r.x: r.h
        for r in spark.createDataFrame(
            [(v,) for v in set(hash_inputs)], "x long"
        )
        .select("x", F.xxhash64("x").alias("h"))
        .collect()
    }
    mism = [(v, duck[v], sp[v]) for v in sp if duck[v] != sp[v]]
    assert not mism, mism[:5]


def test_u64_primitives():
    """mul/add/rotl mod-2^64 helpers against python int arithmetic."""
    con = duckdb.connect()
    rng = np.random.default_rng(5)
    xs = [int(v) for v in rng.integers(0, 2**64, size=200, dtype=np.uint64)]
    consts = [3, 0x9E3779B185EBCA87, 2**63 + 1, 0xFF51AFD7ED558CCD]
    for c in consts:
        got = [
            con.execute(
                f"SELECT {entry._u64mul(f'CAST({x} AS UBIGINT)', c)}"
            ).fetchone()[0]
            for x in xs[:50]
        ]
        exp = [(x * c) % 2**64 for x in xs[:50]]
        assert [int(g) for g in got] == exp, c
    for r in (1, 27, 31, 63):
        got = [
            con.execute(
                f"SELECT {entry._u64rotl(f'CAST({x} AS UBIGINT)', r)}"
            ).fetchone()[0]
            for x in xs[:30]
        ]
        exp = [((x << r) | (x >> (64 - r))) % 2**64 for x in xs[:30]]
        assert [int(g) for g in got] == exp, r


def test_sql_xxhash64_string_matches_spark(spark):
    """Full XXH64 (stripes + 8B words + 4B chunk + byte tail) over ASCII
    strings — every length-class boundary exercised."""
    import random
    import string as strmod

    random.seed(7)
    texts = (
        ["", "a", "abc", "abcd", "abcdefg", "abcdefgh", "abcdefghi"]
        + ["x" * n for n in (31, 32, 33, 39, 40, 43, 44, 47, 63, 64, 553)]
        + [
            "".join(
                random.choices(strmod.ascii_letters + strmod.digits + " .,;!?", k=random.randint(1, 400))
            )
            for _ in range(120)
        ]
    )
    frag, fin, hcol = entry._xxh64_str_chain("t", "src")
    con = duckdb.connect()
    con.execute("CREATE TABLE vals(t VARCHAR)")
    con.executemany("INSERT INTO vals VALUES (?)", [(t,) for t in set(texts)])
    sql = f"""
WITH src AS (SELECT t FROM vals){frag}
SELECT t, {entry._to_signed(hcol)} AS h FROM {fin}
"""
    duck = dict(con.execute(sql).fetchall())
    sp = {
        r.t: r.h
        for r in spark.createDataFrame([(t,) for t in set(texts)], "t string")
        .select("t", F.xxhash64("t").alias("h"))
        .collect()
    }
    mism = [(repr(t)[:40], duck[t], sp[t]) for t in sp if duck[t] != sp[t]]
    assert not mism, mism[:5]


def test_documents_are_ascii(spark, sf_dir):
    """The string-hash oracle recovers bytes with ord(), which is only
    byte-faithful for ASCII — pin the assumption on the driver table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_bad = docs.filter(F.col("text").rlike("[^\\x00-\\x7F]")).count()
    assert n_bad == 0
