import numpy as np
import pyarrow as pa

from bubing_ray import hashing


def test_hash64_matches_scalar():
    vals = ["", "a", "abc", "http://host1.example/p/1", "x" * 300]
    arr = pa.array(vals, type=pa.string())
    out = hashing.hash64(arr)
    assert out.dtype == np.uint64
    for v, h in zip(vals, out):
        assert int(h) == hashing.hash64_str(v)


def test_hash64_nulls_and_binary():
    arr = pa.array([b"ab", None, b""], type=pa.binary())
    out = hashing.hash64(arr)
    assert int(out[1]) == 0
    assert int(out[0]) == hashing.hash64_str("ab")


def test_hash64_sliced_array():
    arr = pa.array(["aa", "bb", "cc", "dd"]).slice(1, 2)
    out = hashing.hash64(arr)
    assert [int(x) for x in out] == [hashing.hash64_str("bb"), hashing.hash64_str("cc")]


def test_hash64_empty():
    assert hashing.hash64(pa.array([], type=pa.string())).shape == (0,)


def test_distribution():
    # cheap avalanche sanity: shard assignment of sequential URLs is balanced
    urls = pa.array([f"http://host{i}.example/p/{j}" for i in range(100) for j in range(10)])
    h = hashing.hash64(urls)
    shards = h % np.uint64(16)
    counts = np.bincount(shards.astype(np.int64), minlength=16)
    assert counts.min() > 20  # 1000/16 ≈ 62 expected


def test_fnv1a64_sql_matches_python():
    import duckdb

    from bubing_ray.hashing import fnv1a64, fnv1a64_sql

    con = duckdb.connect()
    for s in ["", "probe", "a b c", "héllo €", "x" * 300, "tab\tnl\n"]:
        got = con.execute(
            f"SELECT {fnv1a64_sql('s')} FROM (SELECT ? AS s)", [s]
        ).fetchone()[0]
        assert got == fnv1a64(s), s


def test_hash64_portable_flag_overrides_global():
    import pyarrow as pa

    from bubing_ray.hashing import fnv1a64, hash64

    arr = pa.array(["probe", "other"], type=pa.string())
    out = hash64(arr, portable=True)
    assert list(out) == [fnv1a64("probe"), fnv1a64("other")]
    # default (polars) path still differs (xxhash), so the flag matters
    assert list(hash64(arr, portable=False)) != list(out)
