"""Store layer: proxy semantics, compressed store, admin registry, stats.

Mirrors the reference's bash suite: lifecycle (test_init.sh), info
(test_info.sh), round-trip through the device (test_proxy.sh: dd + cmp at
multiple block sizes), stats behavior (test_stats.sh)."""

import numpy as np
import pytest

from lz4_sgori_tpu import store as S


@pytest.fixture
def backing(tmp_path):
    return str(tmp_path / "ram0.img")


def test_lifecycle_map_unmap(backing):
    # test_init.sh analog
    st = S.map_store(backing, chunk_size=1024, capacity=64 * 1024)
    assert "proxy over" in S.get_store().info()
    with pytest.raises(S.StoreError, match="EBUSY"):
        S.map_store(backing)
    S.unmap_store()
    with pytest.raises(S.StoreError, match="ENODEV"):
        S.get_store()
    with pytest.raises(S.StoreError, match="ENODEV"):
        S.unmap_store()


def test_proxy_roundtrip_multiple_block_sizes(backing, fixtures):
    # test_proxy.sh analog: write fixtures at 1k/4k-ish chunk sizes, read
    # back, compare
    st = S.ProxyStore(backing, chunk_size=1024, capacity=1 << 20)
    payloads = [fixtures["text_small"], fixtures["zeros_4k"],
                fixtures["random_4k"]]
    off = 0
    spans = []
    for p in payloads:
        st.write(off, p)
        spans.append((off, len(p)))
        off += len(p)
    for (o, n), p in zip(spans, payloads):
        assert st.read(o, n) == p
    d = st.stats.as_dict()
    assert d["write"]["reqs_total"] == len(payloads)
    assert d["write"]["reqs_failed"] == 0
    assert d["write"]["data_bytes"] == sum(len(p) for p in payloads)
    st.close()


def test_proxy_range_errors(backing):
    st = S.ProxyStore(backing, chunk_size=1024, capacity=4096)
    with pytest.raises(S.StoreError, match="outside capacity"):
        st.write(4000, b"x" * 200)
    with pytest.raises(S.StoreError, match="outside capacity"):
        st.read(-1, 10)
    st.close()


def test_stats_reset(backing):
    # test_stats.sh analog
    st = S.map_store(backing, chunk_size=1024, capacity=1 << 16)
    try:
        st.write(0, b"hello" * 100)
        st.read(0, 500)
        text = S.stats_text()
        assert "write stats:" in text and "reqs_total: 1" in text
        S.stats_reset()
        d = st.stats.as_dict()
        assert d["write"]["reqs_total"] == 0 and d["read"]["reqs_total"] == 0
    finally:
        S.unmap_store()


def test_compressed_store_roundtrip(tmp_path, fixtures):
    st = S.CompressedStore(str(tmp_path / "cstore"), chunk_size=4096)
    st.write_chunk(0, fixtures["zeros_4k"])
    st.write_chunk(3, fixtures["random_4k"])
    st.write_chunk(7, fixtures["text_small"][:4096])
    assert st.read_chunk(0) == fixtures["zeros_4k"]
    assert st.read_chunk(3) == fixtures["random_4k"]
    assert st.read_chunk(7) == fixtures["text_small"][:4096]
    # sparse read of an unwritten chunk
    assert st.read_chunk(5) == bytes(4096)
    with pytest.raises(S.StoreError):
        st.write_chunk(1, b"x" * 5000)
