"""Regression tests for the round-1 advisor findings on io/cram.py:
bounded memory (mmap + container LRU), rANS order-1 freq-0 tables,
RN=false mate-name synthesis, and unknown preservation-map keys.
"""
import mmap
import os

import pytest

from paragraph_tpu.io.cram import (ByteStream, CramReader, _TOTFREQ,
                                   _rans_read_freqs, _synthesize_read_names,
                                   rans_decode)

HERE = os.path.dirname(__file__)
DATA = os.path.join(HERE, "data", "cram")


def test_reader_uses_mmap_and_bounded_cache():
    path = os.path.join(DATA, "chrX.cram")
    ref = "/root/reference/share/test-data/paragraph/long-del/chrX_graph_typing.fa"
    cram = CramReader(path, reference_path=ref)
    assert isinstance(cram._data, mmap.mmap)
    # touch more containers than the cache bound (every record pass
    # decodes each container once; re-fetch regions to churn the LRU)
    n = list(cram.records())
    assert n
    assert len(cram._container_cache) <= CramReader.CONTAINER_CACHE_SIZE
    cram.close()
    assert cram._data == b""


def test_rans_order1_zero_freq_means_totfreq():
    """A stored frequency of 0 in an order-1 table means TOTFREQ
    (rANS_static.c:624); it must be applied before the lookup fill and
    the total check rather than raising 'bad frequency total'."""
    # table: symbol 65 with stored freq 0 (=TOTFREQ), terminator j=0
    table = bytes([65, 0, 0])
    start, freq, lookup = _rans_read_freqs(ByteStream(table), order1=True)
    assert freq[65] == _TOTFREQ
    assert start[65] == 0
    assert all(lookup[k] == 65 for k in range(_TOTFREQ))
    # order-0 keeps raw semantics (freq 0 stays 0 -> total check fires)
    with pytest.raises(ValueError):
        _rans_read_freqs(ByteStream(table), order1=False)


class _Rec:
    def __init__(self, name="", mate_line=-1):
        self.name = name
        self.mate_line = mate_line


def test_rn_false_name_synthesis_shares_chain_names():
    # chain: 0 <-> 2 (cycle after xref), singleton 1, named record 3
    recs = [_Rec(mate_line=2), _Rec(), _Rec(mate_line=0), _Rec(name="q7")]
    _synthesize_read_names(recs, record_counter=100)
    assert recs[0].name == recs[2].name == "paragraph:100"
    assert recs[1].name == "paragraph:101"
    assert recs[3].name == "q7"
    # distinct pairs never collide
    assert len({recs[0].name, recs[1].name, recs[3].name}) == 3


def test_unknown_preservation_map_key_raises():
    from paragraph_tpu.io.cram import Block, CompressionHeader, _COMPRESSION_HEADER

    # preservation map with one unknown key "ZZ" and a 1-byte value;
    # guessing widths desynchronizes SM/TD parsing, so this must raise
    def itf8(v):
        assert v < 0x80
        return bytes([v])

    pmap = itf8(1) + b"ZZ" + b"\x01"
    body = itf8(len(pmap)) + pmap
    blk = Block.__new__(Block)
    blk.data = body
    blk.content_type = _COMPRESSION_HEADER
    blk.content_id = 0
    with pytest.raises(ValueError, match="preservation-map"):
        CompressionHeader(blk, 3)
