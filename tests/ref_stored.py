"""Extract stored documents from the REFERENCE's own binary Lucene 4.x
index fixtures at test time (core/search/testdata/*), so the
reference's golden search tests (search_test.go TestKeywordSearch /
TestSingleSearch) can be replayed against our engine with the exact
corpus they were written for.

This is a from-scratch reader of the public Lucene 4.1/4.2 formats
(CompressingStoredFieldsFormat .fdt + Lucene42FieldInfos .fnm + the
LZ4 block format), written from the format documentation mirrored in
the reference's codec sources:
  core/codec/compressing/storedFieldsReader.go:80-310 (structure),
  core/codec/compressing/storedFieldsWriter.go:19-39 (type constants),
  core/codec/lucene42/fieldInfos.go:16-61 (.fnm layout).
Nothing is copied from the checkout; the fixtures are read in place
and never embedded in the repo (same pattern as ref_dfa.py)."""

from __future__ import annotations

import struct
from pathlib import Path

CODEC_MAGIC = 0x3FD76C17

STRING, BYTE_ARR = 0x00, 0x01
TYPE_BITS, TYPE_MASK = 3, 0x07


class _In:
    def __init__(self, data: bytes):
        self.b = data
        self.p = 0

    def u8(self) -> int:
        v = self.b[self.p]
        self.p += 1
        return v

    def read(self, n: int) -> bytes:
        v = self.b[self.p:self.p + n]
        self.p += n
        return v

    def int_be(self) -> int:
        return struct.unpack(">i", self.read(4))[0]

    def vint(self) -> int:
        out = shift = 0
        while True:
            x = self.u8()
            out |= (x & 0x7F) << shift
            if not x & 0x80:
                return out
            shift += 7

    vlong = vint

    def string(self) -> str:
        return self.read(self.vint()).decode("utf-8")

    def eof(self) -> bool:
        return self.p >= len(self.b)


def _check_header(inp: _In, name: str) -> int:
    assert inp.int_be() == CODEC_MAGIC, "bad codec magic"
    got = inp.string()
    assert got == name, f"codec {got!r} != {name!r}"
    return inp.int_be()


def lz4_decompress(inp: _In, min_length: int) -> bytes:
    """Classic LZ4 block format (token, literals, 2-byte LE offset,
    match run), decoding until at least min_length bytes."""
    out = bytearray()
    while len(out) < min_length:
        token = inp.u8()
        lit = token >> 4
        if lit == 15:
            while True:
                x = inp.u8()
                lit += x
                if x != 255:
                    break
        out += inp.read(lit)
        if len(out) >= min_length:
            break
        offset = inp.u8() | (inp.u8() << 8)
        mlen = token & 0x0F
        if mlen == 15:
            while True:
                x = inp.u8()
                mlen += x
                if x != 255:
                    break
        mlen += 4
        start = len(out) - offset
        for i in range(mlen):  # byte-wise: overlapping copies are the point
            out.append(out[start + i])
    return bytes(out)


def _packed_values(inp: _In, n: int, bits: int, packed_version: int) -> list[int]:
    """PackedInts PACKED format, no header: MSB-first bitstream.
    byteCount = ceil(n*bits/8) for packedIntsVersion >= 1, else
    long-aligned (8*ceil(n*bits/64))."""
    if packed_version >= 1:
        nbytes = (n * bits + 7) // 8
    else:
        nbytes = 8 * ((n * bits + 63) // 64)
    raw = inp.read(nbytes)
    out, acc, nacc = [], 0, 0
    for byte in raw:
        acc = (acc << 8) | byte
        nacc += 8
        while nacc >= bits and len(out) < n:
            nacc -= bits
            out.append((acc >> nacc) & ((1 << bits) - 1))
    return out[:n]


def read_field_names(fnm_path: str) -> dict[int, str]:
    inp = _In(Path(fnm_path).read_bytes())
    _check_header(inp, "Lucene42FieldInfos")
    size = inp.vint()
    names: dict[int, str] = {}
    for _ in range(size):
        name = inp.string()
        number = inp.vint()
        inp.u8()   # field bits
        inp.u8()   # docvalues/norms nibbles
        nattr = inp.int_be()  # writeStringStringMap: int count
        for _ in range(nattr):
            inp.string()
            inp.string()
        names[number] = name
    return names


def read_stored_documents(index_dir: str, segment: str = "_0") -> list[dict]:
    """All stored documents of a segment as [{field: value}] in docID
    order (STRING and BYTE_ARR fields)."""
    d = Path(index_dir)
    names = read_field_names(str(d / f"{segment}.fnm"))
    inp = _In((d / f"{segment}.fdt").read_bytes())
    version = _check_header(inp, "Lucene41StoredFieldsData")
    if version >= 1:  # VERSION_BIG_CHUNKS
        inp.vint()    # chunkSize
    packed_version = inp.vint()
    docs: list[dict] = []
    while not inp.eof():
        inp.vint()  # docBase
        chunk_docs = inp.vint()
        if chunk_docs == 0:
            break
        if chunk_docs == 1:
            nfields = [inp.vint()]
            lengths = [inp.vint()]
        else:
            bits = inp.vint()
            if bits == 0:
                nfields = [inp.vint()] * chunk_docs
            else:
                nfields = _packed_values(inp, chunk_docs, bits, packed_version)
            bits = inp.vint()
            if bits == 0:
                lengths = [inp.vint()] * chunk_docs
            else:
                lengths = _packed_values(inp, chunk_docs, bits, packed_version)
        blob = _In(lz4_decompress(inp, sum(lengths)))
        for nf in nfields:
            doc: dict = {}
            for _ in range(nf):
                info_and_bits = blob.vlong()
                fnum = info_and_bits >> TYPE_BITS
                ftype = info_and_bits & TYPE_MASK
                if ftype == STRING:
                    doc[names[fnum]] = blob.string()
                elif ftype == BYTE_ARR:
                    doc[names[fnum]] = blob.read(blob.vint())
                else:
                    raise NotImplementedError(f"field type {ftype}")
            docs.append(doc)
    return docs
