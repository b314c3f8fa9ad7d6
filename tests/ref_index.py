"""Read the inverted index of the REFERENCE's binary Lucene 4.x test
fixtures (term dictionary + postings + positions), so the analyzed
token stream of non-stored fields (e.g. `content`) can be
reconstructed and the reference's golden search tests replayed against
our engine on the exact corpus they assert about.

From-scratch reader of the public Lucene 4.1 BlockTree + postings
formats; the structure is pinned against the reference's own readers
(read-only, nothing copied):
  core/codec/blocktree/termsReader.go:280-330   (header/dirOffset/summary)
  core/codec/blocktree/segmentTermEnumFrame.go:127-343 (block layout,
    leaf/non-leaf entries, stats = df vint + (ttf-df) vlong)
  core/codec/lucene41/postingsReader.go:136-275 (vint doc blocks,
    legacy inline term metadata), postingsWriter.go:434-452 (vint
    position tail)
Only the df<=128 / ttf<=128 vint paths are implemented — enough for
the fixtures (tiny single-segment indexes); packed blocks raise."""

from __future__ import annotations

import struct
from pathlib import Path

from ref_stored import _In, CODEC_MAGIC

BLOCK_SIZE = 128
OUTPUT_FLAGS_BITS = 2  # rootCode: (fp << 2) | hasTerms | isFloor


def _check_header(inp: _In, name: str) -> int:
    assert inp.int_be() == CODEC_MAGIC
    got = inp.string()
    assert got == name, f"codec {got!r} != {name!r}"
    return inp.int_be()


def read_field_infos(fnm_path: str) -> dict[int, dict]:
    """Field number -> {name, indexed, has_freqs, has_positions}."""
    inp = _In(Path(fnm_path).read_bytes())
    _check_header(inp, "Lucene42FieldInfos")
    out: dict[int, dict] = {}
    for _ in range(inp.vint()):
        name = inp.string()
        number = inp.vint()
        bits = inp.u8()
        inp.u8()  # docvalues/norms nibbles
        for _ in range(inp.int_be()):  # attributes map
            inp.string()
            inp.string()
        indexed = bool(bits & 0x1)
        omit_tf = bool(bits & 0x40)
        omit_pos = bool(bits & 0x80)
        out[number] = {
            "name": name,
            "indexed": indexed,
            "has_freqs": indexed and not omit_tf,
            "has_positions": indexed and not omit_tf and not omit_pos,
        }
    return out


class _Term:
    __slots__ = ("term", "df", "ttf", "doc_fp", "pos_fp", "singleton")

    def __init__(self, term, df, ttf, doc_fp, pos_fp, singleton):
        self.term, self.df, self.ttf = term, df, ttf
        self.doc_fp, self.pos_fp, self.singleton = doc_fp, pos_fp, singleton


def _read_blocks(data: bytes, fp: int, prefix: bytes, has_freqs: bool,
                 has_positions: bool, out: list[_Term]):
    """Decode the floor-block chain starting at ``fp`` (shared
    ``prefix``), recursing into sub-blocks."""
    inp = _In(data)
    inp.p = fp
    while True:
        block_fp = inp.p
        code = inp.vint()
        ent_count, is_last_in_floor = code >> 1, bool(code & 1)
        code = inp.vint()
        is_leaf = bool(code & 1)
        suffixes = _In(inp.read(code >> 1))
        stats = _In(inp.read(inp.vint()))
        meta = _In(inp.read(inp.vint()))
        doc_fp = pos_fp = 0  # absolute at each block's first term
        sub_fps: list[tuple[int, bytes]] = []
        for _ in range(ent_count):
            if is_leaf:
                slen = suffixes.vint()
                suffix = suffixes.read(slen)
                is_term = True
            else:
                c = suffixes.vint()
                slen = c >> 1
                suffix = suffixes.read(slen)
                is_term = (c & 1) == 0
                if not is_term:
                    sub_fps.append((block_fp - suffixes.vlong(), prefix + suffix))
                    continue
            df = stats.vint()
            ttf = df + stats.vlong() if has_freqs else df
            # legacy inline metadata (postingsReader.go:227-275)
            singleton = None
            if df == 1:
                singleton = meta.vint()
            else:
                doc_fp += meta.vlong()
            if has_positions:
                pos_fp += meta.vlong()
                if ttf > BLOCK_SIZE:
                    meta.vlong()  # lastPosBlockOffset
            if df > BLOCK_SIZE:
                meta.vlong()  # skipOffset
            out.append(_Term(prefix + suffix, df, ttf, doc_fp, pos_fp, singleton))
        for sub_fp, sub_prefix in sub_fps:
            _read_blocks(data, sub_fp, sub_prefix, has_freqs, has_positions, out)
        if is_last_in_floor:
            break


def read_terms(index_dir: str, segment: str = "_0") -> dict[str, list[_Term]]:
    """field name -> [_Term] for every term in the dictionary."""
    d = Path(index_dir)
    infos = read_field_infos(str(d / f"{segment}.fnm"))
    data = (d / f"{segment}_Lucene41_0.tim").read_bytes()
    inp = _In(data)
    version = _check_header(inp, "BLOCK_TREE_TERMS_DICT")
    if version < 1:  # pre append-only: dirOffset after header
        dir_offset = struct.unpack(">q", inp.read(8))[0]
    elif version >= 3:  # checksum: before the 16-byte footer
        dir_offset = struct.unpack(">q", data[-24:-16])[0]
    else:
        dir_offset = struct.unpack(">q", data[-8:])[0]
    s = _In(data)
    s.p = dir_offset
    out: dict[str, list[_Term]] = {}
    for _ in range(s.vint()):
        fnum = s.vint()
        s.vlong()  # numTerms
        root_code = _In(s.read(s.vint()))
        info = infos[fnum]
        if info["has_freqs"]:
            s.vlong()  # sumTotalTermFreq
        s.vlong()      # sumDocFreq
        s.vint()       # docCount
        if version >= 2:
            s.vint()   # longsSize
        if version >= 4:
            s.read(s.vint())  # minTerm
            s.read(s.vint())  # maxTerm
        root_fp = root_code.vlong() >> OUTPUT_FLAGS_BITS
        terms: list[_Term] = []
        _read_blocks(data, root_fp, b"", info["has_freqs"], info["has_positions"], terms)
        out[info["name"]] = terms
    return out


def read_postings(index_dir: str, field: str, segment: str = "_0"):
    """-> {term(str): [(doc_id, freq, [positions])]} for every term of
    ``field`` (vint paths only: df, ttf <= 128)."""
    d = Path(index_dir)
    terms = read_terms(index_dir, segment)[field]
    doc_data = (d / f"{segment}_Lucene41_0.doc").read_bytes()
    pos_path = d / f"{segment}_Lucene41_0.pos"
    pos_data = pos_path.read_bytes() if pos_path.exists() else b""
    out: dict[str, list] = {}
    for t in terms:
        # df <= 128 keeps doc lists on the vint path (every fixture:
        # <=16 docs); positions are decoded only when ttf <= 128 —
        # beyond that Lucene packs a ForUtil block, which the golden
        # tests don't need (counts/scores use only df/freq/dl)
        assert t.df <= BLOCK_SIZE, "packed doc blocks not implemented"
        docs: list[tuple[int, int]] = []
        if t.singleton is not None:
            docs = [(t.singleton, t.ttf)]
        else:
            din = _In(doc_data)
            din.p = t.doc_fp
            doc = 0
            for _ in range(t.df):
                code = din.vint()
                doc += code >> 1
                freq = 1 if (code & 1) else din.vint()
                docs.append((doc, freq))
        postings = []
        if pos_data and t.ttf <= BLOCK_SIZE:
            pin = _In(pos_data)
            pin.p = t.pos_fp
            for doc, freq in docs:
                pos, plist = 0, []
                for _ in range(freq):
                    pos += pin.vint()
                    plist.append(pos)
                postings.append((doc, freq, plist))
        else:
            postings = [(doc, freq, []) for doc, freq in docs]
        out[t.term.decode("utf-8")] = postings
    return out


def reconstruct_token_streams(index_dir: str, field: str,
                              segment: str = "_0") -> dict[int, list[str]]:
    """Invert the postings back to per-doc token streams: doc_id ->
    [token at position 0, 1, ...] (None-free; gaps collapse)."""
    inverted = read_postings(index_dir, field, segment)
    per_doc: dict[int, dict[int, str]] = {}
    for term, postings in inverted.items():
        for doc, _freq, positions in postings:
            slot = per_doc.setdefault(doc, {})
            for p in positions:
                slot[p] = term
    return {
        doc: [slot[p] for p in sorted(slot)] for doc, slot in per_doc.items()
    }


def read_norms(index_dir: str, segment: str = "_0") -> dict[str, list[int]]:
    """field name -> per-doc norm bytes, from the Lucene41Norms
    (Lucene42DocValues UNCOMPRESSED) .nvm/.nvd pair
    (core/codec/lucene42/docValuesProducer.go:136-239)."""
    d = Path(index_dir)
    infos = read_field_infos(str(d / f"{segment}.fnm"))
    meta = _In((d / f"{segment}.nvm").read_bytes())
    _check_header(meta, "Lucene41NormsMetadata")
    entries: dict[int, tuple[int, int]] = {}  # field -> (offset, format)
    while True:
        fnum = meta.vint()
        if fnum == 0x0FFFFFFFF or meta.eof():  # -1 terminator as vint
            break
        ftype = meta.u8()
        assert ftype == 0, f"only NUMERIC norms supported, got {ftype}"
        offset = struct.unpack(">q", meta.read(8))[0]
        fmt_ = meta.u8()
        if fmt_ != 2:  # UNCOMPRESSED
            raise NotImplementedError(f"norms format {fmt_}")
        entries[fnum] = (offset, fmt_)
        if meta.p + 1 >= len(meta.b):
            break
    data = (d / f"{segment}.nvd").read_bytes()
    # maxDoc: infer from consecutive offsets (uncompressed = maxDoc
    # bytes per field) or file remainder for the last field
    offs = sorted(o for o, _ in entries.values())
    sizes = {o: (offs[i + 1] - o if i + 1 < len(offs) else len(data) - o)
             for i, o in enumerate(offs)}
    return {
        infos[f]["name"]: list(data[o:o + sizes[o]])
        for f, (o, _) in entries.items()
    }
