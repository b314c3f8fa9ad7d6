"""Test-support: execute the reference StandardTokenizer DFA.

Parses the packed JFlex tables out of the READ-ONLY reference file
/root/reference/analysis/standard/tokenizerImpl.go at test time and runs
the standard JFlex scan loop over them.  This gives us the reference
tokenizer's exact behavior as a golden oracle for our own from-scratch
UAX#29 implementation (golucene_spark/analysis/wordbreak.py) WITHOUT
porting or copying the tables into the engine.

Only used by tests; never imported by golucene_spark.
"""

from __future__ import annotations

import re
from functools import lru_cache
from pathlib import Path

REF = Path("/root/reference/analysis/standard/tokenizerImpl.go")

# action switch labels -> type names (tokenizerImpl.go:595-617)
ACTION_TYPES = {2: "WORD", 3: "HANGUL", 4: "NUMERIC", 5: "KATAKANA",
                6: "IDEOGRAPHIC", 7: "HIRAGANA", 8: "SEA"}


def _parse_go_ints(block: str) -> list[int]:
    out = []
    for tok in re.findall(r"int\('\\u([0-9a-fA-F]{4})'\)|(\d+)", block):
        if tok[0]:
            out.append(int(tok[0], 16))
        else:
            s = tok[1]
            out.append(int(s, 8) if s.startswith("0") and len(s) > 1 else int(s))
    return out


def _extract(src: str, name: str) -> list[int]:
    m = re.search(re.escape(name) + r"[^{]*\{(.*?)\}\)?\n", src, re.S)
    if not m:
        m = re.search(re.escape(name) + r"\s*=\s*\w+\(\[\]int\{(.*?)\}\)", src, re.S)
    return _parse_go_ints(m.group(1))


def _run_length(pairs: list[int]) -> list[int]:
    out = []
    for i in range(0, len(pairs), 2):
        out.extend([pairs[i + 1]] * pairs[i])
    return out


@lru_cache(maxsize=1)
def tables():
    src = REF.read_text()
    cmap_pairs = _parse_go_ints(
        re.search(r"ZZ_CMAP_PACKED = \[\]int\{(.*?)\n\}", src, re.S).group(1))
    cmap = _run_length(cmap_pairs)
    assert len(cmap) == 0x110000, len(cmap)

    action = _run_length(_extract(src, "ZZ_ACTION = zzUnpackAction"))
    rowmap_pairs = _parse_go_ints(
        re.search(r"ZZ_ROWMAP = zzUnpackRowMap\(\[\]int\{(.*?)\}\)", src, re.S).group(1))
    rowmap = [(rowmap_pairs[i] << 16) | rowmap_pairs[i + 1]
              for i in range(0, len(rowmap_pairs), 2)]
    # Transcription bug in the Go port: row 7 is written `176` (decimal)
    # where the upstream JFlex output (rows at stride 18) requires octal
    # 0176 = 126.  Model the intended table.
    if rowmap[7] == 176:
        rowmap[7] = 126
    trans_pairs = _parse_go_ints(
        re.search(r"ZZ_TRANS = zzUnpackTrans\(\[\]int\{(.*?)\}\)", src, re.S).group(1))
    trans = []
    for i in range(0, len(trans_pairs), 2):
        trans.extend([trans_pairs[i + 1] - 1] * trans_pairs[i])
    # Second transcription bug: the Go zzUnpackAttribute double-increments
    # its index (stride 4), dropping half the pairs.  JFlex's attribute
    # unpack is plain run-length at stride 2 (24 entries) — use that.
    attr_pairs = _parse_go_ints(
        re.search(r"ZZ_ATTRIBUTE = zzUnpackAttribute\(\[\]int\{(.*?)\}\)", src, re.S).group(1))
    attr = _run_length(attr_pairs)
    assert len(attr) == 24, len(attr)
    return cmap, action, rowmap, trans, attr


def tokenize(text: str, max_token_length: int = 255):
    """Reference-equivalent token stream: [(raw_token, position)] with
    Lucene position-increment semantics (too-long tokens skipped but
    positions bumped, tokenizer.go:114-131)."""
    cmap, action_tab, rowmap, trans, attr = tables()
    cps = [ord(c) for c in text]
    n = len(cps)
    pos = 0
    out = []
    position = -1
    skipped = 0
    while pos < n:
        state = 0
        act = -1
        marked = pos
        if attr[state] & 1:
            act = state
        cur = pos
        while cur < n:
            nxt = trans[rowmap[state] + cmap[cps[cur]]]
            if nxt == -1:
                break
            state = nxt
            cur += 1
            if attr[state] & 1:
                act = state
                marked = cur
                if attr[state] & 8:
                    break
        if act == -1:
            # no rule matched (shouldn't happen: fallback rules cover all)
            pos += 1
            continue
        cond = action_tab[act]
        tok = text[pos:marked]
        pos = marked if marked > pos else pos + 1
        if cond in ACTION_TYPES:
            if len(tok) <= max_token_length:
                position += skipped + 1
                skipped = 0
                out.append((tok, position))
            else:
                skipped += 1
        # other actions: ignore (whitespace/punct)
    return out


def analyze(text: str, stop_words=None):
    """Full reference chain: tokenize -> lowercase -> stop (gaps kept)."""
    from golucene_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    stop = ENGLISH_STOP_WORDS if stop_words is None else stop_words
    return [(t.lower(), p) for t, p in tokenize(text) if t.lower() not in stop]


if __name__ == "__main__":
    import sys
    for s in sys.argv[1:] or ["The Quick-Brown FOX", "3.14 x 1,024 foo.bar snake_case don't",
                              "a an and are", "日本語 テスト ホッケー"]:
        print(repr(s), "->", tokenize(s))
