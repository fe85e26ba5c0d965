"""Round-9 additions: cross-operator invariants and golden checks.

Same discipline as test_round7/8_properties.py: every new operator gets at
least one property that a wrong implementation would fail, checked against
either an independent pure-Python replica or a conservation law the algebra
must obey.
"""

from __future__ import annotations

import hashlib

import pytest

from rvi_big_data_api_spark.registry import REGISTRY


def _df(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


# --- mm_cdc_dedup: content-defined chunking ---------------------------------


def _cdc_boundaries(s: str, w: int = 8, nibble: str = "0") -> list[int]:
    """Pure-Python replica of the op's boundary rule: i in [w, len-1] is a
    boundary iff md5 of the w-byte window ENDING at i starts with `nibble`;
    len is always a boundary."""
    n = len(s)
    out = [
        i
        for i in range(w, n)
        if hashlib.md5(s[i - w : i].encode()).hexdigest()[0] == nibble
    ]
    if n >= 1:
        out.append(n)
    return out


def _cdc_chunks(s: str) -> list[tuple[int, int, str]]:
    """(start, end, content] spans from the boundary list."""
    spans, prev = [], 0
    for b in _cdc_boundaries(s):
        spans.append((prev, b, s[prev:b]))
        prev = b
    return spans


@pytest.mark.parametrize("edit_frac", [0.25, 0.5, 0.75])
def test_cdc_insertion_is_local(duck, edit_frac):
    """THE CDC property (VERDICT r8 item 5's done-gate): inserting one byte
    changes only the chunks at the edit site. Chunks ending before the edit
    are bit-identical; chunks starting >= CDC_W-1 past it survive with spans
    shifted by exactly +1; at most a handful of edit-zone chunks differ."""
    from rvi_big_data_api_spark.operators.multimodal import CDC_W

    texts = [
        r[0]
        for r in duck.execute(
            "SELECT text FROM documents WHERE length(text) > 80 "
            "ORDER BY doc_id LIMIT 12"
        ).fetchall()
    ]
    assert texts
    for s in texts:
        p = int(len(s) * edit_frac)
        s2 = s[:p] + "X" + s[p:]
        old = _cdc_chunks(s)
        new = _cdc_chunks(s2)
        new_set = set(new)
        # prefix chunks (ending at or before the edit) are untouched: every
        # boundary i <= p reads only bytes [i-W, i-1] < p
        for span in old:
            if span[1] <= p:
                assert span in new_set, (p, span)
        # suffix chunks (start boundary's window fully past the edit, i.e.
        # st - W >= p) shift by exactly +1 with identical content — the
        # property FIXED-POSITION chunking (mm_chunk_bytes) fails
        for (st, en, content) in old:
            if st >= p + CDC_W:
                assert (st + 1, en + 1, content) in new_set, (p, st, en)
        # the re-chunked zone is bounded: the non-surviving chunks span a
        # contiguous byte range no wider than two old chunks plus the window
        changed = [
            sp for sp in old if not (sp[1] <= p or sp[0] >= p + CDC_W)
        ]
        assert changed, "the chunk containing the edit must change"
        max_chunk = max(en - st for st, en, _ in old)
        zone = max(en for _, en, _ in changed) - min(st for st, _, _ in changed)
        assert zone <= 2 * max_chunk + CDC_W, (p, zone, max_chunk)
        # chunking partitions the blob on both sides
        assert "".join(c for _, _, c in new) == s2


def test_cdc_ledger_matches_python_replica(spark, sf_dir, duck):
    """Per-doc (n_chunks, n_bytes, n_dup_chunks) from the Spark op equal an
    independent pure-Python recomputation over the same corpus — the chunk
    GEOMETRY and the keep-first rule, not just row counts. n_bytes must
    reconstruct the doc exactly (chunking is a partition of the blob)."""
    rows = {
        r["doc_id"]: r
        for r in _df("mm_cdc_dedup", spark, sf_dir).collect()
    }
    docs = duck.execute(
        "SELECT doc_id, text FROM documents WHERE length(text) >= 1"
    ).fetchall()
    assert set(rows) == {d for d, _ in docs}
    # python keep-first over the whole corpus, ordered by (doc_id, start)
    first_owner: dict[str, tuple] = {}
    per_doc: dict[int, list] = {}
    for doc_id, text in sorted(docs):
        for st, en, content in _cdc_chunks(text):
            h = hashlib.md5(content.encode()).hexdigest()
            first_owner.setdefault(h, (doc_id, st))
            per_doc.setdefault(doc_id, []).append((st, en, h))
    for doc_id, text in docs:
        chunks = per_doc[doc_id]
        r = rows[doc_id]
        assert r["n_chunks"] == len(chunks), doc_id
        assert r["n_bytes"] == len(text), doc_id  # partition: bytes conserve
        n_dup = sum(1 for st, en, h in chunks if first_owner[h] != (doc_id, st))
        assert r["n_dup_chunks"] == n_dup, doc_id
        # full-duplicate docs legitimately store 0 ppm (every chunk first
        # seen in the earlier twin) — the savings CDC exists to realize
        assert 0 <= r["stored_ppm"] <= 1_000_000, doc_id
