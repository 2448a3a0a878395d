"""Multimodal decode: runtime codec dispatch and kernel pins.

The decode operator is ENV-CONDITIONAL (multimodal.py _pick_decoder):
real PIL decode when Pillow is importable, deterministic digest stub
otherwise. These tests pin BOTH branches without requiring Pillow in the
container — the real path is driven through an injected minimal PIL
module, so nothing here ever skips.
"""

from __future__ import annotations

import sys
import types

from roar_spark.operators.multimodal import (
    _fake_decode,
    _pick_decoder,
    _real_decode,
    multimodal_decode_stub,
)


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def test_decoder_dispatch_matches_environment():
    # dispatch is decided by importability alone — in this container that
    # means the stub; in a Pillow-equipped deployment, the real decoder
    expected = _real_decode if _pil_available() else _fake_decode
    assert _pick_decoder() is expected


def test_real_decode_path_with_injected_pil(monkeypatch):
    """Drive the REAL branch without Pillow: a minimal injected PIL whose
    Image.open honors the context-manager protocol. Proves the dispatch
    flips to _real_decode and that the kernel reads format/size/bands the
    way Pillow exposes them."""

    class _Img:
        format = "PNG"
        width = 320
        height = 200

        def getbands(self):
            return ("R", "G", "B")

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class _Image:
        @staticmethod
        def open(fp):
            if fp.read(4) != b"\x89PNG":
                raise ValueError("cannot identify image file")
            return _Img()

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = _Image.open
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    assert _pick_decoder() is _real_decode
    assert _real_decode(b"\x89PNG....") == ("png", 320, 200, 3)
    # corrupt payloads are a ROW outcome, not a batch failure
    assert _real_decode(b"not an image") == ("undecodable", None, None, None)


def test_fake_decode_is_deterministic_and_bounded():
    fmt, w, h, c = _fake_decode(b"payload")
    assert (fmt, w, h, c) == _fake_decode(b"payload")
    assert fmt in ("jpeg", "png", "webp")
    assert 64 <= w < 256 and 64 <= h < 256 and 1 <= c <= 3


def test_decode_operator_end_to_end(spark):
    """The operator's Arrow plumbing: fixed typed schema, one output row
    per document, values equal to the dispatched kernel's own answer."""
    rows = multimodal_decode_stub(spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert rows[0].asDict().keys() == {
        "doc_id", "n_bytes", "format", "width", "height", "n_channels",
    }
    decode = _pick_decoder()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert len(rows) == len(docs)
    for r in rows[:25]:
        payload = docs[r.doc_id].encode("utf-8")
        assert (r.format, r.width, r.height, r.n_channels) == decode(payload)
        assert r.n_bytes == len(payload)
