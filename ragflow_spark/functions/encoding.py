"""Encoding sniffing for raw-bytes ingestion (reference: find_codec,
rag/nlp/__init__.py:32-71 — chardet + 90-codec trial decode; html parser
binary path deepdoc/parser/html_parser.py:24-27).

Rebuilt without chardet (not in this container): BOM detection, strict
UTF-8 trial, then a deterministic trial ladder over the encodings that
cover the reference's fixture corpus. Pure function → usable inside any
Arrow batch kernel."""

from __future__ import annotations

_BOMS = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]

# trial ladder (order matters; first strict success wins)
TRIAL_CODECS = ["utf-8", "gb18030", "big5", "shift_jis", "latin-1"]


def find_codec(blob: bytes) -> str:
    """Best-effort codec for a byte blob; latin-1 is the never-fails
    fallback (as in the reference's final 'utf-8' lossy fallback)."""
    if not blob:
        return "utf-8"
    for bom, codec in _BOMS:
        if blob.startswith(bom):
            return codec
    for codec in TRIAL_CODECS:
        try:
            blob.decode(codec)
            return codec
        except (UnicodeDecodeError, LookupError):
            continue
    return "latin-1"


def decode_blob(blob: bytes) -> str:
    """Decode with the sniffed codec (lossy-safe)."""
    return blob.decode(find_codec(blob), errors="replace")
