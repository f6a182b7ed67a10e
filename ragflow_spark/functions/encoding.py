"""Encoding sniffing for raw-bytes ingestion (reference: find_codec,
rag/nlp/__init__.py:32-71 — chardet + 90-codec trial decode; html parser
binary path deepdoc/parser/html_parser.py:24-27).

Rebuilt without chardet (not in this container): BOM detection stands in
for the statistical detector, then the reference's full trial ladder in
its order (first strict decode of the 1 KiB head, then of the whole blob,
wins). Pure function → usable inside any Arrow batch kernel."""

from __future__ import annotations

_BOMS = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]

# the reference's trial ladder, same order (rag/nlp/__init__.py:32-51);
# first strict success wins, so order is semantics
TRIAL_CODECS = [
    "utf-8", "gb2312", "gbk", "utf_16", "ascii", "big5", "big5hkscs",
    "cp037", "cp273", "cp424", "cp437",
    "cp500", "cp720", "cp737", "cp775", "cp850", "cp852", "cp855", "cp856",
    "cp857", "cp858", "cp860", "cp861", "cp862", "cp863", "cp864", "cp865",
    "cp866", "cp869", "cp874", "cp875", "cp932", "cp949", "cp950", "cp1006",
    "cp1026", "cp1125", "cp1140", "cp1250", "cp1251", "cp1252", "cp1253",
    "cp1254", "cp1255", "cp1256", "cp1257", "cp1258", "euc_jp",
    "euc_jis_2004", "euc_jisx0213", "euc_kr", "gb18030", "hz", "iso2022_jp",
    "iso2022_jp_1", "iso2022_jp_2", "iso2022_jp_2004", "iso2022_jp_3",
    "iso2022_jp_ext", "iso2022_kr", "latin_1", "iso8859_2", "iso8859_3",
    "iso8859_4", "iso8859_5", "iso8859_6", "iso8859_7", "iso8859_8",
    "iso8859_9", "iso8859_10", "iso8859_11", "iso8859_13", "iso8859_14",
    "iso8859_15", "iso8859_16", "johab", "koi8_r", "koi8_t", "koi8_u",
    "kz1048", "mac_cyrillic", "mac_greek", "mac_iceland", "mac_latin2",
    "mac_roman", "mac_turkish", "ptcp154", "shift_jis", "shift_jis_2004",
    "shift_jisx0213", "utf_32", "utf_32_be", "utf_32_le", "utf_16_be",
    "utf_16_le", "utf_7", "windows-1250", "windows-1251", "windows-1252",
    "windows-1253", "windows-1254", "windows-1255", "windows-1256",
    "windows-1257", "windows-1258", "latin-2",
]


def find_codec(blob: bytes) -> str:
    """Best-effort codec for a byte blob; 'utf-8' is the never-fails lossy
    fallback as in the reference."""
    if not blob:
        return "utf-8"
    for bom, codec in _BOMS:
        if blob.startswith(bom):
            return codec
    head = blob[:1024]
    for codec in TRIAL_CODECS:
        try:
            head.decode(codec)
            return codec
        except Exception:  # noqa: BLE001 — LookupError for absent codecs too
            pass
        try:
            blob.decode(codec)
            return codec
        except Exception:  # noqa: BLE001
            pass
    return "utf-8"


def decode_blob(blob: bytes) -> str:
    """Decode with the sniffed codec (lossy-safe)."""
    return blob.decode(find_codec(blob), errors="replace")
