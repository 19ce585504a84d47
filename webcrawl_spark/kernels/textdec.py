"""Charset detection & text-extraction kernel.

Reference precedence (defines the byte-identical ``extracted_text``
invariant):

1. server-reported charset if valid, else UTF-8
   (``GetEncoding``, Backend/Crawler.cs:2085-2098). Our pages table carries
   no response headers, so the hint is normally None → UTF-8.
2. a BOM in the body overrides the chosen encoding and is stripped
   (.NET ``StreamReader`` with detectEncodingFromByteOrderMarks=true,
   Crawler.cs:1628-1631).
3. for HTML documents, a ``<meta http-equiv=content-type … charset=X>`` whose
   X is valid, differs from the current encoding's web name, and is not
   ``us-ascii`` forces a re-decode with X (Crawler.cs:1633-1656). A BOM still
   wins on the re-decode (StreamReader re-reads the same bytes).

Decode errors map to U+FFFD (``errors='replace'``), matching .NET's
replacement-fallback decoders.
"""

from __future__ import annotations

import codecs

import pandas as pd

from .links import META_RE

_BOMS = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def normalize_charset(name: str | None) -> str | None:
    """Valid canonical codec name or None (Encoding.GetEncoding throws → None)."""
    if not name:
        return None
    try:
        return codecs.lookup(name).name
    except LookupError:
        return None


def _decode(body: bytes, encoding: str) -> tuple[str, str]:
    """(text, effective_encoding) honoring BOM-over-hint + BOM strip."""
    for bom, enc in _BOMS:
        if body.startswith(bom):
            return body[len(bom):].decode(enc, errors="replace"), enc
    return body.decode(encoding, errors="replace"), encoding


def decode_body(
    body: bytes | None,
    charset_hint: str | None = None,
    resource_type: str = "html",
) -> tuple[str | None, str | None]:
    """Decode one body → (extracted_text, effective_charset).

    None body → (None, None) — a fetch failure, routed to retry.
    """
    if body is None:
        return None, None
    enc = normalize_charset(charset_hint) or "utf-8"
    text, eff = _decode(body, enc)
    if resource_type == "html":
        m = META_RE.search(text)
        if m:
            meta = m.group("cs1") or m.group("cs2")
            right = normalize_charset(meta)
            if right is not None and right != codecs.lookup(eff).name and right != "ascii":
                text, eff = _decode(body, right)
    return text, eff


def decode_batch(
    bodies: pd.Series,
    charset_hints: pd.Series | None,
    resource_types: pd.Series,
) -> pd.DataFrame:
    """Vectorized wrapper: Series[bytes] → DataFrame(text, charset).

    Fast path: bodies that are plain ASCII/UTF-8 without a meta tag dominate
    a real corpus; the per-element work is a single C-level ``bytes.decode``.
    """
    texts: list[str | None] = []
    charsets: list[str | None] = []
    hints = charset_hints if charset_hints is not None else pd.Series([None] * len(bodies), index=bodies.index)
    for body, hint, rtype in zip(bodies, hints, resource_types):
        if body is None or (isinstance(body, float) and pd.isna(body)):
            texts.append(None)
            charsets.append(None)
            continue
        t, c = decode_body(bytes(body), hint, rtype)
        texts.append(t)
        charsets.append(c)
    return pd.DataFrame({"text": texts, "charset": charsets}, index=bodies.index)
