"""HTML parsing: extracted text, content digest, links, charset guessing.

Reimplements (from scratch, regex-scanner-based — no Jericho) the
*observable semantics* of the reference's parser:

- Digest stream (``parser/HTMLParser.java:152-299``, DigestAppendable):
  start/end tags case-normalized to ``<name>``/``</name>``; non-HTML
  element names become ``<unknown>``; all attributes dropped except the
  ``src`` of FRAME/IFRAME which is appended quoted; digits and whitespace
  runs coalesce to a single space (tags count as non-whitespace and reset
  the run); SCRIPT/STYLE content skipped; the page's host (+ a NUL) salts
  the digest first; 3xx responses additionally mix in location and META
  location (``HTMLParser.java:636-643``).
- Extracted text = the character-data part of that same stream (the tag
  tokens and the host salt are digest-only).  This is the byte-identical
  per-URL invariant the synthetic pages table carries in its ``text``
  column.
- Links (``HTMLParser.java:538-602``): href of A (unless rel=nofollow) /
  AREA / LINK, src of IMG / SCRIPT / IFRAME / FRAME / EMBED, data of
  OBJECT, ``<base href>`` re-basing, META refresh (``URL=...``) and META
  location, all resolved against the base and BURL-canonicalized.
- Charset guess (``HTMLParser.java:465-509,666-736``): Content-Type
  header param, else a scan of the head bytes for a META charset,
  fallback ISO-8859-1.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata
from dataclasses import dataclass, field
from html import unescape

import numpy as np
import pyarrow as pa

from . import burl

# HTML element names (public HTML4/5 sets — mirrors the role of Jericho's
# HTMLElements.getElementNames(); anything else digests as <unknown>).
KNOWN_ELEMENTS = frozenset(
    """a abbr acronym address applet area article aside audio b base basefont
    bdi bdo big blockquote body br button canvas caption center cite code col
    colgroup data datalist dd del details dfn dialog dir div dl dt em embed
    fieldset figcaption figure font footer form frame frameset h1 h2 h3 h4 h5
    h6 head header hgroup hr html i iframe img input ins isindex kbd label
    legend li link main map mark menu menuitem meta meter nav noframes
    noscript object ol optgroup option output p param picture pre progress q
    rp rt ruby s samp script section select slot small source span strike
    strong style sub summary sup table tbody td template textarea tfoot th
    thead time title tr track tt u ul var video wbr""".split()
)

_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"                       # comment
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"             # CDATA
    r"|<![^>]*>"                              # doctype / other declarations
    r"|<\?[^>]*>"                             # processing instruction
    r"|</\s*([a-zA-Z][a-zA-Z0-9:_.-]*)[^>]*>"   # end tag  (group 1)
    r"|<([a-zA-Z][a-zA-Z0-9:_.-]*)"             # start tag (group 2)
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(>?)",   # attrs (3), close (4)
    re.S,
)

_ATTR_RE = re.compile(
    r"([a-zA-Z][a-zA-Z0-9_:.-]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?"
)

# digest byte strings per tag, precomputed once: the tokenizer loop
# runs per tag occurrence, so name.encode()+concat there is measurable
_END_TAG_BYTES = {n: b"</" + n.encode() + b">" for n in KNOWN_ELEMENTS}
_START_TAG_BYTES = {n: b"<" + n.encode() + b">" for n in KNOWN_ELEMENTS}
_RAWTEXT_END_RE = {
    n: re.compile(r"</\s*" + n + r"\s*>", re.I) for n in ("script", "style")
}
# start tags needing per-tag work (links / base / meta / digest salt /
# raw-text skip): one frozenset probe gates the whole branch chain
_SPECIAL_START = frozenset(
    ("iframe", "frame", "embed", "img", "script", "object", "a", "area",
     "link", "base", "meta", "style")
)

_CHARSET_HEADER_RE = re.compile(r"charset\s*=\s*\"?\s*([\w:.()-]+)", re.I)
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([\w:.()-]+)", re.I | re.S
)
_URLEQUAL_RE = re.compile(r"URL=", re.I)

# Java Character.isWhitespace: Unicode space separators EXCEPT no-break
# spaces, plus the usual control whitespace.
_JAVA_WS = set("\t\n\x0b\f\r\x1c\x1d\x1e\x1f ")
_NBSP = {" ", " ", " "}


def _is_ws_or_digit(c: str) -> bool:
    if c in _JAVA_WS:
        return True
    if "0" <= c <= "9":
        return True
    o = ord(c)
    if o < 128:
        return False
    if c in _NBSP:
        return False
    cat = unicodedata.category(c)
    return cat in ("Zs", "Zl", "Zp") or cat == "Nd"


# fast path: for pure-ASCII character data, one regex collapses
# digit/whitespace runs exactly like the per-char state machine
_ASCII_RUN_RE = re.compile(r"[0-9\t\n\x0b\f\r\x1c\x1d\x1e\x1f ]+")
# needs-rewrite detector: a digit, a non-space whitespace char, or two
# spaces in a row.  When absent, every digit/ws run in the chunk is a
# single " " and _ASCII_RUN_RE.sub is the identity — typical character
# data, so skipping the sub's per-match rebuild is ~2.3x on the
# normalize path (the parse profile's hottest line)
_ASCII_DIRTY_RE = re.compile(r"[0-9\t\n\x0b\f\r\x1c\x1d\x1e\x1f]|  ")
_NONASCII_RE = re.compile(r"[^\x00-\x7f]")


def normalize_text(s: str, last_was_space: bool = False) -> tuple[str, bool]:
    """Apply the DigestAppendable character rule to a chunk of character
    data: every maximal run of digits/whitespace becomes one space (none
    if the previous appended char was already a space)."""
    if not s:
        return "", last_was_space
    if s.isascii():
        if _ASCII_DIRTY_RE.search(s) is not None:
            out = _ASCII_RUN_RE.sub(" ", s)
        else:
            out = s
    else:
        buf = []
        prev_space = False
        for c in s:
            if _is_ws_or_digit(c):
                if not prev_space:
                    buf.append(" ")
                    prev_space = True
            else:
                buf.append(c)
                prev_space = False
        out = "".join(buf)
    if last_was_space and out.startswith(" "):
        out = out[1:]
    if out:
        last = out.endswith(" ")
    else:
        last = last_was_space
    return out, last


@dataclass
class ParseResult:
    text: str
    digest: bytes  # 16 bytes (md5 of the digest stream)
    links: list[str] = field(default_factory=list)
    charset: str = "ISO-8859-1"
    location: str | None = None
    meta_location: str | None = None


def guess_charset(body: bytes, content_type: str | None = None) -> str:
    """Header charset, else META charset from the head bytes (interpreted
    latin-1, like the reference's buffer inspection), else ISO-8859-1."""
    if content_type:
        m = _CHARSET_HEADER_RE.search(content_type)
        if m:
            return m.group(1)
    m = _META_CHARSET_RE.search(body[:4096])
    if m:
        return m.group(1).decode("ascii", "replace")
    return "ISO-8859-1"


def _decode(body, charset: str) -> str:
    # str(buffer, enc, errors) decodes bytes AND memoryview — the batch
    # driver passes zero-copy Arrow views, not bytes copies
    try:
        return str(body, charset, "replace")
    except LookupError:
        return str(body, "ISO-8859-1", "replace")


def _binary_views(col) -> list:
    """Per-row zero-copy memoryviews of an Arrow binary/string column
    (None for null rows): parsing a batch must not start by copying
    every page body out of the object store into Python bytes."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out: list = []
    for ch in chunks:
        n = len(ch)
        if n == 0:
            continue
        valid = ch.is_valid().to_numpy(zero_copy_only=False) if ch.null_count else None
        bufs = ch.buffers()
        wide = pa.types.is_large_binary(ch.type) or pa.types.is_large_string(ch.type)
        offs = np.frombuffer(
            bufs[1], np.int64 if wide else np.int32,
            count=n + 1, offset=ch.offset * (8 if wide else 4),
        )
        mv = memoryview(bufs[2])
        for i in range(n):
            if valid is not None and not valid[i]:
                out.append(None)
            else:
                out.append(mv[offs[i]:offs[i + 1]])
    return out


def binary_buffer_offsets(col):
    """``(data_bytes, offsets)`` of an Arrow binary/string column as
    numpy views, handling 64-bit (``large_*``) offsets — the single
    owner of the vectorized byte-scan setup (also used by
    ops/filters.IsProbablyBinary and ops/multimodal.DecodeImageMeta,
    which each previously hand-rolled an int32-only copy that silently
    misread large-typed columns)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # older pyarrow: 1-chunk CA
        col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
    wide = pa.types.is_large_binary(col.type) or pa.types.is_large_string(col.type)
    buf = np.frombuffer(col.buffers()[2] or b"", dtype=np.uint8)
    off_buf = col.buffers()[1]
    if off_buf is None:
        offs = np.zeros(len(col) + 1, dtype=np.int64)
    else:
        offs = np.frombuffer(
            off_buf, dtype=np.int64 if wide else np.int32
        )[col.offset: col.offset + len(col) + 1]
    return buf, offs


def _attr(attrs_raw: str, wanted: str) -> str | None:
    for m in _ATTR_RE.finditer(attrs_raw):
        if m.group(1).lower() == wanted:
            v = m.group(2)
            if v is None:
                return ""
            if v[:1] in "\"'" and v[-1:] == v[:1]:
                v = v[1:-1]
            return unescape(v)
    return None


def parse_binary(
    url: str,
    body: bytes,
    cross_authority_duplicates: bool = False,
) -> "ParseResult":
    """Digest-only fallback for non-text bodies — the BinaryParser
    (parser/BinaryParser.java:75-92): hash of host + NUL + raw bytes
    (``hasher.putUnencodedChars(url.getHost()); putByte(0)``) unless
    cross-authority duplicate detection is on; no text, no links.  The
    same salt as the HTML path, so dedup scope does not depend on which
    parser handled the body.
    """
    h = hashlib.md5()
    if not cross_authority_duplicates and url:
        h.update(burl.host_of(burl.scheme_authority(url)).encode("utf-8"))
        h.update(b"\x00")
    h.update(body)
    return ParseResult(
        text="", digest=h.digest(), charset=None, links=[],
        location=None, meta_location=None,
    )


def parse_html(
    url: str,
    body: bytes | str,
    status: int = 200,
    content_type: str | None = None,
    location_header: str | None = None,
    cross_authority_duplicates: bool = False,
    follow_nofollow: bool = False,
) -> ParseResult:
    """Parse one page: digest stream + extracted text + links.

    With ``cross_authority_duplicates=False`` (default) the page's host
    salts the digest, so identical content on different hosts digests
    differently — the behavior the reference's test pairs encode
    (``digestAppendable.init(crossAuthorityDuplicates ? null : uri)``,
    HTMLParser.java:537).  Pass True to detect duplicates across hosts.
    """
    if not isinstance(body, str):  # bytes or zero-copy memoryview
        charset = guess_charset(body, content_type)
        html = _decode(body, charset)
    else:
        # a str body needs no decoding, but the recorded charset must
        # still be the LABEL from the header ('utf-8'), never the whole
        # Content-Type value — write_warc re-emits it as
        # BUbiNG-Guessed-Charset and a full media type there breaks
        # re-ingestion
        m = _CHARSET_HEADER_RE.search(content_type) if content_type else None
        charset = m.group(1) if m else "ISO-8859-1"
        html = body

    # digest pieces are buffered and hashed once at the end — md5 over
    # the concatenation is byte-identical to streaming updates, and one
    # C call per page beats one per token
    dig: list[bytes] = []
    dig_append = dig.append
    text_parts: list[str] = []
    links: list[str] = []
    seen_links: set[str] = set()

    def emit_link(u: str | None, base: str):
        if not u:
            return
        r = burl.resolve(base, u)
        if r is not None and r not in seen_links:
            seen_links.add(r)
            links.append(r)

    if not cross_authority_duplicates and url:
        sa = burl.scheme_authority(url)
        dig_append(burl.host_of(sa).encode("utf-8"))
        dig_append(b"\x00")

    base = url
    location = None
    meta_location = None
    if location_header:
        loc = burl.resolve(url, location_header)
        if loc is not None:
            location = loc
            if loc not in seen_links:
                seen_links.add(loc)
                links.append(loc)

    last_was_space = False
    pos = 0
    n = len(html)
    token_search = _TOKEN_RE.search
    while pos < n:
        m = token_search(html, pos)
        if m is None:
            chunk = html[pos:]
            pos = n
        else:
            tok_start, tok_end = m.span()
            chunk = html[pos:tok_start]
            pos = tok_end
        if chunk:
            t, last_was_space = normalize_text(unescape(chunk), last_was_space)
            if t:
                dig_append(t.encode("utf-8"))
                text_parts.append(t)
        if m is None:
            break
        end_name, start_name, attrs_raw, closed = m.groups()
        if end_name is not None:
            name = end_name.lower()
            dig_append(_END_TAG_BYTES.get(name, b"</unknown>"))
            last_was_space = False
        elif start_name is not None:
            name = start_name.lower()
            dig_append(_START_TAG_BYTES.get(name, b"<unknown>"))
            if name not in _SPECIAL_START:
                last_was_space = False
                continue
            if name in ("iframe", "frame"):
                src = _attr(attrs_raw, "src")
                if src is not None:
                    dig_append(b'"' + src.encode("utf-8", "replace") + b'"')
            last_was_space = False

            if name in ("iframe", "frame", "embed"):
                emit_link(_attr(attrs_raw, "src"), base)
            elif name in ("img", "script"):
                emit_link(_attr(attrs_raw, "src"), base)
            elif name == "object":
                emit_link(_attr(attrs_raw, "data"), base)
            elif name == "a":
                rel = _attr(attrs_raw, "rel")
                # rel is a space-separated token list per the HTML spec:
                # rel="nofollow noopener" must also suppress the link
                if follow_nofollow or not (
                    rel and "nofollow" in rel.lower().split()
                ):
                    emit_link(_attr(attrs_raw, "href"), base)
            elif name in ("area", "link"):
                emit_link(_attr(attrs_raw, "href"), base)
            elif name == "base":
                href = _attr(attrs_raw, "href")
                if href:
                    b = burl.parse(href)
                    if b is not None and "://" in b:
                        base = b
            elif name == "meta":
                equiv = _attr(attrs_raw, "http-equiv")
                content = _attr(attrs_raw, "content")
                if equiv and content is not None:
                    eq = equiv.lower()
                    if eq == "refresh":
                        um = _URLEQUAL_RE.search(content)
                        if um:
                            tgt = content[um.end():]
                            r = burl.resolve(base, tgt)
                            if r is not None and r not in seen_links:
                                seen_links.add(r)
                                links.append(r)
                    elif eq == "location":
                        r = burl.resolve(base, content)
                        if r is not None:
                            meta_location = r
                            if r not in seen_links:
                                seen_links.add(r)
                                links.append(r)

            # raw-text elements: skip content to the matching end tag
            # (search from pos, no html[pos:] slice — the copy made
            # script-heavy pages quadratic)
            if name in ("script", "style") and not attrs_raw.rstrip().endswith("/"):
                em = _RAWTEXT_END_RE[name].search(html, pos)
                if em:
                    pos = em.end()
                    dig_append(_END_TAG_BYTES[name])
                    last_was_space = False
                else:
                    pos = n

    # 3xx salt (HTMLParser.java:636-643)
    if status // 100 == 3:
        dig_append(b"\x00")
        if location:
            dig_append(location.encode("ascii", "replace"))
        dig_append(b"\x00")
        if meta_location:
            dig_append(meta_location.encode("ascii", "replace"))
        dig_append(b"\x00")

    return ParseResult(
        text="".join(text_parts),
        digest=hashlib.md5(b"".join(dig)).digest(),
        links=links,
        charset=charset,
        location=location,
        meta_location=meta_location,
    )


class ParseHTMLBatch:
    """Actor-pool/map_batches stage: parse a batch of fetched pages.

    Input columns: ``url: string, html: binary`` (optional ``status:
    int32``, ``content_type: string``, ``location: string``).  Appends
    ``text: string, digest: binary, digest64: uint64, charset: string,
    links: list<string>, n_links: int32``.

    Stateless per batch; exists as a class so configuration (nofollow,
    cross-authority) is applied once per actor (SURVEY.md §2.2).
    """

    def __init__(self, cross_authority_duplicates: bool = False, follow_nofollow: bool = False):
        self.cross = cross_authority_duplicates
        self.nofollow = follow_nofollow

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        bodies = _binary_views(batch.column("html"))
        status = (
            batch.column("status").to_pylist()
            if "status" in batch.column_names
            else [200] * len(urls)
        )
        ctype = (
            batch.column("content_type").to_pylist()
            if "content_type" in batch.column_names
            else [None] * len(urls)
        )
        loc = (
            batch.column("location").to_pylist()
            if "location" in batch.column_names
            else [None] * len(urls)
        )
        texts, digests, d64, charsets, links, n_links = [], [], [], [], [], []
        for i in range(len(urls)):
            # HTTP media types are case-insensitive (RFC 9110 §8.3.1):
            # 'Text/HTML' from a foreign WARC must route to the HTML
            # parser, not the binary one
            ct = ctype[i].lower() if ctype[i] is not None else None
            if ct is not None and not ct.startswith("text/") and "xml" not in ct:
                r = parse_binary(urls[i], bodies[i] or b"", self.cross)
                texts.append(r.text)
                digests.append(r.digest)
                d64.append(int.from_bytes(r.digest[:8], "big"))
                charsets.append(r.charset)
                links.append(r.links)
                n_links.append(0)
                continue
            r = parse_html(
                urls[i],
                bodies[i] or b"",
                status=status[i] or 200,
                content_type=ctype[i],
                location_header=loc[i],
                cross_authority_duplicates=self.cross,
                follow_nofollow=self.nofollow,
            )
            texts.append(r.text)
            digests.append(r.digest)
            d64.append(int.from_bytes(r.digest[:8], "big"))
            charsets.append(r.charset)
            links.append(r.links)
            n_links.append(len(r.links))
        new_cols = {
            "text": pa.array(texts, pa.string()),
            "digest": pa.array(digests, pa.binary(16)),
            "digest64": pa.array(np.array(d64, dtype=np.uint64)),
            "charset": pa.array(charsets, pa.string()),
            "links": pa.array(links, pa.list_(pa.string())),
            "n_links": pa.array(n_links, pa.int32()),
        }
        # replace any colliding input column (e.g. the synthetic table's
        # oracle `text`) rather than duplicating the field
        for name in list(new_cols):
            if name in batch.column_names:
                batch = batch.drop_columns([name])
        for name, arr in new_cols.items():
            batch = batch.append_column(name, arr)
        return batch
