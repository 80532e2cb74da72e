"""Filter atoms + boolean combinators — the rebuild of BUbiNG's filter
mini-language (warc/filters/Filters.java:44-171) as composable,
vectorized predicate objects.

Each predicate maps an Arrow batch (pages/store schema: url, status,
content_type, html, digest, ...) to a boolean numpy mask; combinators
and/or/not compose them. Apply with ``apply_filter(ds, pred)`` (one
``map_batches`` stage) — the column each atom needs is declared so a
reading stage can prune to exactly the used columns.

Atom inventory mirrors warc/filters/ (15 atoms):
ContentTypeStartsWith, DigestEquals, DuplicateSegmentsLessThan,
HostEndsWith(OneOf), HostEquals, IsHttpResponse, IsProbablyBinary,
PathEndsWithOneOf, ResponseMatches, SchemeEquals, StatusCategory,
URLEquals, URLMatchesRegex, URLShorterThan, SameHost(+base), plus
TRUE/FALSE and and/or/not (Filters.java:61-171).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import burl


def _mask(arr) -> np.ndarray:
    return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=bool)


class Pred:
    """Base predicate: callable batch -> bool ndarray; composable."""

    columns: tuple[str, ...] = ()

    def __call__(self, batch: pa.Table) -> np.ndarray:
        raise NotImplementedError

    def __and__(self, other):
        return And(self, other)

    def __or__(self, other):
        return Or(self, other)

    def __invert__(self):
        return Not(self)


class And(Pred):
    def __init__(self, *preds):
        self.preds = preds
        self.columns = tuple({c for p in preds for c in p.columns})

    def __call__(self, batch):
        m = self.preds[0](batch)
        for p in self.preds[1:]:
            m = m & p(batch)
        return m


class Or(Pred):
    def __init__(self, *preds):
        self.preds = preds
        self.columns = tuple({c for p in preds for c in p.columns})

    def __call__(self, batch):
        m = self.preds[0](batch)
        for p in self.preds[1:]:
            m = m | p(batch)
        return m


class Not(Pred):
    def __init__(self, pred):
        self.pred = pred
        self.columns = pred.columns

    def __call__(self, batch):
        return ~self.pred(batch)


class Const(Pred):
    def __init__(self, value: bool):
        self.value = value

    def __call__(self, batch):
        return np.full(batch.num_rows, self.value, dtype=bool)


TRUE = Const(True)
FALSE = Const(False)


class _StrCol(Pred):
    def __init__(self, col: str):
        self.col = col
        self.columns = (col,)

    def _vals(self, batch: pa.Table):
        return pc.fill_null(batch.column(self.col), "")


class ContentTypeStartsWith(_StrCol):
    """warc/filters/ContentTypeStartsWith.java — header prefix match."""

    def __init__(self, prefix: str, col: str = "content_type"):
        super().__init__(col)
        self.prefix = prefix

    def __call__(self, batch):
        return _mask(pc.starts_with(self._vals(batch), self.prefix))


class SchemeEquals(_StrCol):
    def __init__(self, scheme: str, col: str = "url"):
        super().__init__(col)
        self.scheme = scheme + "://"

    def __call__(self, batch):
        return _mask(pc.starts_with(self._vals(batch), self.scheme))


class URLEquals(_StrCol):
    def __init__(self, url: str, col: str = "url"):
        super().__init__(col)
        self.url = burl.parse(url) or url

    def __call__(self, batch):
        return _mask(pc.equal(self._vals(batch), self.url))


class URLMatchesRegex(_StrCol):
    def __init__(self, pattern: str, col: str = "url"):
        super().__init__(col)
        self.pattern = pattern

    def __call__(self, batch):
        return _mask(pc.match_substring_regex(self._vals(batch), self.pattern))


class URLShorterThan(_StrCol):
    def __init__(self, n: int, col: str = "url"):
        super().__init__(col)
        self.n = n

    def __call__(self, batch):
        return _mask(pc.less(pc.utf8_length(self._vals(batch)), self.n))


class HostEquals(_StrCol):
    def __init__(self, host: str, col: str = "url"):
        super().__init__(col)
        self.host = host.lower()

    def __call__(self, batch):
        hosts = pc.extract_regex(self._vals(batch), r"^[a-z]+://(?:[^/@]*@)?(?P<h>[^/:?#]+)")
        h = pc.fill_null(pc.struct_field(hosts, "h"), "")
        return _mask(pc.equal(h, self.host))


class HostEndsWithOneOf(_StrCol):
    """warc/filters/HostEndsWithOneOf.java — dot-boundary suffix match."""

    def __init__(self, suffixes, col: str = "url"):
        super().__init__(col)
        alts = "|".join(re.escape(s.lower().lstrip(".")) for s in suffixes)
        self.pattern = rf"^[a-z]+://(?:[^/@]*@)?([^/:?#]*\.)?({alts})([/:?#].*)?$"

    def __call__(self, batch):
        return _mask(pc.match_substring_regex(self._vals(batch), self.pattern))


def HostEndsWith(suffix: str, col: str = "url"):
    return HostEndsWithOneOf([suffix], col=col)


class PathEndsWithOneOf(_StrCol):
    """Case-insensitive suffix match on the path (query stripped),
    warc/filters/PathEndsWithOneOf.java."""

    def __init__(self, suffixes, col: str = "url"):
        super().__init__(col)
        alts = "|".join(re.escape(s.lower()) for s in suffixes)
        # the suffix must end the PATH (reference tests uri.getPath()
        # only): require scheme://authority/ first, or a host that
        # merely ends in '.jpg' with no path would match
        self.pattern = (
            rf"(?i)^[a-z][a-z0-9+.\-]*://[^/?#]*/[^?#]*({alts})([?#].*)?$")

    def __call__(self, batch):
        return _mask(pc.match_substring_regex(self._vals(batch), self.pattern))


class SameHost(Pred):
    """True when src_url and dst_url share a host (warc/filters/SameHost)."""

    columns = ("src_url", "dst_url")

    def __call__(self, batch):
        pat = r"^[a-z]+://(?:[^/@]*@)?(?P<h>[^/:?#]+)"
        hs = pc.struct_field(pc.extract_regex(batch.column("src_url"), pat), "h")
        hd = pc.struct_field(pc.extract_regex(batch.column("dst_url"), pat), "h")
        return _mask(pc.equal(pc.fill_null(hs, ""), pc.fill_null(hd, "\0")))


class StatusCategory(Pred):
    """status/100 == category (warc/filters/StatusCategory.java)."""

    columns = ("status",)

    def __init__(self, category: int):
        self.category = category

    def __call__(self, batch):
        st = pc.fill_null(batch.column("status"), 0)
        return _mask(pc.equal(pc.divide(st, 100), self.category))


class IsHttpResponse(Pred):
    """Row represents an HTTP response (has a status)."""

    columns = ("status",)

    def __call__(self, batch):
        return _mask(pc.is_valid(batch.column("status")))


class DigestEquals(Pred):
    columns = ("digest",)

    def __init__(self, digest_hex: str):
        self.digest = bytes.fromhex(digest_hex)

    def __call__(self, batch):
        return _mask(pc.equal(batch.column("digest"), self.digest))


class IsProbablyBinary(Pred):
    """>=3 NUL bytes in the first 1000 body bytes
    (warc/filters/IsProbablyBinary.java:48-63)."""

    columns = ("html",)
    THRESHOLD = 3
    PREFIX = 1000

    def __call__(self, batch):
        from ..html_parser import binary_buffer_offsets

        buf, offs = binary_buffer_offsets(batch.column("html"))
        # prefix-sum of NUL positions -> per-row count in O(total bytes)
        is_nul = np.concatenate([[0], np.cumsum(buf == 0)])
        starts = offs[:-1]
        ends = np.minimum(offs[1:], starts + self.PREFIX)
        out = (is_nul[ends] - is_nul[starts]) >= self.THRESHOLD
        valid = _mask(pc.is_valid(batch.column("html")))
        return out & valid


class ResponseMatches(Pred):
    """Body matches a regex (warc/filters/ResponseMatches.java) —
    decoded ISO-8859-1 like the reference's byte-level scan."""

    columns = ("html",)

    def __init__(self, pattern: str):
        self.re = re.compile(pattern.encode("latin-1"))

    def __call__(self, batch):
        vals = batch.column("html").to_pylist()
        return np.array(
            [v is not None and self.re.search(v) is not None for v in vals], dtype=bool
        )


class DuplicateSegmentsLessThan(_StrCol):
    """Accept URIs whose path contains no segment block repeated >= n
    times consecutively (warc/filters/DuplicateSegmentsLessThan.java —
    the reference's suffix-array pass is equivalent to its own spec
    regex ``.*(/.*)\\1{n-1,}(/.*|$)``, DuplicateSegmentsLessThan.java:72-76,
    which a backreference regex expresses directly; catches crawler
    traps like /a/a/a/... and /a/b/a/b/...)."""

    def __init__(self, n: int, col: str = "url"):
        super().__init__(col)
        if n < 2:
            raise ValueError("threshold must be at least 2")
        self.n = n
        self.re = re.compile(r"(/.+?)\1{%d,}(?=/|$)" % (n - 1))

    def __call__(self, batch):
        urls = self._vals(batch).to_pylist()
        out = np.empty(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            # strip query/fragment BEFORE locating the path: a '/'
            # inside '?x=/a/a/a' is not a path separator, and the
            # reference examines only the URI path
            rest = u.split("://", 1)[-1]
            rest = rest.split("?", 1)[0].split("#", 1)[0]
            path = rest[rest.find("/"):] if "/" in rest else "/"
            out[i] = self.re.search(path) is None
        return out


def apply_filter(ds, pred: Pred):
    """Dataset -> Dataset keeping rows where pred holds (one stage)."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(pred(batch)))

    return ds.map_batches(fn, batch_format="pyarrow")


def filter_column(ds, pred: Pred, name: str):
    """Attach the predicate as a boolean column instead of filtering
    (the parse/store/follow gating pattern, ParsingThread.java:343-398)."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(name, pa.array(pred(batch)))

    return ds.map_batches(fn, batch_format="pyarrow")
