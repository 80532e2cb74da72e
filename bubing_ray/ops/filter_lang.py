"""The filter mini-language — BUbiNG's boolean filter expressions
(warc/filters/parser/FilterParser.jj grammar, documented in
warc/filters/package-info.java) rebuilt as a small recursive-descent
parser over the vectorized atoms in :mod:`.filters`.

Grammar (same shape as the reference's JavaCC grammar):

    expr    := or
    or      := and ( 'or' and )*
    and     := not ( 'and' not )*
    not     := 'not' not | atom
    atom    := '(' expr ')' | 'true' | 'false' | NAME '(' args? ')'
    args    := ARG ( ',' ARG )*

Atom names are the class names from :mod:`.filters`
(``StatusCategory(2)``, ``HostEndsWithOneOf(.com,.org)``,
``URLMatchesRegex(^https://)``); arguments are passed as strings and
coerced to int where the atom expects one, matching the reference's
``valueOf(String)`` factory convention (AbstractFilter subclasses).
"""

from __future__ import annotations

import re

from . import filters

_TOKEN = re.compile(
    r"\s*(?:(?P<lparen>\()|(?P<rparen>\))|(?P<name>[A-Za-z_][A-Za-z0-9_]*))"
)

# atoms whose single argument is an int
_INT_ARG = {"StatusCategory", "URLShorterThan", "DuplicateSegmentsLessThan"}
# atoms taking a list of strings
_LIST_ARG = {"HostEndsWithOneOf", "PathEndsWithOneOf"}


class FilterParseError(ValueError):
    pass


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.pos = 0

    def _peek_name(self) -> str | None:
        m = _TOKEN.match(self.s, self.pos)
        if m and m.group("name"):
            return m.group("name")
        return None

    def _take(self, what: str) -> str:
        m = _TOKEN.match(self.s, self.pos)
        if not m or not m.group(what):
            raise FilterParseError(
                f"expected {what} at {self.s[self.pos:self.pos + 20]!r}"
            )
        self.pos = m.end()
        return m.group(what)

    def parse(self) -> filters.Pred:
        p = self._or()
        if self.s[self.pos:].strip():
            raise FilterParseError(f"trailing input: {self.s[self.pos:]!r}")
        return p

    def _or(self) -> filters.Pred:
        p = self._and()
        while self._peek_name() == "or":
            self._take("name")
            p = p | self._and()
        return p

    def _and(self) -> filters.Pred:
        p = self._not()
        while self._peek_name() == "and":
            self._take("name")
            p = p & self._not()
        return p

    def _not(self) -> filters.Pred:
        if self._peek_name() == "not":
            self._take("name")
            return ~self._not()
        return self._atom()

    def _atom(self) -> filters.Pred:
        m = _TOKEN.match(self.s, self.pos)
        if m and m.group("lparen"):
            self.pos = m.end()
            p = self._or()
            self._take("rparen")
            return p
        name = self._take("name")
        if name == "true":
            return filters.TRUE
        if name == "false":
            return filters.FALSE
        # NAME ( raw-args )  — args are raw text up to the matching ')'
        m = re.match(r"\s*\(", self.s[self.pos:])
        if not m:
            raise FilterParseError(f"{name}: expected '('")
        self.pos += m.end()
        depth, start = 1, self.pos
        while depth:
            if self.pos >= len(self.s):
                raise FilterParseError(f"{name}: unbalanced parens")
            c = self.s[self.pos]
            if c == "\\" and self.pos + 1 < len(self.s):
                # a backslash-escaped char (regex atoms legitimately
                # contain '\)' / '\(') never opens or closes the args
                self.pos += 2
                continue
            depth += 1 if c == "(" else -1 if c == ")" else 0
            self.pos += 1
        raw = self.s[start : self.pos - 1].strip()
        return _build(name, raw)


def _build(name: str, raw: str) -> filters.Pred:
    cls = getattr(filters, name, None)
    if cls is None or not (isinstance(cls, type) or callable(cls)):
        raise FilterParseError(f"unknown filter atom {name!r}")
    if not raw:
        return cls()
    if name in _INT_ARG:
        return cls(int(raw))
    if name in _LIST_ARG:
        return cls([a.strip() for a in raw.split(",") if a.strip()])
    return cls(raw)


def parse_filter(expr: str) -> filters.Pred:
    """Parse a filter expression string into a composable predicate.

    >>> parse_filter("StatusCategory(2) and not IsProbablyBinary()")
    >>> parse_filter("HostEndsWithOneOf(.com,.org) or URLMatchesRegex(login)")
    """
    return _Parser(expr).parse()
