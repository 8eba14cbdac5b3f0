"""URL filter plugin family (F5/F6).

Reference contract: ``URLFilter.filter(url) -> url | null``
(``net/URLFilterBase``), chained; rules:

- regex filter (``net/RegexURLFilterBase.java``, rule files like
  ``conf/configsets/default/regex-urlfilter.txt``): ordered lines of
  ``+pattern`` / ``-pattern``; FIRST match wins; no match -> reject;
- suffix filter (``plugin/urlfilter-suffix``): deny listed suffixes;
- prefix filter (``plugin/urlfilter-prefix``): allow listed prefixes;
- domain filter (``plugin/urlfilter-domain``): allow listed
  hosts/domains.

Spark forms: the regex chain compiles to a nested CASE of rlike
predicates (JVM-side, codegen-friendly); suffix/prefix/domain become
set predicates that Catalyst can turn into broadcast semi-joins when
given as DataFrames.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import urls

# default rule set mirroring regex-urlfilter.txt semantics: skip
# file:/ftp:/mailto:, skip common asset suffixes, skip URLs with
# excessive repeated path segments (spider traps), accept the rest.
DEFAULT_REGEX_RULES: list[tuple[bool, str]] = [
    (False, r"^(file|ftp|mailto):"),
    (False, r"\.(gif|jpg|png|ico|css|sit|eps|wmf|zip|ppt|mpg|xls|gz|rpm|tgz|mov|exe|jpeg|bmp|js)([?#].*)?$"),
    (False, r"[?*!@=]{2,}"),
    (False, r"(/[^/]+)\1{3,}"),  # repeated path segment (trap guard)
    (True, r"."),
]


class RegexUrlFilter:
    """First-match-wins +/- regex chain (scalar + Column forms)."""

    def __init__(self, rules: list[tuple[bool, str]] | None = None):
        self.rules = rules if rules is not None else DEFAULT_REGEX_RULES
        self._compiled = [(accept, re.compile(pat)) for accept, pat in self.rules]

    @classmethod
    def parse_rules(cls, text: str) -> "RegexUrlFilter":
        """Parse a regex-urlfilter.txt-style rule file body."""
        rules = []
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if line[0] not in "+-":
                continue
            rules.append((line[0] == "+", line[1:]))
        return cls(rules)

    def accepts(self, url: str | None) -> bool:
        if url is None:
            return False
        for accept, pat in self._compiled:
            if pat.search(url):
                return accept
        return False

    def accepts_col(self, url: Column) -> Column:
        """Nested CASE: first matching rule decides (Java regex via
        rlike — patterns must stay lookaround-free for parity with
        the scalar form)."""
        expr = F.lit(False)
        for accept, pat in reversed(self.rules):
            expr = F.when(url.rlike(pat), F.lit(accept)).otherwise(expr)
        return url.isNotNull() & expr


def suffix_filter_col(url: Column, deny_suffixes: list[str]) -> Column:
    """urlfilter-suffix: reject URLs whose path ends with a listed
    suffix."""
    path = F.regexp_replace(url, r"[?#].*$", "")
    expr = F.lit(True)
    for s in deny_suffixes:
        expr = expr & ~path.endswith(s)
    return expr


def prefix_filter_col(url: Column, allow_prefixes: list[str]) -> Column:
    """urlfilter-prefix: accept only URLs starting with a listed
    prefix."""
    expr = F.lit(False)
    for p in allow_prefixes:
        expr = expr | url.startswith(p)
    return expr


def domain_filter(df: DataFrame, allowed_domains: DataFrame, url_col: str = "url") -> DataFrame:
    """urlfilter-domain as a broadcast semi-join: keep rows whose
    registered domain is in the allowlist (column ``domain``)."""
    with_dom = df.withColumn(
        "_domain", urls.domain_col(urls.host_col(F.col(url_col)))
    )
    out = with_dom.join(
        F.broadcast(allowed_domains.select(F.col("domain").alias("_domain"))),
        on="_domain",
        how="left_semi",
    )
    return out.drop("_domain")


# urlfilter-automaton (plugin/urlfilter-automaton) shares the regex
# filter's rule-file contract (+/- lines, first match wins); its DFA
# backend is an execution detail the Spark form doesn't need — the
# compiled rlike CASE chain is the same logical filter. Exposed under
# the plugin's name so a reference user finds the contract.
AutomatonUrlFilter = RegexUrlFilter


_VALID_URL_RE = (
    r"^(https?|ftp)://"  # scheme (UrlValidator default schemes)
    r"([a-zA-Z0-9]([a-zA-Z0-9-]*[a-zA-Z0-9])?\.)+"  # dot-separated labels
    r"[a-zA-Z]{2,}"  # alpha TLD, >= 2 chars
    r"(:\d{1,5})?"  # optional port
    r"([/?#]|$)"  # end of authority
)


def validator_filter_col(url: Column) -> Column:
    """plugin/urlfilter-validator: syntactic URL validity (commons
    UrlValidator semantics — scheme allowlist, hostname label rules,
    alphabetic TLD, numeric port). A pure rlike predicate."""
    return url.isNotNull() & url.rlike(_VALID_URL_RE)


def tld_col(url: Column) -> Column:
    """Top-level domain of the URL's host (lowercased)."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]*\.([a-zA-Z]+)(?:[:/?#]|$)", 1))


def tld_filter_col(url: Column, deny_tlds: list[str]) -> Column:
    """plugin/urlfilter-tld (deny mode): reject URLs whose TLD is in
    the deny list."""
    return ~tld_col(url).isin(*[t.lower() for t in deny_tlds])


def apply_filter_chain(df: DataFrame, url_col: str = "url",
                       regex_filter: RegexUrlFilter | None = None,
                       deny_suffixes: list[str] | None = None,
                       allow_prefixes: list[str] | None = None) -> DataFrame:
    """Compose the active filter plugins (plugin.includes analog)."""
    cond = F.lit(True)
    if regex_filter is not None:
        cond = cond & regex_filter.accepts_col(F.col(url_col))
    if deny_suffixes:
        cond = cond & suffix_filter_col(F.col(url_col), deny_suffixes)
    if allow_prefixes:
        cond = cond & prefix_filter_col(F.col(url_col), allow_prefixes)
    return df.filter(cond)
