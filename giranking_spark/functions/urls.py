"""URL / host scalar functions (SURVEY.md §2.8).

Re-implements the reference's NutchUtil string functions
(reference: giraph-nutch/.../LinkRank/utils/NutchUtil.java:44-217) as pure
Spark Column expressions — no Python UDFs, so everything stays inside
whole-stage codegen and predicates built from these remain JVM-side.

Reference semantics:
    url_reverse     NutchUtil.java:44-99   http://bar.foo.com:8983/p?a=b
                                           -> com.foo.bar:http:8983/p?a=b
    url_unreverse   NutchUtil.java:101-131 (inverse)
    host_reverse    NutchUtil.java:164-174 www.host.com <-> com.host.www
                                           (an involution; unreverse is the
                                           same function, :176-184)
    url_get_reversed_host NutchUtil.java:133-143
    url_is_valid    NutchUtil.java:198-217 parseable URL with non-empty
                                           dotted host
    url_source_detect Nutch2WebpageInputFormat.java:128-136 row key is
                     reversed iff the first '.' occurs before the first ':'
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
#: non-capturing scheme prefix for building derived regexes
_SCHEME_NC = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"


def url_scheme(url: Column) -> Column:
    return F.regexp_extract(url, _SCHEME_RE, 1)


def url_hostport(url: Column) -> Column:
    """Authority without userinfo — java.net.URL.getHost()/getPort() exclude
    the 'user[:pass]@' prefix, so NutchUtil row keys never contain it."""
    return F.substring_index(
        F.regexp_extract(url, _SCHEME_NC + r"([^/?#]*)", 1), "@", -1
    )


def url_host(url: Column) -> Column:
    return F.split(url_hostport(url), ":").getItem(0)


def url_port(url: Column) -> Column:
    """Port as string, '' when absent (reference uses -1 for absent)."""
    return F.regexp_extract(url_hostport(url), r":([0-9]+)$", 1)


def url_rest(url: Column) -> Column:
    """Path + query, '' when absent. The fragment is EXCLUDED — the reference
    builds the rest from URL.getFile() (path+query; the fragment lives in
    getRef() and never reaches the reversed row key, NutchUtil.java:44-99)."""
    return F.split(
        F.regexp_extract(url, _SCHEME_NC + r"[^/?#]*(.*)$", 1), "#"
    ).getItem(0)


def host_reverse(host: Column) -> Column:
    """www.host.com <-> com.host.www — involution, pure SQL."""
    return F.concat_ws(".", F.reverse(F.split(host, r"\.")))


host_unreverse = host_reverse  # involution (NutchUtil.java:176-184)


def url_reverse(url: Column) -> Column:
    return F.concat(
        host_reverse(url_host(url)),
        F.lit(":"),
        url_scheme(url),
        F.when(url_port(url) != "", F.concat(F.lit(":"), url_port(url))).otherwise(F.lit("")),
        url_rest(url),
    )


def url_unreverse(rev: Column) -> Column:
    """com.foo.bar:http:8983/p?a=b -> http://bar.foo.com:8983/p?a=b."""
    # head = everything before the path start; rest = the path/query suffix
    head = F.regexp_extract(rev, r"^([^/?#]*)", 1)
    rest = F.substring(rev, F.length(head) + F.lit(1), F.lit(1 << 30))
    parts = F.split(head, ":")
    revhost = parts.getItem(0)
    scheme = parts.getItem(1)
    port = F.when(F.size(parts) > 2, parts.getItem(2)).otherwise(F.lit(""))
    return F.concat(
        scheme,
        F.lit("://"),
        host_reverse(revhost),
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        rest,
    )


def url_get_reversed_host(rev: Column) -> Column:
    return F.split(rev, ":").getItem(0)


def url_is_valid(url: Column) -> Column:
    """URL parses with a scheme AND host is non-empty AND host contains '.'.

    Catches the reference fixtures' dirty rows: 'http://' (empty host),
    'http://invalidurl' (dotless host), 'dummy' (no scheme).
    """
    host = url_host(url)
    return (url_scheme(url) != "") & (host != "") & host.contains(".")


def host_is_valid(host: Column) -> Column:
    """Validity of a bare hostname — the host-table path wraps the name with
    http:// before validating (Nutch2HostInputFormat.java:179-180)."""
    return url_is_valid(F.concat(F.lit("http://"), host))


def url_source_detect(key: Column) -> Column:
    """Unreverse a webpage-table row key iff it looks reversed
    (first '.' strictly before first ':'); pass through otherwise."""
    dot = F.instr(key, ".")
    colon = F.instr(key, ":")
    return F.when((dot > 0) & (colon > 0) & (dot < colon), url_unreverse(key)).otherwise(key)


def strip_fragment(col: Column) -> Column:
    """trim + drop '#fragment' (LinkRankComputation.java:306-313)."""
    return F.split(F.trim(col), "#").getItem(0)


_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def url_normalize(url: Column) -> Column:
    """Canonical URL form for crawl-frontier dedup (extension beyond the
    reference, which only reverses/validates): lowercase scheme+host, drop
    the scheme's default port, strip the fragment, sort query parameters,
    '/' for an empty path. Path case and non-default ports are preserved.

    Pure Column expressions (regexp/split/array_sort) — stays inside
    whole-stage codegen like the rest of §2.8."""
    u = F.trim(url)
    scheme = F.lower(url_scheme(u))
    hostport = F.lower(url_hostport(u))
    host = F.split(hostport, ":").getItem(0)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    # drop scheme-default ports
    keep_port = port != ""
    for sch, dp in _DEFAULT_PORTS.items():
        keep_port = keep_port & ~((scheme == sch) & (port == F.lit(dp)))
    authority = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)
    rest = url_rest(u)  # path+query, fragment already excluded
    path = F.split(rest, r"\?").getItem(0)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        F.instr(rest, "?") > 0,
        F.substring(rest, F.instr(rest, "?") + F.lit(1), F.lit(1 << 30)),
    ).otherwise(F.lit(""))
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        authority,
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
