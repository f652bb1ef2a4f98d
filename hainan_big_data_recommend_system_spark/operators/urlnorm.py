"""URL canonicalization — the crawl-dedup key normalizer.

Web-crawl dedup pipelines key their first (cheapest) dedup pass on the
canonical URL: the same page arrives as ``HTTP://WWW.Example.com:80/a``,
``http://www.example.com/a#section``, and ``...?utm_source=feed``, and
counting those as distinct documents triples the crawl.  The canonical
form here applies the standard public normalization rules (RFC 3986 §6
syntax-based normalization plus the conventional tracking-param strip):

- scheme and host lowercased;
- default ports stripped (``:80`` for http, ``:443`` for https);
- fragment dropped;
- ``utm_*`` tracking parameters dropped;
- remaining query parameters sorted by name (byte order);
- trailing ``/`` stripped from non-root paths.

Everything is column expressions (regex + split + filter + sort +
join) — scan-local, no UDF, whole-stage codegen, and each rule is
mirrorable in ANSI SQL for the oracle.  No reference analogue (the
reference's scraper keys on Douban ids); public knowledge: RFC 3986.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def canonical_url(url) -> Column:
    """The canonical form of ``url`` (string column) per the module
    rules.  Malformed inputs (no ``://``) pass through lowercased-scheme
    untouched rather than erroring — a crawl column is never clean."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    # strip fragment first: nothing after # survives
    rest = F.regexp_replace(rest, r"#.*$", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    after = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 20))
    host = F.lower(hostport)
    host = F.when(
        (scheme == F.lit("http")) & host.rlike(":80$"),
        F.regexp_replace(host, r":80$", ""),
    ).when(
        (scheme == F.lit("https")) & host.rlike(":443$"),
        F.regexp_replace(host, r":443$", ""),
    ).otherwise(host)
    path = F.regexp_extract(after, r"^([^?]*)", 1)
    query = F.regexp_extract(after, r"^[^?]*\?(.*)$", 1)
    # drop utm_* params, sort the rest by full "k=v" byte order
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~F.lower(p).rlike("^utm_"),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    path = F.when(
        path.rlike("^.+/$"), F.regexp_replace(path, "/+$", "")
    ).otherwise(path)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(
            F.lit("")
        ),
    )
    return F.when(u.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), canon).otherwise(u)
