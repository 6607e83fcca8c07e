"""URL / path normalization.

Re-expresses ``PageAnalyzer.getNormalizedPath`` (``dto/indexing/
PageAnalyzer.java:47-82``) with the reference's exact order of operations:

1. strip ASCII whitespace;
2. cut the query string at the first ``?`` (BEFORE the trailing-slash strip,
   so ``/a/?x=1`` -> ``/a``);
3. drop ONE trailing ``/``;
4. lowercase;
5. strip the (lowercased) site-root prefix;
6. reject a residual ``://`` scheme (malformed / foreign-site URL);
7. ensure a leading ``/`` (so the site root itself normalizes to ``/``... the
   reference yields ``/`` for ``url == site`` via steps 3+5+7).

Plus ``split_site_path`` which derives the ``(site, path)`` pair from a bare
URL when no configured site list exists (Common-Crawl-style input): ``site``
is ``scheme://host`` lowercased.
"""

from __future__ import annotations

_ASCII_WS = " \t\r\n\f\x0b"


def normalized_path(site_url: str, url: str) -> str:
    url = url.strip(_ASCII_WS)

    q = url.find("?")
    if q != -1:
        url = url[:q]

    if url.endswith("/"):
        url = url[:-1]

    url = url.lower()

    root = site_url.lower()
    if url.startswith(root):
        url = url[len(root):]

    slashes = url.find("://")
    if slashes > 0 and slashes + 1 == url.find("/"):
        raise ValueError(f'URL "{url}" must start with "{root}" or "/"')

    if not url.startswith("/"):
        url = "/" + url

    return url


def site_of(url: str) -> str:
    """``scheme://host`` (lowercased) of an absolute URL; '' if relative."""
    i = url.find("://")
    if i < 0:
        return ""
    j = url.find("/", i + 3)
    host_end = j if j != -1 else len(url)
    return url[:host_end].lower()


def split_site_path(url: str) -> tuple[str, str]:
    site = site_of(url)
    if not site:
        return "", normalized_path("", url)
    return site, normalized_path(site, url)
