"""URL normalization order-of-operations (PageAnalyzer.java:47-82)."""

import pytest

from search_engine_ray.functions.urls import normalized_path, site_of, split_site_path

SITE = "https://site0.example"


def test_root():
    assert normalized_path(SITE, SITE) == "/"
    assert normalized_path(SITE, SITE + "/") == "/"


def test_query_stripped_before_trailing_slash():
    # '/a/?x=1' -> cut at '?' -> '/a/' -> trailing slash -> '/a'
    assert normalized_path(SITE, f"{SITE}/a/?x=1") == "/a"
    assert normalized_path(SITE, f"{SITE}/a?x=1") == "/a"


def test_lowercase_after_slash_strip():
    assert normalized_path(SITE, f"{SITE}/C/D") == "/c/d"


def test_relative_input():
    assert normalized_path(SITE, "/About/") == "/about"
    assert normalized_path(SITE, "about") == "/about"


def test_whitespace_stripped():
    assert normalized_path(SITE, f"  {SITE}/x \t") == "/x"


def test_foreign_scheme_rejected():
    with pytest.raises(ValueError):
        normalized_path(SITE, "https://other.site/x")


def test_site_of():
    assert site_of("https://A.B/x/y") == "https://a.b"
    assert site_of("relative/x") == ""
    assert split_site_path("https://A.B/X/") == ("https://a.b", "/x")
