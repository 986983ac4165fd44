"""URL canonicalization / SURT / registered-domain unit tests.

Reference semantics covered: default-http scheme
(company_number_scrape.py:44), urljoin resolution (:38), netloc
extraction (Common_Crawl_EDA.py:28), registered-domain scoping (:39).
"""

from common_crawl___autumn_2025_spark.canonical import (
    canonicalize,
    host_of,
    registered_domain,
    surt,
)


def test_default_scheme():
    assert canonicalize("acme.co.uk") == "http://acme.co.uk/"
    assert canonicalize("www.acme.com/about") == "http://www.acme.com/about"


def test_normalization():
    assert (
        canonicalize("HTTP://WWW.Acme.COM:80/a/?b=2&a=1#frag")
        == "http://www.acme.com/a?a=1&b=2"
    )
    assert canonicalize("https://x.com:443/") == "https://x.com/"
    assert canonicalize("https://x.com:8443/p/") == "https://x.com:8443/p"


def test_urljoin_resolution():
    assert canonicalize("/about", base="http://www.x.com/deep/page") == "http://www.x.com/about"
    assert canonicalize("sub", base="http://www.x.com/deep/") == "http://www.x.com/deep/sub"
    assert canonicalize("http://other.com/a", base="http://x.com/") == "http://other.com/a"


def test_surt():
    assert surt("http://www.acme.co.uk/about?b=2&a=1") == "uk,co,acme)/about?a=1&b=2"
    # scheme + www variants collapse to one seen-key
    assert surt("https://acme.co.uk/about") == surt("http://www.acme.co.uk/about/")
    assert surt("") == ""


def test_registered_domain():
    assert registered_domain("www.blog.acme.co.uk") == "acme.co.uk"
    assert registered_domain("sub.acme.com") == "acme.com"
    assert registered_domain("acme.com") == "acme.com"
    assert registered_domain("www.stats.gov.uk") == "stats.gov.uk"
    assert registered_domain("localhost") == ""
    assert registered_domain("") == ""


def test_host_of():
    assert host_of("https://WWW.Acme.COM/x") == "www.acme.com"
    assert host_of("acme.com/x") == "acme.com"
