"""Private-network detector tests — the reference's
crawler/privnet/detector_test.go cases plus resolver injection and the
crawl keep-filter integration (F2)."""

from __future__ import annotations

import pandas as pd
import pytest

from usearch_spark.functions.privnet import (
    PrivateNetworkDetector,
    default_pipeline_detector,
    literal_resolver,
    static_resolver,
)
from usearch_spark.functions.urls import _keep_batch_fn

# detector_test.go TestIpV4 cases
IPV4_CASES = [
    ("127.0.0.1", True),  # loopback
    ("10.0.0.128", True),  # 10.x private
    ("192.168.0.127", True),  # 192.168 private
    ("172.16.10.10", True),  # 172.16/12 private
    ("169.254.169.254", True),  # link-local
]

@pytest.mark.parametrize("addr,expected", IPV4_CASES)
def test_ipv4_private(addr, expected):
    det = PrivateNetworkDetector(resolver=literal_resolver)
    assert det.is_private(addr) is expected


def test_public_ip_is_not_private():
    det = PrivateNetworkDetector(resolver=literal_resolver)
    assert det.is_private("8.8.8.8") is False
    assert det.is_private("142.250.1.1") is False


def test_ipv6_private():
    det = PrivateNetworkDetector(resolver=literal_resolver)
    assert det.is_private("::1") is True
    assert det.is_private("fc00::1") is True
    assert det.is_private("fe80::1") is True
    assert det.is_private("2001:4860:4860::8888") is False


def test_custom_cidrs_mask_host_bits():
    """detector_test.go TestNetDetectorWithCustomCIDRs: '8.8.8.8/16' is
    accepted (host bits masked like Go's net.ParseCIDR) and makes 8.8.8.8
    private."""
    det = PrivateNetworkDetector(cidrs=["8.8.8.8/16"], resolver=literal_resolver)
    assert det.is_private("8.8.8.8") is True
    assert det.is_private("8.9.0.1") is False


def test_hostname_resolution_through_injected_resolver():
    """IsNetworkPrivate resolves hostnames before the CIDR check
    (detector.go:58-71) — a fake DNS table stands in for net.ResolveIPAddr."""
    det = PrivateNetworkDetector(
        resolver=static_resolver({"internal.corp": "10.1.2.3", "example.com": "93.184.216.34"})
    )
    assert det.is_private("internal.corp") is True
    assert det.is_private("example.com") is False
    assert det.is_private("localhost") is True  # fallback literal_resolver


def test_unresolved_policy():
    """A resolution failure drops the link in the reference crawl
    (link_fetcher.go:66-73: err treated like private) — and the
    no-DNS pipeline default inverts that deliberately."""
    strict = PrivateNetworkDetector(resolver=static_resolver({}))
    assert strict.is_private("no-such-host.test") is True
    lax = default_pipeline_detector()
    assert lax.is_private("no-such-host.test") is False
    assert lax.is_private("192.168.1.1") is True  # literals still classified
    with pytest.raises(ValueError):
        PrivateNetworkDetector(on_unresolved="maybe")


def test_keep_filter_uses_detector():
    """shouldRetainURL + privnet integration: same host always kept; a
    foreign host resolving private is dropped; with the strict resolver an
    unresolvable foreign host is dropped too."""
    det = PrivateNetworkDetector(
        resolver=static_resolver({"internal.corp": "10.0.0.5", "pub.example": "93.184.216.34"})
    )
    keep = _keep_batch_fn(det)
    src = pd.Series(["http://a.test/page"] * 5)
    urls = pd.Series(
        [
            "http://a.test/other",  # same host: kept even though unresolvable
            "http://internal.corp/x",  # resolves private: dropped
            "http://pub.example/x",  # resolves public: kept
            "http://unknown.test/x",  # unresolvable, strict policy: dropped
            "ftp://pub.example/x",  # non-http scheme: dropped
        ]
    )
    assert list(keep(src, urls)) == [True, False, True, False, False]
