"""Private-network detection with an injectable resolver (SURVEY §2.2 F2).

Parity with reference crawler/privnet/detector.go:
  - the default CIDR list is the reference's ``defaultPrivateCIDRs``
    (detector.go:13-28): loopback, RFC1918, link-local, 0.0.0.0/8,
    broadcast, IPv6 unique-local;
  - ``is_private(address)`` resolves the host to an IP then tests
    membership in any block (IsNetworkPrivate, detector.go:58-71);
  - custom CIDR lists supported (NewDetectorFromCIDRs, detector.go:43-55);
    host bits are masked like Go's ``net.ParseCIDR`` ("8.8.8.8/16" ->
    8.8.0.0/16, the detector_test.go custom-CIDR case);
  - a failed resolution makes the crawl drop the link
    (link_fetcher.go:66-73 treats err like private) — that is
    ``on_unresolved="private"``, the default here.

The resolver is a plain ``Callable[[str], str | None]`` so tests inject a
fake DNS table and air-gapped environments can choose policy.  The crawl
pipeline's default uses ``literal_resolver`` (IP literals + localhost only)
with ``on_unresolved="public"`` — in an environment with no DNS the strict
reference default would drop every foreign hostname; deployments wanting
full SSRF-guard parity pass ``PrivateNetworkDetector(resolver=dns_resolver)``
into the crawl config.
"""

from __future__ import annotations

import ipaddress
from collections.abc import Callable

# reference crawler/privnet/detector.go:13-28
DEFAULT_PRIVATE_CIDRS = [
    # loopback / localhost
    "127.0.0.0/8",
    "::1/128",
    # private networks (RFC1918)
    "10.0.0.0/8",
    "172.16.0.0/12",
    "192.168.0.0/16",
    # link-local
    "169.254.0.0/16",
    "fe80::/10",
    # misc
    "0.0.0.0/8",
    "255.255.255.255/32",
    "fc00::/7",  # IPv6 unique local
]

Resolver = Callable[[str], "str | None"]


def dns_resolver(host: str) -> str | None:
    """Real DNS resolution (the reference's net.ResolveIPAddr): first
    address from getaddrinfo, None when resolution fails."""
    import socket

    try:
        infos = socket.getaddrinfo(host, None)
    except OSError:
        return None
    return infos[0][4][0] if infos else None


def literal_resolver(host: str) -> str | None:
    """No-network resolver: IP literals resolve to themselves, localhost to
    loopback, every other name is unresolvable."""
    if host == "localhost":
        return "127.0.0.1"
    try:
        ipaddress.ip_address(host)
        return host
    except ValueError:
        return None


def static_resolver(table: dict[str, str], fallback: Resolver = literal_resolver) -> Resolver:
    """Test/fixture resolver backed by a host->ip dict."""

    def resolve(host: str) -> str | None:
        return table.get(host) or fallback(host)

    return resolve


class PrivateNetworkDetector:
    """CIDR-membership private-network check over a resolved address.

    ``on_unresolved``: "private" (reference crawl behavior — a resolution
    error drops the link) or "public" (keep unknown hosts; the right call
    only where no resolver is available).
    """

    def __init__(
        self,
        cidrs: list[str] | None = None,
        resolver: Resolver = dns_resolver,
        on_unresolved: str = "private",
    ):
        # strict=False masks host bits exactly like Go's net.ParseCIDR
        self.networks = [
            ipaddress.ip_network(c, strict=False) for c in (cidrs or DEFAULT_PRIVATE_CIDRS)
        ]
        self.resolver = resolver
        if on_unresolved not in ("private", "public"):
            raise ValueError(f"on_unresolved must be 'private' or 'public', got {on_unresolved!r}")
        self.unresolved_private = on_unresolved == "private"

    def is_private(self, address: str) -> bool:
        if not address:
            return True
        try:
            ip = ipaddress.ip_address(address)
        except ValueError:
            resolved = self.resolver(address)
            if resolved is None:
                return self.unresolved_private
            try:
                ip = ipaddress.ip_address(resolved)
            except ValueError:
                return self.unresolved_private
        return any(ip in net for net in self.networks)


_DNS_PROBE: bool | None = None


def dns_available(probe_host: str = "example.com", timeout: float = 2.0) -> bool:
    """Probe-once (cached): can this environment resolve a public hostname?

    The lookup runs in a worker thread because ``getaddrinfo`` honors no
    socket timeout — an air-gapped resolver that hangs must count as
    unavailable, not stall pipeline construction."""
    global _DNS_PROBE
    if _DNS_PROBE is None:
        import concurrent.futures

        ex = concurrent.futures.ThreadPoolExecutor(1)
        try:
            _DNS_PROBE = ex.result_or_none = ex.submit(dns_resolver, probe_host).result(timeout) is not None
        except (concurrent.futures.TimeoutError, Exception):
            _DNS_PROBE = False
        finally:
            ex.shutdown(wait=False)
    return _DNS_PROBE


def default_pipeline_detector(mode: str = "auto") -> PrivateNetworkDetector:
    """The crawl pipeline's detector default.

    ``mode``:
      - ``"strict"``: reference SSRF semantics — real DNS resolution and a
        resolution failure DROPS the link (crawler/link_fetcher.go:66-73
        treats the error like a private address);
      - ``"lenient"``: air-gapped fallback — IP literals + localhost are
        classified against the reference CIDR list, other hostnames pass as
        public (the strict default would drop every foreign hostname where
        no DNS exists);
      - ``"auto"`` (default): probe DNS once per process and pick
        ``strict`` when it works, ``lenient`` otherwise.
    """
    if mode == "auto":
        mode = "strict" if dns_available() else "lenient"
    if mode == "strict":
        return PrivateNetworkDetector(resolver=dns_resolver, on_unresolved="private")
    if mode == "lenient":
        return PrivateNetworkDetector(resolver=literal_resolver, on_unresolved="public")
    raise ValueError(f"mode must be 'auto', 'strict', or 'lenient', got {mode!r}")
