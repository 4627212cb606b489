"""URL canonicalization for crawl dedup.

Crawls reach the same page through many spellings —
``HTTP://WWW.Example.com:80/a/?utm_source=x#frag`` and
``http://example.com/a`` — so url-keyed dedup needs a canonical form
(the role SURT keys play in Common Crawl's cdx index). The rules here
are the standard safe set: they never merge two genuinely different
resources on a sanely-configured site, and each is individually
documented because canonicalization is a *policy*, not a fact.

Pure functions (stdlib urllib only) so they run identically on every
worker; wired into the flagship via ``--canonical-urls`` (CLI), which
keys the url-dedup winner map on ``canonical_url`` instead of the raw
string.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

# query parameters that identify the *visit*, not the resource
TRACKING_PARAMS = frozenset(
    {
        "gclid",
        "fbclid",
        "msclkid",
        "igshid",
        "mc_cid",
        "mc_eid",
        "ref",
        "ref_src",
    }
)
_TRACKING_PREFIXES = ("utm_",)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def host_of(url: str | None) -> str | None:
    """Lowercased hostname of a URL (trailing-dot stripped); None for
    None/unparseable inputs — callers treat a None host as its own
    singleton group so weird rows are never silently dropped."""
    if url is None:
        return None
    try:
        host = urlsplit(url.strip()).hostname
    except ValueError:
        return None
    if host is None:
        return None
    return host.lower().rstrip(".")


def canonical_url(url: str | None) -> str | None:
    """Canonicalize one URL; None/unparseable inputs pass through
    unchanged (dedup then falls back to exact-string semantics for
    them — never drop a row because its url is weird).

    Rules: lowercase scheme+host; strip ``www.`` host prefix; strip the
    scheme's default port; drop the fragment; drop tracking query
    params (utm_*, gclid, …) and sort the survivors byte-wise; strip a
    trailing slash from non-root paths; empty path → ``/``."""
    if url is None:
        return None
    # the WHOLE body is guarded: urlsplit defers some validation to the
    # property accessors (`parts.port` raises ValueError on out-of-range
    # ports like http://x:99999/), and one malformed crawl URL must never
    # fail the job — it falls back to exact-string dedup semantics
    try:
        parts = urlsplit(url.strip())
        if not parts.scheme or not parts.netloc:
            return url
        scheme = parts.scheme.lower()
        host = parts.hostname
        if host is None:
            return url
        host = host.lower()
        if host.startswith("www.") and len(host) > 4:
            host = host[4:]
        if ":" in host:  # IPv6 literal: .hostname strips the brackets
            host = f"[{host}]"
        netloc = host
        port = parts.port
        if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
            netloc = f"{host}:{port}"
        path = parts.path or "/"
        if len(path) > 1 and path.endswith("/"):
            path = path.rstrip("/") or "/"
        kept = sorted(
            (k, v)
            for k, v in parse_qsl(parts.query, keep_blank_values=True)
            if k not in TRACKING_PARAMS
            and not any(k.startswith(p) for p in _TRACKING_PREFIXES)
        )
        query = urlencode(kept)
        return urlunsplit((scheme, netloc, path, query, ""))
    except ValueError:
        return url


def add_canonical_url(ds, url_col: str = "url", out_col: str = "canonical_url"):
    """Append a canonical-url column (pure map_batches, no shuffle)."""
    import pyarrow as pa

    def canon(batch: pa.Table) -> pa.Table:
        vals = [canonical_url(u) for u in batch[url_col].to_pylist()]
        arr = pa.array(vals, pa.string())
        if out_col in batch.column_names:
            return batch.set_column(
                batch.column_names.index(out_col), out_col, arr
            )
        return batch.append_column(out_col, arr)

    return ds.map_batches(canon, batch_format="pyarrow")


# minimal multi-label public suffixes (public-suffix-list-lite): enough to
# get registrable domains right for the major cc-TLD patterns without
# shipping the full PSL (which is not in this environment)
_MULTI_SUFFIXES = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk",
        "com.au", "net.au", "org.au",
        "co.jp", "ne.jp", "or.jp",
        "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
        "com.ar", "com.tr", "com.tw", "co.nz",
    }
)


def registrable_domain(url: str | None) -> str | None:
    """The registrable domain of a URL's host (``a.b.example.co.uk`` →
    ``example.co.uk``) — the key for per-site statistics, politeness
    grouping and domain-mixture weighting. Heuristic PSL-lite: exact for
    single-label TLDs and the common multi-label suffixes above;
    IP-literal and unparseable hosts return as-is."""
    if url is None:
        return None
    try:
        host = urlsplit(url.strip()).hostname
    except ValueError:
        return None
    if host is None:
        return None
    host = host.lower().rstrip(".")
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if all(p.isdigit() for p in labels):  # IPv4 literal
        return host
    if ".".join(labels[-2:]) in _MULTI_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def add_domain(ds, url_col: str = "url", out_col: str = "domain"):
    """Append the registrable domain (pure map_batches, no shuffle) —
    feed its output straight into ``curate.mixture_sample(key_col=
    "domain")`` or a per-domain groupby for site-level stats."""
    import pyarrow as pa

    def dom(batch: pa.Table) -> pa.Table:
        vals = [registrable_domain(u) for u in batch[url_col].to_pylist()]
        arr = pa.array(vals, pa.string())
        if out_col in batch.column_names:
            return batch.set_column(
                batch.column_names.index(out_col), out_col, arr
            )
        return batch.append_column(out_col, arr)

    return ds.map_batches(dom, batch_format="pyarrow")


def filter_blocklist(
    ds,
    blocked_domains,
    url_col: str = "url",
    invert: bool = False,
):
    """Drop rows whose registrable domain is on a blocklist (the
    robots/spam/adult-list gate every crawl pipeline runs). The list
    broadcasts once via ``ray.put`` and caches per worker; matching is
    an exact set lookup on the registrable domain, so a blocked
    ``example.com`` also blocks ``a.b.example.com``. ``invert=True``
    turns it into an allowlist filter."""
    import pyarrow as pa
    import ray

    ref = ray.put(frozenset(d.lower() for d in blocked_domains))
    state: dict = {}

    def drop(batch: pa.Table) -> pa.Table:
        if "blocked" not in state:
            state["blocked"] = ray.get(ref)
        blocked = state["blocked"]
        keep = []
        for u in batch[url_col].to_pylist():
            hit = registrable_domain(u) in blocked
            keep.append(hit if invert else not hit)
        return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(drop, batch_format="pyarrow")
