"""IPv4 network functions — the Zed query surface's `network_of` /
`cidr_match` (zed docs: function library, network functions), the
workhorses of Zeek/flow-log analytics the reference's ecosystem targets.

All pure JVM-side expressions (split + shifts on the dotted quad), so
CIDR filters pipeline into the scan with whole-stage codegen and — when
the CIDR is a literal — constant-fold into a plain integer range
predicate Catalyst can reason about.  No UDFs, no regex per row.

IPv6 is intentionally out of scope here (different width, ':'-groups,
zero-compression); an `ip6_*` family would mirror these over two
64-bit halves.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def ip4_to_long(addr: Column) -> Column:
    """Dotted-quad string -> unsigned 32-bit value in a long.
    Malformed input (wrong part count, non-numeric, octet > 255)
    yields NULL, which every downstream predicate treats as no-match."""
    parts = F.split(addr, r"\.")
    # try_element_at: short arrays (malformed input) yield NULL instead
    # of an ANSI out-of-bounds error
    octets = [
        F.try_element_at(parts, F.lit(i + 1)).try_cast("long") for i in range(4)
    ]
    valid = (F.size(parts) == 4) & (
        octets[0].isNotNull() & octets[1].isNotNull()
        & octets[2].isNotNull() & octets[3].isNotNull()
    )
    for o in octets:
        valid = valid & (o >= 0) & (o <= 255)
    packed = (
        F.shiftleft(octets[0], 24)
        + F.shiftleft(octets[1], 16)
        + F.shiftleft(octets[2], 8)
        + octets[3]
    )
    return F.when(valid, packed)


def long_to_ip4(ip: Column) -> Column:
    """Inverse of ip4_to_long: long -> dotted quad string."""
    return F.concat_ws(
        ".",
        (F.shiftright(ip, 24) % 256).cast("string"),
        (F.shiftright(ip, 16) % 256).cast("string"),
        (F.shiftright(ip, 8) % 256).cast("string"),
        (ip % 256).cast("string"),
    )


def _mask(prefix: Column) -> Column:
    """/prefix -> 32-bit netmask as a long; /0 is all-pass.

    ``F.shiftleft`` only takes a python-int shift, so a column-valued
    prefix uses 2^k via pow — exact in a double up to 2^32, cast back
    to long before any bit op."""
    host_bits = (32 - prefix).cast("double")
    return F.lit((1 << 32) - 1).cast("long") - (
        F.pow(F.lit(2.0), host_bits).cast("long") - 1
    )


def network_of(addr: Column, prefix: Column | int) -> Column:
    """The network containing ``addr`` at the given prefix length, in
    CIDR notation — Zed's two-arg `network_of` (the one-arg classful
    form is a deliberate omission; classful inference is a museum
    piece).  network_of('10.1.2.3', 24) == '10.1.2.0/24'."""
    p = F.lit(prefix) if isinstance(prefix, int) else prefix
    ip = ip4_to_long(addr)
    net = ip.bitwiseAND(_mask(p))
    return F.when(
        ip.isNotNull() & (p >= 0) & (p <= 32),
        F.concat(long_to_ip4(net), F.lit("/"), p.cast("string")),
    )


def cidr_match(cidr: Column | str, addr: Column) -> Column:
    """True iff ``addr`` falls inside ``cidr`` ('10.0.0.0/8') — Zed's
    `cidr_match`.  Boolean expression safe in any predicate position;
    NULL/malformed on either side is false, never an error."""
    c = F.lit(cidr) if isinstance(cidr, str) else cidr
    sl = F.split(c, "/")
    net = ip4_to_long(F.try_element_at(sl, F.lit(1)))
    prefix = F.try_element_at(sl, F.lit(2)).try_cast("long")
    ip = ip4_to_long(addr)
    m = _mask(prefix)
    ok = (
        (F.size(sl) == 2)
        & net.isNotNull() & ip.isNotNull()
        & prefix.isNotNull() & (prefix >= 0) & (prefix <= 32)
    )
    return F.when(ok, ip.bitwiseAND(m) == net.bitwiseAND(m)).otherwise(
        F.lit(False)
    )


# RFC 3986 appendix B reference regex, shared verbatim by the DuckDB
# oracle — both engines' regexp_extract agree on these simple classes.
_URI_RE = r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?$"


def parse_uri(uri: Column) -> Column:
    """Zed's `parse_uri`: split a URI into a record of its parts —
    {scheme, userinfo, host, port, path, query, fragment}.  Pure
    regexp_extract (the RFC 3986 appendix-B pattern + an authority
    split), no UDF; absent parts are NULL, port is int64.

    The query string stays a string (`str_to_map` is one call away and
    lossy on repeated keys, so the caller chooses)."""

    def part(idx: int) -> Column:
        p = F.regexp_extract(uri, _URI_RE, idx)
        return F.when(p != "", p)

    auth = F.regexp_extract(uri, _URI_RE, 4)
    userinfo = F.regexp_extract(auth, r"^(([^@]*)@)?.*$", 2)
    hostport = F.regexp_extract(auth, r"^(?:[^@]*@)?(.*)$", 1)
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    return F.struct(
        part(2).alias("scheme"),
        F.when(userinfo != "", userinfo).alias("userinfo"),
        F.when(host != "", host).alias("host"),
        F.when(port != "", port).try_cast("long").alias("port"),
        part(5).alias("path"),
        part(7).alias("query"),
        part(9).alias("fragment"),
    )


#: two-level public suffixes bundled for the registered-domain cut.
#: Deliberately minimal: the MECHANISM (suffix-aware label slice, pure
#: JVM) is the scale-relevant part — a deployment swaps in the full
#: published PSL as this tuple without touching the plan shape.
TWO_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "co.in", "co.kr", "co.nz",
    "com.br", "com.cn", "com.mx",
)


def registered_domain(host: Column) -> Column:
    """eTLD+1 of a hostname — the key for domain-level blocklists and
    quality priors in crawl curation (C4/RefinedWeb/FineWeb all filter
    at the registered domain, not the full host).  Suffix-aware label
    slice as pure JVM expressions: last 2 labels normally, last 3 when
    the final 2 form a bundled two-level public suffix; hosts with no
    more labels than the cut pass through unchanged."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    take = F.when(
        (n >= 2) & last2.isin(*TWO_LEVEL_SUFFIXES), F.lit(3)
    ).otherwise(F.lit(2))
    return F.when(n <= take, host).otherwise(
        F.concat_ws(".", F.slice(parts, n - take + 1, take))
    )
