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


#: legacy alias (pre-r10): the registered-domain cut now runs on the
#: full Public Suffix List machinery in functions/psl.py (bundled
#: snapshot incl. wildcards/exceptions/private domains; the real
#: published file drops in via $ZINGER_PSL_FILE).  Kept because the
#: two-level heuristic remains a documented fallback shape.
TWO_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "co.in", "co.kr", "co.nz",
    "com.br", "com.cn", "com.mx",
)


#: query parameters stripped by canonical_url — click/campaign trackers
#: that vary per impression while the landing page is identical (the
#: standard crawl-dedup normalization list; utm_* is matched by prefix)
TRACKING_PARAMS = (
    "fbclid", "gclid", "dclid", "msclkid", "igshid",
    "mc_cid", "mc_eid", "ref_src", "spm",
)


def canonical_url(uri: Column) -> Column:
    """Canonical form of an absolute http(s) URL — the normalization a
    crawl pipeline applies BEFORE exact-URL dedup, so that the millions
    of tracking-parameter / case / default-port / trailing-slash
    variants of one landing page collapse to a single key.

    Pure JVM expressions over the RFC 3986 appendix-B regex split
    (same `_URI_RE` as parse_uri):
      - scheme and host lowercased, trailing host dot stripped
      - default ports dropped (http:80, https:443), others kept
      - path: empty -> "/", trailing slashes stripped otherwise
      - query: split on '&', tracking params removed (TRACKING_PARAMS
        exact keys + the utm_ prefix), survivors sorted byte-wise and
        rejoined — repeated keys preserved, order normalized
      - fragment always dropped (never reaches the server)
      - userinfo kept verbatim when present

    Everything is regexp/array built-ins inside whole-stage codegen —
    no UDF, no shuffle; at 100 TB this is a free map stage fused into
    the scan.  `sql_canonical_url` is the byte-equivalent DuckDB
    mirror used by the oracle."""
    scheme = F.lower(F.regexp_extract(uri, _URI_RE, 2))
    auth = F.regexp_extract(uri, _URI_RE, 4)
    userinfo = F.regexp_extract(auth, r"^(([^@]*)@)?.*$", 2)
    hostport = F.regexp_extract(auth, r"^(?:[^@]*@)?(.*)$", 1)
    host = F.lower(F.regexp_replace(F.regexp_extract(hostport, r"^([^:]*)", 1), r"\.$", ""))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    raw_path = F.regexp_extract(uri, _URI_RE, 5)
    query = F.regexp_extract(uri, _URI_RE, 7)

    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    stripped = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)

    def is_kept(kv: Column) -> Column:
        key = F.substring_index(kv, "=", 1)
        return (
            (kv != "")
            & ~key.startswith("utm_")
            & ~key.isin(*TRACKING_PARAMS)
        )

    kvs = F.array_sort(F.filter(F.split(query, "&"), is_kept))
    qcanon = F.array_join(kvs, "&")
    assembled = F.concat(
        scheme,
        F.lit("://"),
        F.when(userinfo != "", F.concat(userinfo, F.lit("@"))).otherwise(F.lit("")),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )
    # relative references, non-URL strings, and bracketed IPv6
    # authorities (whose colons defeat the host:port split) pass
    # through unchanged — a curation pass must not mangle what it
    # cannot parse
    return F.when(
        (scheme == "") | (host == "") | hostport.startswith("["), uri
    ).otherwise(assembled)


def sql_canonical_url(expr: str) -> str:
    """DuckDB mirror of canonical_url over the SQL expression ``expr``
    — same regex split, same normalization steps, so the oracle checks
    the ENGINE's canonicalization logic, not a restatement of it."""
    # DuckDB single-quoted literals keep backslashes verbatim, so the
    # shared pattern embeds as-is (it contains no single quotes)
    re = _URI_RE
    tracked = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    scheme = f"lower(regexp_extract({expr}, '{re}', 2))"
    auth = f"regexp_extract({expr}, '{re}', 4)"
    userinfo = f"regexp_extract({auth}, '^(([^@]*)@)?.*$', 2)"
    hostport = f"regexp_extract({auth}, '^(?:[^@]*@)?(.*)$', 1)"
    host = f"lower(regexp_replace(regexp_extract({hostport}, '^([^:]*)', 1), '\\.$', ''))"
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    raw_path = f"regexp_extract({expr}, '{re}', 5)"
    query = f"regexp_extract({expr}, '{re}', 7)"
    keep_port = (
        f"({port} <> '' AND NOT ({scheme} = 'http' AND {port} = '80') "
        f"AND NOT ({scheme} = 'https' AND {port} = '443'))"
    )
    path = (
        f"CASE WHEN regexp_replace({raw_path}, '/+$', '') = '' THEN '/' "
        f"ELSE regexp_replace({raw_path}, '/+$', '') END"
    )
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"x -> x <> '' AND NOT starts_with(split_part(x, '=', 1), 'utm_') "
        f"AND split_part(x, '=', 1) NOT IN ({tracked})))"
    )
    qcanon = f"array_to_string({kept}, '&')"
    assembled = (
        f"{scheme} || '://' "
        f"|| (CASE WHEN {userinfo} <> '' THEN {userinfo} || '@' ELSE '' END) "
        f"|| {host} "
        f"|| (CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END) "
        f"|| {path} "
        f"|| (CASE WHEN {qcanon} <> '' THEN '?' || {qcanon} ELSE '' END)"
    )
    return (
        f"(CASE WHEN {scheme} = '' OR {host} = '' "
        f"OR starts_with({hostport}, '[') THEN {expr} "
        f"ELSE {assembled} END)"
    )


def registered_domain(host: Column) -> Column:
    """eTLD+1 of a hostname — the key for domain-level blocklists and
    quality priors in crawl curation (C4/RefinedWeb/FineWeb all filter
    at the registered domain, not the full host).

    Backed by the Public Suffix List machinery (functions/psl.py):
    normal + wildcard + exception rules with longest-match semantics,
    private-domain suffixes included (two github.io tenants are
    different publishers), compiled into one flat JVM when-chain of
    substring_index + literal-set membership — whole-stage codegen, no
    UDF, no shuffle, no array ops (psl.cut_expr).  The bundled snapshot
    is swappable for the full published file via $ZINGER_PSL_FILE.
    Hosts with no more labels than the suffix cut (i.e. the host IS a
    public suffix) pass through unchanged."""
    from .psl import cut_expr, get_psl  # noqa: PLC0415

    return cut_expr(host, get_psl())
