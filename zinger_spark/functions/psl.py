"""Public Suffix List: parser + bundled snapshot + pure-JVM matcher.

The registered domain (eTLD+1) is the key for domain-level blocklists,
quality priors, and URL canonicalization in crawl curation (C4 /
RefinedWeb / FineWeb all filter at this level).  Getting it right needs
the Mozilla Public Suffix List (publicsuffix.org — public data), whose
rules come in three kinds:

  normal      ``co.uk``       the suffix itself
  wildcard    ``*.ck``        every direct child of ck is a suffix
  exception   ``!www.ck``     cancels a wildcard: www.ck is registrable

Matching semantics (publicsuffix.org/list/): among all matching rules
the LONGEST wins, exceptions beat wildcards, and the implicit default
rule ``*`` makes every bare TLD a suffix.  The PSL file also carries a
private-domains section (github.io, blogspot.com, s3 website
endpoints, ...) which curation wants INCLUDED — two tenants of one
hosting suffix are different publishers.

This module ships:

  * ``parse_psl(text)`` — a parser for the real ``public_suffix_list
    .dat`` format (comments, sections, wildcards, exceptions; unicode
    lines are IDNA-encoded to their punycode form, matching on-the-wire
    hostnames), so a deployment drops the full published file in via
    ``$ZINGER_PSL_FILE`` without code changes;
  * ``BUNDLED_PSL`` — an offline snapshot subset in the same format:
    the structurally interesting rules (multi-level ccTLD hierarchies,
    the ck/jp wildcard+exception pairs, punycoded IDN TLD examples)
    plus the high-traffic private-domain suffixes.  It is a SUBSET —
    the mechanism is complete, the data is swappable;
  * ``take_expr(host_col, psl)`` — the matcher compiled to pure JVM
    Catalyst expressions (split + literal-set membership per rule
    length, longest-first), so the registered-domain cut runs inside
    whole-stage codegen with zero Python in the row path and the rule
    sets ride the plan as literals (broadcast-free, a few KB).

Hostnames are matched in their ASCII (punycode) form, exactly as they
appear in URLs on the wire; ``idna_ascii`` converts unicode hosts for
driver-side inputs like blocklist entries.
"""

from __future__ import annotations

import os
import weakref
from dataclasses import dataclass, field
from functools import lru_cache

from pyspark.sql import Column, functions as F


def idna_ascii(host: str) -> str:
    """Unicode host -> punycode ASCII (driver-side helper for config /
    blocklist entries; on-the-wire URLs are already ASCII)."""
    host = host.rstrip(".").lower()
    try:
        return host.encode("idna").decode("ascii")
    except UnicodeError:
        return host


@dataclass
class PSL:
    """Rule sets keyed by label count, ready for literal-set matching.

    ``normals[k]``: suffix strings of k labels.  ``wildcards[k]``:
    PARENT strings of k labels (the rule was ``*.parent`` — suffix
    length k+1).  ``exceptions[k]``: exception rules of k labels (the
    rule itself is registrable)."""

    normals: dict[int, frozenset[str]] = field(default_factory=dict)
    wildcards: dict[int, frozenset[str]] = field(default_factory=dict)
    exceptions: dict[int, frozenset[str]] = field(default_factory=dict)

    def suffix_lengths(self) -> list[int]:
        """Candidate public-suffix lengths, longest first (the PSL's
        longest-match-wins order).  Wildcard parents of k labels yield
        suffixes of k+1."""
        lens = {1}  # implicit default rule: '*' (every TLD)
        lens.update(self.normals)
        lens.update(k + 1 for k in self.wildcards)
        return sorted(lens, reverse=True)


def parse_psl(text: str, include_private: bool = True) -> PSL:
    """Parse the ``public_suffix_list.dat`` wire format."""
    normals: dict[int, set[str]] = {}
    wildcards: dict[int, set[str]] = {}
    exceptions: dict[int, set[str]] = {}
    in_private = False
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("//"):
            if "===BEGIN PRIVATE DOMAINS===" in line:
                in_private = True
            elif "===END PRIVATE DOMAINS===" in line:
                in_private = False
            continue
        if in_private and not include_private:
            continue
        rule = line.split()[0].lower()
        kind = "normal"
        if rule.startswith("!"):
            kind, rule = "exception", rule[1:]
        elif rule.startswith("*."):
            kind, rule = "wildcard", rule[2:]
        rule = idna_ascii(rule)
        k = rule.count(".") + 1
        target = {"normal": normals, "wildcard": wildcards, "exception": exceptions}[
            kind
        ]
        target.setdefault(k, set()).add(rule)
    return PSL(
        normals={k: frozenset(v) for k, v in normals.items()},
        wildcards={k: frozenset(v) for k, v in wildcards.items()},
        exceptions={k: frozenset(v) for k, v in exceptions.items()},
    )


# ---------------------------------------------------------------------------
# Bundled snapshot (same format as the published file).  A SUBSET of
# publicsuffix.org data chosen for coverage of the rule GRAMMAR and the
# suffixes a web crawl actually hits; swap in the full file via
# $ZINGER_PSL_FILE for production.

BUNDLED_PSL = """\
// ===BEGIN ICANN DOMAINS===
// generic TLD second-levels appear as plain TLD rules implicitly (the
// default '*' rule covers com/net/org/io/dev/app/ai/...)

// uk
co.uk
org.uk
me.uk
ltd.uk
plc.uk
net.uk
sch.uk
ac.uk
gov.uk
nhs.uk
police.uk
// au
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
// jp (incl. the geographic wildcard + city exceptions)
ac.jp
ad.jp
co.jp
ed.jp
go.jp
gr.jp
lg.jp
ne.jp
or.jp
*.kawasaki.jp
*.kitakyushu.jp
*.kobe.jp
*.nagoya.jp
*.sapporo.jp
*.sendai.jp
*.yokohama.jp
!city.kawasaki.jp
!city.kitakyushu.jp
!city.kobe.jp
!city.nagoya.jp
!city.sapporo.jp
!city.sendai.jp
!city.yokohama.jp
// nz
ac.nz
co.nz
geek.nz
gen.nz
govt.nz
iwi.nz
kiwi.nz
maori.nz
mil.nz
net.nz
org.nz
school.nz
// br
com.br
net.br
org.br
gov.br
edu.br
art.br
blog.br
eco.br
// cn
ac.cn
com.cn
edu.cn
gov.cn
net.cn
org.cn
mil.cn
// in
co.in
com.in
firm.in
net.in
org.in
gen.in
ind.in
ac.in
edu.in
gov.in
mil.in
nic.in
res.in
// kr
co.kr
ne.kr
or.kr
re.kr
pe.kr
go.kr
mil.kr
ac.kr
hs.kr
ms.kr
es.kr
sc.kr
kg.kr
seoul.kr
busan.kr
// za
ac.za
co.za
edu.za
gov.za
law.za
mil.za
net.za
org.za
nom.za
school.za
web.za
// mx
com.mx
net.mx
org.mx
edu.mx
gob.mx
// ar
com.ar
edu.ar
gob.ar
gov.ar
int.ar
mil.ar
net.ar
org.ar
tur.ar
// tr
com.tr
info.tr
biz.tr
net.tr
org.tr
web.tr
gen.tr
av.tr
dr.tr
bbs.tr
name.tr
tel.tr
gov.tr
bel.tr
pol.tr
mil.tr
k12.tr
edu.tr
// il
ac.il
co.il
gov.il
idf.il
k12.il
muni.il
net.il
org.il
// sg
com.sg
net.sg
org.sg
gov.sg
edu.sg
per.sg
// hk
com.hk
edu.hk
gov.hk
idv.hk
net.hk
org.hk
// tw
edu.tw
gov.tw
mil.tw
com.tw
net.tw
org.tw
idv.tw
game.tw
ebiz.tw
club.tw
// my
com.my
net.my
org.my
gov.my
edu.my
mil.my
name.my
// id
ac.id
biz.id
co.id
desa.id
go.id
mil.id
my.id
net.id
or.id
ponpes.id
sch.id
web.id
// th
ac.th
co.th
go.th
in.th
mi.th
net.th
or.th
// ph
com.ph
net.ph
org.ph
gov.ph
edu.ph
ngo.ph
mil.ph
i.ph
// vn
com.vn
net.vn
org.vn
edu.vn
gov.vn
int.vn
ac.vn
biz.vn
info.vn
name.vn
pro.vn
health.vn
// pk
com.pk
net.pk
edu.pk
org.pk
fam.pk
biz.pk
web.pk
gov.pk
gob.pk
gok.pk
gon.pk
gop.pk
gos.pk
// eg
com.eg
edu.eg
eun.eg
gov.eg
mil.eg
name.eg
net.eg
org.eg
sci.eg
// sa
com.sa
net.sa
org.sa
gov.sa
med.sa
pub.sa
edu.sa
sch.sa
// ng
com.ng
edu.ng
gov.ng
i.ng
mil.ng
mobi.ng
name.ng
net.ng
org.ng
sch.ng
// ke
ac.ke
co.ke
go.ke
info.ke
me.ke
mobi.ke
ne.ke
or.ke
sc.ke
// pl
com.pl
net.pl
org.pl
edu.pl
gov.pl
info.pl
waw.pl
// ru / рф (punycode)
com.ru
msk.ru
spb.ru
xn--p1ai
// ua
com.ua
edu.ua
gov.ua
in.ua
net.ua
org.ua
kiev.ua
// fr region-less second levels
asso.fr
com.fr
gouv.fr
nom.fr
prd.fr
tm.fr
// it/es/de/etc mostly flat (default rule suffices)
gov.it
edu.it
// us (incl. a 3-label k12 hierarchy sample)
dni.us
fed.us
isa.us
kids.us
nsn.us
k12.ma.us
k12.ca.us
k12.ny.us
cc.ca.us
cc.ny.us
lib.ca.us
lib.ny.us
// ck: wildcard + exception (the canonical PSL grammar test pair)
*.ck
!www.ck
// bd / er / fk / mm / np: wildcard-only ccTLDs
*.bd
*.er
*.fk
*.mm
*.np
// ca
gc.ca
// eu institutions
europa.eu
// IDN TLD examples (punycode)
xn--fiqs8s
xn--j6w193g
xn--mgbaam7a8h
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
// hosting / PaaS suffixes where each subdomain is a distinct publisher
github.io
githubusercontent.com
gitlab.io
blogspot.com
blogspot.co.uk
blogspot.com.au
blogspot.com.br
blogspot.de
blogspot.fr
blogspot.in
blogspot.jp
blogspot.mx
wordpress.com
tumblr.com
herokuapp.com
appspot.com
firebaseapp.com
web.app
netlify.app
vercel.app
pages.dev
workers.dev
fly.dev
onrender.com
repl.co
glitch.me
neocities.org
surge.sh
readthedocs.io
azurewebsites.net
cloudapp.azure.com
cloudfront.net
s3.amazonaws.com
s3-website-us-east-1.amazonaws.com
elasticbeanstalk.com
fastly.net
b-cdn.net
wixsite.com
squarespace.com
weebly.com
bandcamp.com
substack.com
ghost.io
medium.com
notion.site
carrd.co
// dynamic-DNS style
duckdns.org
no-ip.org
dyndns.org
// ===END PRIVATE DOMAINS===
"""


@lru_cache(maxsize=4)
def _bundled() -> PSL:
    return parse_psl(BUNDLED_PSL)


# ---------------------------------------------------------------------------
# Full-published-list scale path.  The column-algebra chain below builds
# its literal sets through per-element py4j calls — fine for the bundled
# subset (~250 rules), but the full public_suffix_list.dat is ~15k rules
# and the per-element conversion costs seconds of DRIVER time per query.
# Above _SQL_FN_THRESHOLD rules the matcher is instead registered ONCE
# per session as a SQL scalar function (CREATE TEMPORARY FUNCTION ...
# RETURN CASE ...): one py4j round trip carrying the whole rule text,
# Catalyst inlines the body at each call site (still no Python UDF, no
# shuffle), and the big IN lists become hash-set InSet lookups exactly
# like the isin form.  Measured at sf0.1 (tools/psl_scale_probe.py):
# 13.8k synthetic rules run within ~1.5x of the bundled subset vs ~13x
# through the per-element isin path.

_SQL_FN_THRESHOLD = 256
# per-session registered-function names, keyed by the LIVE session
# object (WeakKeyDictionary, not id(): CPython recycles ids after GC,
# so an id key could make a NEW session skip registration and fail at
# first call with an unresolved function)
_SQL_FN_REGISTERED: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _psl_size(psl: PSL) -> int:
    return sum(
        len(s)
        for group in (psl.normals, psl.wildcards, psl.exceptions)
        for s in group.values()
    )


def _sql_in(vals: frozenset[str]) -> str:
    return ",".join("'" + v.replace("'", "''") + "'" for v in sorted(vals))


def _cut_sql_body(psl: PSL) -> str:
    """The cut_expr when-chain as SQL text over a pre-lowercased
    parameter ``h`` — the same branch order as the column form below
    (exceptions, then lengths descending, then the default rule)."""

    def tail(k: int) -> str:
        return f"substring_index(h, '.', -{k})"

    branches = []
    for k in sorted(psl.exceptions, reverse=True):
        branches.append(
            f"WHEN {tail(k)} IN ({_sql_in(psl.exceptions[k])}) THEN {tail(k)}"
        )
    for length in (lg for lg in psl.suffix_lengths() if lg > 1):
        conds = []
        if length in psl.normals:
            conds.append(f"{tail(length)} IN ({_sql_in(psl.normals[length])})")
        if length - 1 in psl.wildcards:
            conds.append(
                f"{tail(length - 1)} IN ({_sql_in(psl.wildcards[length - 1])})"
            )
        branches.append(f"WHEN {' OR '.join(conds)} THEN {tail(length + 1)}")
    if not branches:
        return tail(2)
    return "CASE " + " ".join(branches) + f" ELSE {tail(2)} END"


def _psl_digest(psl: PSL) -> str:
    import hashlib  # noqa: PLC0415

    h = hashlib.md5()
    for group in (psl.normals, psl.wildcards, psl.exceptions):
        for k in sorted(group):
            h.update(str(k).encode())
            for rule in sorted(group[k]):
                h.update(rule.encode())
    return h.hexdigest()[:12]


def _ensure_cut_fn(psl: PSL) -> str | None:
    """Register (once per session per rule set) the SQL scalar function
    and return its name; None when no session is active (the caller
    falls back to the column form)."""
    from pyspark.sql import SparkSession  # noqa: PLC0415

    spark = SparkSession.getActiveSession()
    if spark is None:
        return None
    name = f"zinger_psl_cut_{_psl_digest(psl)}"
    names = _SQL_FN_REGISTERED.setdefault(spark, set())
    if name not in names:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(h STRING) "
            f"RETURNS STRING RETURN {_cut_sql_body(psl)}"
        )
        names.add(name)
    return name


def get_psl() -> PSL:
    """The active PSL: $ZINGER_PSL_FILE (the full published
    ``public_suffix_list.dat``) when set, else the bundled snapshot."""
    path = os.environ.get("ZINGER_PSL_FILE")
    if path:
        return _load_file(path)
    return _bundled()


@lru_cache(maxsize=4)
def _load_file(path: str) -> PSL:
    with open(path, encoding="utf-8") as fh:
        return parse_psl(fh.read())


def cut_expr(host: Column, psl: PSL | None = None) -> Column:
    """The registered domain (eTLD+1) of ``host`` as ONE flat when-chain
    of ``substring_index`` + literal-set membership — no split(), no
    array ops (the r10 bench caught the array form at ~33x the per-row
    cost of plain string ops).

    Per branch, ``substring_index(host, '.', -k)`` is the host's last k
    labels; when the host has FEWER than k labels it returns the whole
    host, which is exactly the PSL pass-through behavior for hosts that
    ARE a public suffix (registered_domain('co.uk') = 'co.uk').  Branch
    order implements longest-match-wins: exception rules first (they
    beat wildcards at any length), then suffix lengths descending, then
    the implicit default rule '*' (bare TLD -> last 2 labels).

    Hostnames are case-insensitive (RFC 4343) and the rule sets are
    stored lowercased, so the host is lowercased once up front — the
    returned registered domain is the canonical lowercase form.

    Full-published-list rule sets (> _SQL_FN_THRESHOLD rules, e.g. the
    real public_suffix_list.dat via $ZINGER_PSL_FILE) compile through a
    once-per-session SQL scalar function instead — same semantics,
    Catalyst-inlined, without the per-literal py4j build cost (see the
    scale-path note above)."""
    psl = psl or get_psl()
    host = F.lower(host)
    if _psl_size(psl) > _SQL_FN_THRESHOLD:
        fn = _ensure_cut_fn(psl)
        if fn is not None:
            return F.call_function(fn, host)

    def tail(k: int) -> Column:
        return F.substring_index(host, ".", -k)

    expr: Column | None = None

    def add(cond: Column, result: Column) -> None:
        nonlocal expr
        expr = F.when(cond, result) if expr is None else expr.when(cond, result)

    for k in sorted(psl.exceptions, reverse=True):
        add(tail(k).isin(*sorted(psl.exceptions[k])), tail(k))
    for length in (lg for lg in psl.suffix_lengths() if lg > 1):
        conds = []
        if length in psl.normals:
            conds.append(tail(length).isin(*sorted(psl.normals[length])))
        if length - 1 in psl.wildcards:
            conds.append(tail(length - 1).isin(*sorted(psl.wildcards[length - 1])))
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        add(cond, tail(length + 1))
    default = tail(2)
    return expr.otherwise(default) if expr is not None else default


def take_expr(host: Column, psl: PSL | None = None) -> Column:
    """Compile the PSL longest-match into one JVM ``CASE`` producing the
    number of labels in the REGISTERED domain of ``host`` (public
    suffix + 1), as pure Catalyst expressions:

      exception rule of k labels matches the host tail -> k
        (the exception itself is registrable)
      else longest matching suffix of L labels -> L + 1
        (normal rules of L labels, or wildcard parents of L-1)

    Rule sets become plan literals (a few KB for the full PSL's hot
    subset; Catalyst turns big ``isin`` sets into hash-set lookups), so
    the cut runs inside whole-stage codegen — no UDF, no broadcast, no
    shuffle."""
    psl = psl or get_psl()
    # case-insensitive match against the lowercased rule sets (RFC 4343)
    host = F.lower(host)
    parts = F.split(host, r"\.")

    def tail(k: int) -> Column:
        # last k labels joined back with '.'
        return F.array_join(F.slice(parts, -k, k), ".")

    expr: Column | None = None

    def add(cond: Column, take: int) -> None:
        nonlocal expr
        branch = F.when(cond, F.lit(take))
        expr = branch if expr is None else expr.when(cond, F.lit(take))

    n = F.size(parts)
    # exceptions first (they beat wildcards whatever the length)
    for k in sorted(psl.exceptions, reverse=True):
        add((n >= k) & tail(k).isin(*sorted(psl.exceptions[k])), k)
    # then by suffix length, longest first
    for length in (lg for lg in psl.suffix_lengths() if lg > 1):
        conds = []
        if length in psl.normals:
            conds.append(tail(length).isin(*sorted(psl.normals[length])))
        if length - 1 in psl.wildcards:
            conds.append(
                tail(length - 1).isin(*sorted(psl.wildcards[length - 1]))
            )
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        add((n > length) & cond, length + 1)
    # implicit default rule '*': bare TLD is the suffix
    return expr.otherwise(F.lit(2)) if expr is not None else F.lit(2)
