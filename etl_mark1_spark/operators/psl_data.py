"""Vendored public-suffix snapshot + the official-format parser.

The Public Suffix List (publicsuffix.org, public data, MPL-2.0) is the
table every crawler needs to turn a host into its registrable domain.
The canonical file is ~9k rules and changes continuously, so this module
ships two things:

1. :func:`parse_psl` — a parser for the OFFICIAL file format (comments,
   wildcard ``*.`` rules, ``!`` exception rules, the ICANN/PRIVATE
   section markers), so a production deployment drops the canonical
   ``public_suffix_list.dat`` in verbatim and gets full fidelity.
2. :data:`VENDORED_RULES` — a point-in-time SNAPSHOT SUBSET (~450 rules
   covering the high-traffic ccTLD second-level registries, the US
   state/k12/cc/lib grid, JP prefectures + city wildcards, and the nine
   wildcard-only ccTLDs). It is deliberately NOT claimed complete: the
   sandbox has no network to fetch the canonical file, and a silently
   wrong guess is worse than a documented subset. Anything absent falls
   back to the standard "registrable = last two labels" default, which
   is the PSL's own default rule.

Rule semantics implemented (the PSL algorithm, longest match first):
literal rules mark an exact suffix; ``*.base`` marks EVERY immediate
child of ``base`` as a suffix; ``!name`` exempts one name from a
wildcard (the name itself is registrable). ``operators/web.py:
registered_domain_psl`` compiles a :class:`PslRules` into the same
bounded-isin codegen shape as the fixture-scoped helper.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PslRules:
    """Compiled rule set: label-count-bucketed literals, wildcard bases,
    and exception names. All entries lowercase, no leading dots."""
    literals2: frozenset[str] = frozenset()   # e.g. "co.uk"
    literals3: frozenset[str] = frozenset()   # e.g. "k12.va.us"
    wildcards1: frozenset[str] = frozenset()  # "ck" for rule *.ck
    wildcards2: frozenset[str] = frozenset()  # "kawasaki.jp" for *.kawasaki.jp
    exceptions2: frozenset[str] = frozenset()  # "www.ck" for !www.ck
    exceptions3: frozenset[str] = frozenset()  # "city.kawasaki.jp"
    skipped: tuple[str, ...] = field(default=(), compare=False)


def parse_psl(text: str, icann_only: bool = True) -> PslRules:
    """Parse the official ``public_suffix_list.dat`` format into
    :class:`PslRules`. Comments (``//``), blank lines, and (by default)
    the PRIVATE-DOMAINS section are dropped; single-label literal rules
    (plain TLDs) are dropped too — they restate the default last-two-
    labels rule. Rules deeper than this resolver's reach (4+ label
    literals, 3+ label wildcard bases — a handful exist in the canonical
    file) are collected in ``skipped`` so a caller can LOUDLY decide
    rather than silently mis-split; none of the vendored snapshot needs
    them."""
    lit2, lit3, wc1, wc2, exc2, exc3, skipped = \
        set(), set(), set(), set(), set(), set(), []
    in_private = False
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.startswith("//"):
            if "BEGIN PRIVATE DOMAINS" in line:
                in_private = True
            elif "END PRIVATE DOMAINS" in line:
                in_private = False
            continue
        if icann_only and in_private:
            continue
        rule = line.split()[0].lower()
        if rule.startswith("!"):
            name = rule[1:]
            n = name.count(".")
            if n == 1:
                exc2.add(name)
            elif n == 2:
                exc3.add(name)
            else:
                skipped.append(rule)
        elif rule.startswith("*."):
            base = rule[2:]
            n = base.count(".")
            if n == 0:
                wc1.add(base)
            elif n == 1:
                wc2.add(base)
            else:
                skipped.append(rule)
        else:
            n = rule.count(".")
            if n == 1:
                lit2.add(rule)
            elif n == 2:
                lit3.add(rule)
            elif n > 2:
                skipped.append(rule)
            # n == 0: plain TLD == the default rule; nothing to record
    return PslRules(frozenset(lit2), frozenset(lit3), frozenset(wc1),
                    frozenset(wc2), frozenset(exc2), frozenset(exc3),
                    tuple(skipped))


_US_STATES = (
    "al ak az ar ca co ct de fl ga hi id il in ia ks ky la me md ma mi mn "
    "ms mo mt ne nv nh nj nm ny nc nd oh ok or pa ri sc sd tn tx ut vt va "
    "wa wv wi wy dc").split()

_JP_PREFECTURES = (
    "hokkaido aomori iwate miyagi akita yamagata fukushima ibaraki tochigi "
    "gunma saitama chiba tokyo kanagawa niigata toyama ishikawa fukui "
    "yamanashi nagano gifu shizuoka aichi mie shiga kyoto osaka hyogo nara "
    "wakayama tottori shimane okayama hiroshima yamaguchi tokushima kagawa "
    "ehime kochi fukuoka saga nagasaki kumamoto oita miyazaki kagoshima "
    "okinawa").split()

_JP_CITY_WILDCARDS = ("kawasaki kitakyushu kobe nagoya sapporo sendai "
                      "yokohama").split()

#: The snapshot, expressed in the OFFICIAL file format and fed through
#: the same parser a production PSL file would use — so the vendored
#: path and the drop-in path are one code path.
_SNAPSHOT_LINES = [
    # gTLD-like second levels under ccTLDs, by registry
    *("%s.uk" % s for s in
      "co org me ltd plc net sch ac gov nhs police mod".split()),
    *("%s.au" % s for s in
      "com net org edu gov asn id act nsw nt qld sa tas vic wa".split()),
    *("%s.nz" % s for s in
      "co net org govt ac school geek gen kiwi maori iwi health mil "
      "parliament cri".split()),
    *("%s.jp" % s for s in "ac ad co ed go gr lg ne or".split()),
    *("%s.jp" % p for p in _JP_PREFECTURES),
    *("*.%s.jp" % c for c in _JP_CITY_WILDCARDS),
    *("!city.%s.jp" % c for c in _JP_CITY_WILDCARDS),
    *("%s.us" % s for s in _US_STATES),
    *("k12.%s.us" % s for s in _US_STATES),
    *("cc.%s.us" % s for s in _US_STATES),
    *("lib.%s.us" % s for s in _US_STATES),
    *("%s.za" % s for s in
      "ac co edu gov law mil net nom org school web".split()),
    *("%s.br" % s for s in
      "com net org gov edu mil art adv arq ato bio blog bmd cim cng cnt "
      "coop ecn eco emp eng esp etc eti far flog fnd fot fst g12 ggf imb "
      "ind inf jor jus leg lel mat med mus not ntr odo ppg pro psc psi "
      "qsl radio rec slg srv taxi teo tmp trd tur tv vet vlog wiki "
      "zlg".split()),
    *("%s.cn" % s for s in
      "com net org gov edu ac mil bj sh tj cq he sx nm ln jl hl js zj ah "
      "fj jx sd ha hb hn gd gx hi sc gz yn xz sn gs qh nx xj tw hk "
      "mo".split()),
    *("%s.in" % s for s in
      "co net org firm gen ind ac edu res gov mil nic".split()),
    *("%s.kr" % s for s in
      "co ne or re pe go mil ac hs ms es sc kg seoul busan daegu incheon "
      "gwangju daejeon ulsan gyeonggi gangwon chungbuk chungnam jeonbuk "
      "jeonnam gyeongbuk gyeongnam jeju".split()),
    *("%s.mx" % s for s in "com net org edu gob".split()),
    *("%s.ar" % s for s in
      "com net org edu gob gov int mil tur musica".split()),
    *("%s.tr" % s for s in
      "com net org edu gov mil bbs k12 av bel dr gen info name tel web "
      "pol tsk kep".split()),
    *("%s.il" % s for s in "co net org ac gov idf k12 muni".split()),
    *("%s.tw" % s for s in
      "com net org edu gov mil idv game ebiz club".split()),
    *("%s.hk" % s for s in "com net org edu gov idv".split()),
    *("%s.sg" % s for s in "com net org edu gov per".split()),
    *("%s.my" % s for s in "com net org edu gov mil name".split()),
    *("%s.th" % s for s in "co net org ac go in mi or".split()),
    *("%s.id" % s for s in
      "co net org ac go mil web sch or my biz desa ponpes".split()),
    *("%s.ph" % s for s in "com net org edu gov mil ngo i".split()),
    *("%s.vn" % s for s in
      "com net org edu gov int ac biz info name pro health".split()),
    *("%s.pl" % s for s in
      "com net org edu gov mil info biz waw".split()),
    *("%s.fr" % s for s in
      "asso avocat com gouv nom notaires pharmacien port prd tm".split()),
    *("%s.ua" % s for s in
      "com net org edu gov in kiev kyiv lviv kharkiv odesa dp "
      "crimea".split()),
    *("%s.at" % s for s in "ac co gv or".split()),
    *("%s.es" % s for s in "com nom org gob edu".split()),
    *("%s.pt" % s for s in "com edu gov int net nome org publ".split()),
    *("%s.gr" % s for s in "com edu net org gov".split()),
    *("%s.ro" % s for s in
      "com org tm nt nom info rec arts firm store www".split()),
    *("%s.ca" % s for s in
      "ab bc mb nb nf nl ns nt nu on pe qc sk yk gc".split()),
    *("%s.eg" % s for s in
      "com edu eun gov mil name net org sci".split()),
    *("%s.sa" % s for s in "com net org gov med pub edu sch".split()),
    *("%s.ae" % s for s in "co net org sch ac gov mil".split()),
    *("%s.ng" % s for s in
      "com edu gov mil mobi name net org sch i".split()),
    *("%s.ke" % s for s in "co or ne go ac sc me mobi info".split()),
    *("%s.pk" % s for s in
      "com net edu org fam biz web gov gob gok gon gop gos".split()),
    *("%s.cl" % s for s in "gov gob co mil".split()),
    *("%s.co" % s for s in "com net org edu gov mil nom".split()),
    *("%s.pe" % s for s in "com net org edu gob mil nom".split()),
    *("%s.ve" % s for s in
      "com net org edu gob mil web co info".split()),
    *("%s.uy" % s for s in "com net org edu gub mil".split()),
    *("%s.ec" % s for s in "com net org edu gob gov mil fin med pro".split()),
    *("%s.bo" % s for s in "com net org edu gob gov mil tv".split()),
    "gov.it", "edu.it", "gov.ie",
    # wildcard-only ccTLDs (every 2nd level is a registry)
    "*.bd", "*.ck", "!www.ck", "*.er", "*.fk", "*.jm", "*.kh", "*.mm",
    "*.np", "*.pg",
]

#: the compiled snapshot — built through :func:`parse_psl` so the
#: vendored data exercises the same code path as a dropped-in canonical
#: file.
VENDORED_RULES: PslRules = parse_psl("\n".join(_SNAPSHOT_LINES))
