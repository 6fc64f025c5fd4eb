"""Trimmed snapshot of the Public Suffix List (publicsuffix.org, MPL-2.0).

The full PSL is ~9k rules; this snapshot keeps the high-traffic subset a
web-corpus pipeline actually meets: all entries here are verbatim PSL rules
(ICANN section two-level country suffixes + the most common private-section
hosting suffixes). Trimming is SAFE for the registered-domain algorithm:
a host whose true suffix is missing falls back to the PSL default rule
(suffix = last label), which yields the last-two-labels registered domain —
the correct answer for every generic TLD, and a *coarser* (never wrong-er)
grouping key for an exotic ccTLD. Swap in the full list by regenerating
these tuples from the published file; the algorithm (longest-match, then
+1 label) is the PSL standard and does not change.

No wildcard (``*.ck``) or exception (``!www.ck``) rules are included —
documented limitation; both are absent from the traffic this engine keys.
"""

# two- and three-label public suffixes (the one-label default rule covers
# every plain TLD implicitly, so single labels are not listed)
PSL_MULTI: tuple[str, ...] = (
    # --- ICANN section: country second-level registrations ---
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # nested under edu.au (verbatim PSL state-education rules) — these make
    # the snapshot contain suffix pairs where one is a suffix of the other,
    # which is what pins longest-match precedence in the probing code
    "act.edu.au", "nsw.edu.au", "vic.edu.au", "qld.edu.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "geek.nz",
    "co.kr", "or.kr", "ne.kr", "re.kr", "pe.kr", "go.kr", "mil.kr", "ac.kr",
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "gov.in", "mil.in", "nic.in", "res.in",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "av.tr", "bel.tr",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "sch.sa",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "sch.ng",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za", "edu.za",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "k12.il",
    "co.id", "or.id", "net.id", "web.id", "ac.id", "sch.id", "go.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "ngo.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "fam.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "mil.bd",
    "co.th", "or.th", "in.th", "ac.th", "go.th", "mi.th", "net.th",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
    "co.ke", "or.ke", "ne.ke", "ac.ke", "go.ke", "sc.ke",
    "com.gh", "org.gh", "edu.gh", "gov.gh", "mil.gh",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    "com.ve", "net.ve", "org.ve", "web.ve", "co.ve", "gob.ve",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "fin.ec",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    "co.cr", "or.cr", "ac.cr", "fi.cr", "go.cr", "sa.cr", "ed.cr",
    # --- private section: hosting platforms (each customer = a domain) ---
    "github.io", "githubusercontent.com", "gitlab.io",
    "blogspot.com", "wordpress.com", "tumblr.com", "weebly.com",
    "netlify.app", "vercel.app", "pages.dev", "workers.dev",
    "herokuapp.com", "appspot.com", "web.app", "firebaseapp.com",
    "azurewebsites.net", "cloudapp.net", "cloudfront.net",
    "s3.amazonaws.com", "elb.amazonaws.com", "wixsite.com",
    "fastly.net", "fly.dev", "onrender.com", "repl.co", "glitch.me",
    "readthedocs.io", "surge.sh", "neocities.org", "carrd.co",
)

MAX_SUFFIX_LABELS = max(s.count(".") + 1 for s in PSL_MULTI)  # == 3


def suffixes_by_labels() -> dict[int, list[str]]:
    """{label_count: sorted suffixes} for longest-match probing."""
    out: dict[int, list[str]] = {}
    for s in PSL_MULTI:
        out.setdefault(s.count(".") + 1, []).append(s)
    return {k: sorted(v) for k, v in sorted(out.items(), reverse=True)}


_PSL_SET = frozenset(PSL_MULTI)


def registered_domain_py(host: str) -> str:
    """Reference (driver-side) registered-domain: longest PSL suffix match
    then one more label; PSL default rule (suffix = last label) otherwise;
    a host that IS a suffix, or has no dot, returns itself."""
    if not host:
        return ""
    h = host.lower().rstrip(".")  # FQDN trailing dot: key as the dotless host
    labels = h.split(".")
    # longest PROPER multi-label suffix (strictly shorter than the host)
    for n in range(min(MAX_SUFFIX_LABELS, len(labels) - 1), 1, -1):
        if ".".join(labels[-n:]) in _PSL_SET:
            return ".".join(labels[-(n + 1):])
    return ".".join(labels[-2:]) if len(labels) >= 2 else h
