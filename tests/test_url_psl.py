"""Registered-domain (PSL) keying: Spark column expr == python reference ==
DuckDB oracle SQL on a battery of hosts, and per-domain quota sampling
grouping subdomains of one registered domain together."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fairy_core_spark.data.public_suffixes import registered_domain_py
from fairy_core_spark.operators.text import (
    registered_domain,
    registered_domain_sql,
    url_domain,
)

HOSTS = [
    "example.com",
    "www.example.com",
    "a.b.example.com",
    "example.co.uk",
    "www.example.co.uk",
    "deep.sub.example.co.uk",
    "myblog.blogspot.com",
    "www.myblog.blogspot.com",
    "user.github.io",
    "project.user.github.io",
    "bucket.s3.amazonaws.com",
    "x.bucket.s3.amazonaws.com",
    "gov.uk",          # host == a suffix: passes through (last-2 default)
    "localhost",       # no dot: passes through
    "example.xyz",     # one-label TLD via the default rule
    "sub.example.com.br",
    "example.waw.pl",
    # nested suffix pair (edu.au AND act.edu.au both listed): longest match
    # must win — the inverted (shortest-first) chain returns 'act.edu.au'
    "school.act.edu.au",
    "www.school.act.edu.au",
    "uni.edu.au",       # only the 2-label suffix matches
    "act.edu.au",       # host == the 3-label suffix: default last-2... see EXPECT
    # FQDN trailing dot (legal in URLs): must key identically to the
    # dotless host, not collapse to 'com.' / 'uk.'
    "example.com.",
    "www.example.co.uk.",
    "",
]

EXPECT = {
    "example.com": "example.com",
    "www.example.com": "example.com",
    "a.b.example.com": "example.com",
    "example.co.uk": "example.co.uk",
    "www.example.co.uk": "example.co.uk",
    "deep.sub.example.co.uk": "example.co.uk",
    "myblog.blogspot.com": "myblog.blogspot.com",
    "www.myblog.blogspot.com": "myblog.blogspot.com",
    "user.github.io": "user.github.io",
    "project.user.github.io": "user.github.io",
    "bucket.s3.amazonaws.com": "bucket.s3.amazonaws.com",
    "x.bucket.s3.amazonaws.com": "bucket.s3.amazonaws.com",
    "gov.uk": "gov.uk",
    "localhost": "localhost",
    "example.xyz": "example.xyz",
    "sub.example.com.br": "example.com.br",
    "example.waw.pl": "example.waw.pl",
    "school.act.edu.au": "school.act.edu.au",
    "www.school.act.edu.au": "school.act.edu.au",
    "uni.edu.au": "uni.edu.au",
    # host IS the 3-label suffix: no PROPER longer suffix matches, but the
    # 2-label probe ('edu.au', a proper suffix here) fires -> itself
    "act.edu.au": "act.edu.au",
    "example.com.": "example.com",
    "www.example.co.uk.": "example.co.uk",
    "": "",
}


def test_python_reference_battery():
    for h in HOSTS:
        assert registered_domain_py(h) == EXPECT[h], h


def test_spark_matches_python_reference(spark):
    df = spark.createDataFrame([(h,) for h in HOSTS], "host string")
    got = {
        r["host"]: r["rd"]
        for r in df.select("host", registered_domain(F.col("host")).alias("rd")).collect()
    }
    assert got == EXPECT


def test_duckdb_sql_matches_python_reference():
    con = duckdb.connect()
    hosts = ", ".join(f"('{h}')" for h in HOSTS)
    sql = (
        f"SELECT host, {registered_domain_sql('host')} AS rd "
        f"FROM (VALUES {hosts}) AS t(host)"
    )
    got = dict(con.execute(sql).fetchall())
    assert got == EXPECT


def test_quota_sample_keys_on_registered_domain(spark):
    """30 subdomain URLs of one registered domain + 5 of another; quota 4
    per registered domain must keep 4 + 4 (full-host keying would keep all
    35 — the production-convention gap ADVICE flagged)."""
    from fairy_core_spark.operators.sampling import quota_sample

    rows = [(i, f"https://sub{i}.example.co.uk/p") for i in range(30)]
    rows += [(100 + i, f"https://www.other.com/{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    keyed = df.select(
        "doc_id", registered_domain(url_domain(F.col("url"))).alias("domain")
    )
    kept = quota_sample(keyed, "domain", "doc_id", 4)
    by_dom = {
        r["domain"]: r["n"]
        for r in kept.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert by_dom == {"example.co.uk": 4, "other.com": 4}


@pytest.mark.parametrize("h", ["a.github.io", "b.co.jp", "c.d.e.f.com.au"])
def test_three_engines_agree_on_extra_hosts(spark, h):
    con = duckdb.connect()
    want = registered_domain_py(h)
    sdf = spark.createDataFrame([(h,)], "host string")
    got_spark = sdf.select(registered_domain(F.col("host")).alias("rd")).first()["rd"]
    got_duck = con.execute(
        f"SELECT {registered_domain_sql('host')} FROM (VALUES ('{h}')) t(host)"
    ).fetchone()[0]
    assert got_spark == want == got_duck


def test_three_engines_agree_on_random_hosts(spark):
    """300 seeded random hosts over an adversarial alphabet — labels drawn
    from suffix fragments (uk, co, edu, au, act, blogspot, com, ...) plus
    noise, 1-6 labels, with/without trailing dot — Spark == DuckDB SQL ==
    python reference on every one."""
    import random

    rng = random.Random(20260819)
    frags = ["uk", "co", "edu", "au", "act", "nsw", "com", "net", "org",
             "blogspot", "github", "io", "amazonaws", "s3", "example",
             "www", "x", "a1", "waw", "pl", "gov"]
    hosts = []
    for _ in range(300):
        n = rng.randint(1, 6)
        h = ".".join(rng.choice(frags) for _ in range(n))
        if rng.random() < 0.15:
            h += "."
        hosts.append(h)
    hosts = sorted(set(hosts))

    exp = {h: registered_domain_py(h) for h in hosts}
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got_spark = {
        r["host"]: r["rd"]
        for r in df.select("host", registered_domain(F.col("host")).alias("rd")).collect()
    }
    assert got_spark == exp

    vals = ", ".join(f"('{h}')" for h in hosts)
    got_sql = dict(
        duckdb.sql(
            f"SELECT host, {registered_domain_sql('host')} AS rd "
            f"FROM (VALUES {vals}) t(host)"
        ).fetchall()
    )
    assert got_sql == exp


def _canon_py(u: str) -> str:
    """Independent python replay of canonical_url's 4 documented steps."""
    import re

    u = re.sub(r"#.*$", "", u)
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", u)
    head = m.group(0) if m else ""
    rest = u[len(head):]
    head = head.lower()
    head = re.sub(r"^(https://[^/?#]*):443$", r"\1", head)
    head = re.sub(r"^(http://[^/?#]*):80$", r"\1", head)
    path = re.match(r"^[^?]*", rest).group(0)
    qm = re.match(r"^[^?]*\?(.*)$", rest)
    query = qm.group(1) if qm else ""
    params = sorted(p for p in query.split("&") if p and not p.startswith("utm_"))
    q2 = "&".join(params)
    return head + path + ("?" + q2 if q2 else "")


def test_canonical_url_random_battery(spark):
    """200 seeded random URLs across the edge classes (schemes, default and
    odd ports, userinfo, empty paths, utm-only queries, dup params, mixed
    case, fragments, schemeless strings): Spark == the independent python
    replay of the documented contract."""
    import random

    from fairy_core_spark.operators.text import canonical_url

    rng = random.Random(20260819)
    schemes = ["https", "http", "HTTPS", "HtTp", "ftp"]
    hostparts = ["Example.COM", "a.b.ORG", "x.co.uk", "127.0.0.1"]
    ports = ["", ":443", ":80", ":8080"]
    users = ["", "user@", "u:p@"]
    paths = ["", "/", "/Path/To/X", "/a%20b"]
    params = ["", "a=1", "utm_source=x", "b=2", "a=1&a=0", "utm_a=1&utm_b=2",
              "z=9&b=2&a=1", "&&a=1&"]
    frags = ["", "#sec", "#a?b=1"]
    urls = []
    for _ in range(200):
        u = (rng.choice(schemes) + "://" + rng.choice(users)
             + rng.choice(hostparts) + rng.choice(ports)
             + rng.choice(paths)
             + ("?" + rng.choice(params) if rng.random() < 0.8 else "")
             + rng.choice(frags))
        urls.append(u)
    urls += ["no-scheme-at-all", "https://", "http://h:80", "https://H:443/?utm_x=1"]
    urls = sorted(set(urls))

    exp = {u: _canon_py(u) for u in urls}
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonical_url(F.col("url")).alias("c")).collect()
    }
    assert got == exp
