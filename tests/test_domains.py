"""Registrable-domain extraction (publicsuffix.org algorithm)."""

from __future__ import annotations

from go_htmldate_ray.state.urls import split_registrable


def test_psl_branches():
    cases = {
        # multi-label exact rule beats the 1-label one
        "www.paper3.co.uk": ("co.uk", "paper3.co.uk"),
        "deep.sub.gov.uk": ("gov.uk", "sub.gov.uk"),
        "news5.com": ("com", "news5.com"),
        # private-registry rule (github.io beats io)
        "user2.github.io": ("github.io", "user2.github.io"),
        # host IS a public suffix -> no registrable domain
        "github.io": ("github.io", None),
        "co.uk": ("co.uk", None),
        # wildcard *.ck: the star consumes one label
        "a1.b2.ck": ("b2.ck", "a1.b2.ck"),
        "b2.ck": ("b2.ck", None),
        # exception !www.ck: suffix = exception minus leftmost label
        "www.ck": ("ck", "www.ck"),
        "sub.www.ck": ("ck", "www.ck"),
        "archive.m3.edu.cn": ("edu.cn", "m3.edu.cn"),
        "site9.example.org": ("org", "example.org"),
        # no rule matches -> implicit "*" (top label is the suffix)
        "localhost": ("localhost", None),
        "x.localhost": ("localhost", "x.localhost"),
        # case/trailing-dot normalization
        "WWW.Paper3.CO.UK.": ("co.uk", "paper3.co.uk"),
    }
    for host, want in cases.items():
        assert split_registrable(host) == want, host


def test_registrable_longest_rule_wins():
    # com.au (2 labels) must beat au (1 label)
    ps, reg = split_registrable("shop.example.com.au")
    assert ps == "com.au" and reg == "example.com.au"


def test_registrable_domains_pipeline(ray_session):
    from go_htmldate_ray.pipelines.extract_dates import registrable_domains

    df = registrable_domains("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    # engine rows agree with the scalar kernel
    for row in df.itertuples():
        ps, reg = split_registrable(row.host)
        assert row.public_suffix == ps
        assert row.registrable_domain == (reg or "")
    # the fixture exercises the NULL-registrable branch
    assert (df["registrable_domain"] == "").any()
    # every non-empty registrable domain ends with its public suffix and
    # has exactly one more label
    nz = df[df["registrable_domain"] != ""]
    assert (
        nz.apply(lambda r: r.registrable_domain.endswith("." + r.public_suffix), axis=1)
    ).all()
    assert (
        nz.registrable_domain.str.count(r"\.")
        == nz.public_suffix.str.count(r"\.") + 1
    ).all()


def test_domain_page_counts(ray_session):
    from go_htmldate_ray.pipelines.extract_dates import (
        domain_page_counts,
        registrable_domains,
    )

    sf = "/root/testdata/sf0.001"
    counts = domain_page_counts(sf).to_pandas()
    per_host = registrable_domains(sf).to_pandas()
    # every page lands in exactly one domain group
    assert counts.n_pages.sum() == len(per_host)
    # grouping key: registrable domain, falling back to the suffix
    expect = (
        (per_host.registrable_domain.where(per_host.registrable_domain != "",
                                           per_host.public_suffix))
        .value_counts()
        .to_dict()
    )
    got = dict(zip(counts.domain, counts.n_pages))
    assert got == expect


def test_recrawl_intervals(ray_session):
    from go_htmldate_ray.pipelines.extract_dates import recrawl_intervals

    df = recrawl_intervals("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    assert df.interval_waves.between(1, 32).all()
    # revisit-more-what-changes-more: interval is non-increasing in rate
    s = df.sort_values("change_rate_ppm")
    assert (s.interval_waves.diff().dropna() <= 0).all()
    # exact rule
    import numpy as np

    ppm = s.change_rate_ppm.to_numpy()
    expect = np.clip(1_000_000 // np.maximum(ppm, 1) // 16, 1, 32)
    assert (s.interval_waves.to_numpy() == expect).all()
