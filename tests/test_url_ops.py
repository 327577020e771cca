"""URL canonicalization (functions/url_ops.py) vs hand-written expectations
and the distributed url_dedup rollup vs a pandas oracle."""
import pyarrow as pa


CASES = [
    # fragment, uppercase scheme+host, default port, www, params, slash
    ("HTTP://WWW.Example.COM:80/Page/3/?a=1&utm_source=feed#sec",
     "http://example.com/Page/3?a=1"),
    ("https://example5.com:443/Page/7?utm_campaign=x&fbclid=abc",
     "https://example5.com/Page/7"),
    ("https://example5.com:8443/Page/7",          # NON-default port kept
     "https://example5.com:8443/Page/7"),
    ("http://host.com/path?gclid=1&b=2&utm_x=3&c=4",
     "http://host.com/path?b=2&c=4"),             # survivor order preserved
    ("https://www.h.com/", "https://h.com"),
    ("http://h.com/a///", "http://h.com/a"),
    ("http://h.com/a?", "http://h.com/a"),        # empty query dropped
    ("http://h.com", "http://h.com"),
    ("HTTPS://H.com/Case/Kept", "https://h.com/Case/Kept"),
]


def test_canonicalize_cases():
    from geotrellis_ray.functions.url_ops import canonicalize_urls

    got = canonicalize_urls(pa.array([c[0] for c in CASES])).to_pylist()
    assert got == [c[1] for c in CASES]


def test_url_dedup_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from geotrellis_ray.functions.url_ops import canonicalize_urls, url_dedup

    urls = [
        "http://a.com/x?utm_source=1",
        "HTTP://A.com/x/",
        "http://www.a.com/x#frag",
        "https://a.com/x",          # different scheme: NOT a dup of the above
        "https://b.com/y?q=1",
        "https://b.com/y?q=1&gclid=z",
    ]
    tab = pa.table({"doc_id": pa.array(range(len(urls)), pa.int64()),
                    "url": pa.array(urls)})
    got = (url_dedup(rd.from_arrow(tab).repartition(3), "url", "doc_id")
           .to_pandas().sort_values("canonical_url").reset_index(drop=True))
    canon = canonicalize_urls(tab["url"]).to_pylist()
    exp = (pd.DataFrame({"canonical_url": canon, "doc_id": range(len(urls))})
           .groupby("canonical_url")["doc_id"].agg(n_dups="count", first_doc="min")
           .reset_index())
    assert got["canonical_url"].tolist() == exp["canonical_url"].tolist()
    assert got["n_dups"].tolist() == exp["n_dups"].tolist()
    assert got["first_doc"].tolist() == exp["first_doc"].tolist()
    # the three http://a.com/x variants collapsed
    assert int(got.set_index("canonical_url").loc["http://a.com/x", "n_dups"]) == 3
