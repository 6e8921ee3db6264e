"""URL source (S3): SSRF validation, content routing, filename
derivation, and the injected-fetch Spark pipeline.

Pinned to the reference's /v1/extract/url flow (app/main.py:516-639,
app/extractors.py:2650-2987); the fetch/resolve callables are injected —
deterministic fakes here, a real HTTP tier in production.
"""

from pyspark.sql import functions as F

from extract_text_spark.urlsource import (
    extract_from_urls, filename_from_response, ingest_urls_df,
    is_html_content, is_safe_url, spans_from_url,
)

def RESOLVE_PUBLIC(hostname):
    return ["93.184.216.34"]


def test_ssrf_gates_fail_closed():
    assert not is_safe_url("ftp://example.com/x")           # scheme
    assert not is_safe_url("http://localhost/x")            # hostname block
    assert not is_safe_url("http://127.0.0.1/x")            # loopback
    assert not is_safe_url("http://10.1.2.3/x")             # private
    assert not is_safe_url("http://192.168.1.9/x")
    assert not is_safe_url("http://169.254.169.254/meta")   # metadata svc
    assert not is_safe_url("http://172.17.0.1/x")           # docker bridge
    assert not is_safe_url("http://[fe80::1]/x")            # link-local v6
    assert not is_safe_url("http://example.com/x")          # no DNS -> closed
    assert is_safe_url("http://8.8.8.8/x")                  # literal public
    assert is_safe_url("http://example.com/x", resolver=RESOLVE_PUBLIC)
    # one bad IP among resolved addresses blocks the lot
    assert not is_safe_url(
        "http://multi.example/x",
        resolver=lambda h: ["93.184.216.34", "192.168.0.5"])


def test_content_routing_matches_reference():
    assert is_html_content("text/html; charset=utf-8", "http://x/y.pdf")
    assert is_html_content("application/xhtml+xml", "http://x/y")
    assert is_html_content("text/plain", "http://x/page.html")
    assert not is_html_content("text/plain", "http://x/notes.txt")
    assert is_html_content("", "http://x/dynamic")          # no ext = page
    assert not is_html_content("application/octet-stream", "http://x/f.bin")
    assert not is_html_content("application/pdf", "http://x/f.pdf")


def test_filename_derivation():
    assert filename_from_response(
        {"Content-Disposition": 'attachment; filename="r.pdf"'},
        "http://x/ignored") == "r.pdf"
    assert filename_from_response(
        {"content-type": "application/pdf"}, "http://x/report") == "report.pdf"
    assert filename_from_response({}, "http://x/docs/pap%20er.txt") == "pap er.txt"
    assert filename_from_response({}, "http://x/") == "downloaded_file"


def test_spans_from_url_error_surface():
    st, spans = spans_from_url("", lambda u, a: None)
    assert st == "error: URL is required" and spans == []
    st, _ = spans_from_url("gopher://x", lambda u, a: None)
    assert st == "error: URL must start with http:// or https://"
    st, _ = spans_from_url("http://10.0.0.1/", lambda u, a: None)
    assert st == ("error: Access to internal IP addresses is prohibited "
                  "for security reasons.")
    st, _ = spans_from_url("http://example.com/x", None,
                           resolver=RESOLVE_PUBLIC)
    assert st.startswith("error: Error processing URL:")
    boom = lambda u, a: (_ for _ in ()).throw(
        ConnectionError("Failed to load page"))
    st, _ = spans_from_url("http://example.com/x", boom,
                           resolver=RESOLVE_PUBLIC)
    assert st == "error: Error processing URL: Failed to load page"


def _make_fakes():
    """Fetch/resolver defined inside a function so cloudpickle serializes
    them BY VALUE — module-level functions of a test module pickle by
    reference and executors cannot import tests.* (ext_url_source in
    queries.py nests its fetch for the same reason)."""
    def fake_fetch(url, ua):
        if url.endswith(".html"):
            html = ("<html><body><nav>chrome</nav><p>Body of the page</p>"
                    "<script>x()</script></body></html>")
            return {"content_type": "text/html", "final_url": url,
                    "headers": {}, "content": html.encode()}
        return {"content_type": "text/plain", "final_url": url,
                "headers": {"content-type": "text/plain"},
                "content": b"plain payload"}

    def resolve_public(hostname):
        return ["93.184.216.34"]

    return fake_fetch, resolve_public


def test_url_pipeline_end_to_end(spark):
    fake_fetch, resolve_public = _make_fakes()
    urls = spark.createDataFrame(
        [("http://site.example/page.html",),
         ("http://site.example/notes.txt",),
         ("http://localhost/blocked",)], "url string")
    out = extract_from_urls(urls, fake_fetch, resolver=resolve_public)
    rows = {r.doc_id: r for r in out.collect()}
    page = rows["http://site.example/page.html"]
    assert page.status == "ok"
    assert page.spans[0].text == "Body of the page"        # chrome stripped
    txt = rows["http://site.example/notes.txt"]
    assert txt.status == "ok" and txt.spans[0].text == "plain payload"
    blk = rows["http://localhost/blocked"]
    assert blk.status.startswith("error: Access to internal IP")
    assert blk.spans == []


def test_url_ingest_is_single_python_stage(spark):
    fake_fetch, resolve_public = _make_fakes()
    urls = spark.createDataFrame([("http://site.example/a.html",)],
                                 "url string")
    plan = ingest_urls_df(urls, fake_fetch, resolver=resolve_public) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
