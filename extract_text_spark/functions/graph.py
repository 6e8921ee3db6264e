"""Host-graph ranking: PageRank as a distributed power iteration.

Crawl pipelines use host/domain-level PageRank (or harmonic centrality,
e.g. the CommonCrawl host ranks) as a quality PRIOR: a page inherits a
score from its host's position in the link graph before any content is
read. The iteration is the classic join+aggregate shape — each round is
one equi-join of ranks onto edges plus one map-side-combined groupBy on
the destination — which is exactly how GraphX/Pregel lowers it, so the
plan scales to billion-edge host graphs (edges shuffle once per round on
uniform host keys; ranks are one row per host).

Determinism: ranks are integer "units" (the total starts at RANK_SCALE),
every transfer is floor division — (r * damping_milli) // 1_000_000 //
out_deg — so each iteration is exact integer arithmetic with a DuckDB
twin (queries.py unrolls the rounds as chained CTEs, the kmeans oracle
trick). Mass lost to flooring and to dangling hosts (no out-links) is
dropped, not redistributed — documented, identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RANK_SCALE = 1_000_000_000_000  # total initial rank mass (integer units)


def pagerank(edges: DataFrame, iters: int = 2,
             damping_milli: int = 850_000,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Integer-exact PageRank over a (src, dst) edge list.

    * nodes = distinct endpoints; r0 = RANK_SCALE // N each
    * per round: share(u) = (r(u) * damping_milli) // 1e6 // out_deg(u),
      r'(v) = teleport + sum of shares over in-edges(v), with
      teleport = (RANK_SCALE * (1e6 - damping_milli)) // 1e6 // N
    * dangling hosts keep receiving teleport but their own mass drops
      (the no-redistribution variant — exact and order-free)

    Returns (host, rank) with rank in integer units. The edge list is
    read every round (persist it upstream for many iterations); ranks
    never leave the executors — no driver state at all.
    """
    from pyspark.storagelevel import StorageLevel

    src, dst = F.col(src_col).alias("host"), F.col(dst_col).alias("host")
    # one row per host, read by the count plus every iteration's rank
    # rebuild — persist so the endpoint union+distinct shuffle (the most
    # expensive stage on a billion-edge graph) runs once, not iters+1
    # times; ContextCleaner reclaims it once the plan is unreferenced
    nodes = (edges.select(src).union(edges.select(dst)).distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))
    n = nodes.count()  # one scalar; the only driver-side value
    if n == 0:
        raise ValueError("pagerank: empty edge list (no hosts to rank)")
    teleport = (RANK_SCALE * (1_000_000 - damping_milli)) // 1_000_000 // n
    out_deg = (edges.groupBy(F.col(src_col).alias("host"))
               .agg(F.count("*").alias("deg")))
    ranks = nodes.withColumn("rank", F.lit(RANK_SCALE // n).cast("long"))
    for _ in range(iters):
        shares = (
            edges.join(ranks.withColumnRenamed("host", src_col), src_col)
            .join(out_deg.withColumnRenamed("host", src_col), src_col)
            .select(
                F.col(dst_col).alias("host"),
                F.call_function(
                    "div",
                    F.call_function(
                        "div", F.col("rank") * damping_milli,
                        F.lit(1_000_000)),
                    F.col("deg")).alias("share"))
        )
        inbound = shares.groupBy("host").agg(F.sum("share").alias("inflow"))
        ranks = (
            nodes.join(inbound, "host", "left")
            .select("host",
                    (F.lit(teleport)
                     + F.coalesce(F.col("inflow"), F.lit(0)))
                    .cast("long").alias("rank"))
        )
    return ranks


_SKIP_SCHEMES = ("javascript:", "mailto:", "data:", "tel:")


def _resolve_outlinks(page_url: str, html: str,
                      cap: int | None = None) -> list[tuple[int, str, str, str]]:
    """(link_idx, raw href, resolved absolute URL, lowercased host) for
    every fetchable ``<a href>`` in document order: RFC 3986 resolution
    (stdlib ``urljoin`` — relative paths, dot segments, //network-path,
    query-only all handled), fragments stripped from the result,
    empty/fragment-only hrefs and non-fetchable schemes skipped."""
    from urllib.parse import urljoin, urlsplit, urlunsplit

    from ..extractors.html import find_hrefs

    out = []
    for idx, href in enumerate(find_hrefs(html, cap=cap)):
        h = href.strip()
        if not h or h.startswith("#"):
            continue
        if h.lower().startswith(_SKIP_SCHEMES):
            continue
        try:
            # urljoin/urlsplit raise ValueError on malformed authorities
            # (e.g. 'http://[bad' -> "Invalid IPv6 URL"); one hostile href
            # must drop itself, never the kernel task.
            parts = urlsplit(urljoin(page_url, h))
        except ValueError:
            continue
        resolved = urlunsplit((parts.scheme, parts.netloc, parts.path,
                               parts.query, ""))
        host = (parts.hostname or "").lower()
        if not host:
            continue
        out.append((idx, href, resolved, host))
    return out


def harvest_outlinks(df: DataFrame, id_col: str = "doc_id",
                     url_col: str = "url", html_col: str = "html",
                     cap: int | None = None) -> DataFrame:
    """Outlink extraction over (id, page URL, HTML) rows — the edge-list
    producer for ``pagerank`` and crawl frontiers. One Arrow kernel per
    row (iterator-form mapInPandas, never row-at-a-time Python);
    compose with ``F.transform``-free downstream ops: the host column
    feeds ``registrable_domain_col`` + ``pagerank`` directly."""
    from pyspark.sql.types import (IntegerType, LongType, StringType,
                                   StructField, StructType)

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("link_idx", IntegerType()),
        StructField("href", StringType()),
        StructField("resolved", StringType()),
        StructField("host", StringType()),
    ])

    def kernel(batches):
        import pandas as pd
        for b in batches:
            rows = []
            for doc_id, url, html in zip(b["doc_id"], b["url"], b["html"]):
                for idx, href, resolved, host in _resolve_outlinks(
                        str(url), str(html), cap=cap):
                    rows.append((int(doc_id), idx, href, resolved, host))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(url_col).alias("url"),
                    F.col(html_col).alias("html"))
    return src.mapInPandas(kernel, schema=schema)
