"""Crawl-frontier scheduling: politeness-aware fetch dispatch.

After the CDX selection (`cdx.cdx_fetch_list`) and the REP gate
(`robots.robots_filter`), a crawler still must not hammer a host: one
connection per host, ``Crawl-delay`` seconds between requests
(`robots.crawl_delays`).  This module turns a fetch list into a
DISPATCH SCHEDULE that preserves politeness under arbitrary cluster
parallelism:

* every URL of a host goes to the SAME worker — ``worker =
  md5(host) % n_workers`` — so per-host serialization needs no
  cross-executor coordination at all (the only global agreement is the
  hash function);
* within a host, URLs are ordered deterministically (by urlkey) and the
  k-th URL dispatches no earlier than ``k * delay`` seconds into the
  crawl — the per-host token-bucket schedule, precomputed as data;
* hosts without a ``Crawl-delay`` get ``default_delay``.

Plan shape at scale: one window partitioned by host (bounded per host
by the upstream per-host fetch caps — `urlfns.domain_cap` exists for
exactly that), the delay table broadcast (one row per host with a
directive — far smaller than the fetch list).  Everything is
scan-side/JVM expressions; the schedule is value-oracled in DuckDB
(same window, same md5-prefix worker assignment).  No reference
counterpart; politeness semantics per the public crawler literature
(Heritrix/Nutch frontier design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fetch_schedule", "fetch_schedule_sql"]

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)"


def fetch_schedule(fetch: DataFrame, delays: DataFrame,
                   default_delay: float = 1.0,
                   n_workers: int = 8) -> DataFrame:
    """(host, urlkey, url, worker, slot, dispatch_at_s) for every fetch
    task: ``worker`` pins the host to one executor slot, ``slot`` is
    the per-host sequence number (urlkey order), ``dispatch_at_s`` the
    earliest polite dispatch time."""
    if n_workers <= 0:
        raise ValueError(f"fetch_schedule: n_workers must be positive, "
                         f"got {n_workers}")
    host = F.regexp_extract(F.col("url"), _HOST_RE, 1)
    f = fetch.withColumn("host", host)
    j = f.join(F.broadcast(delays), "host", "left")
    w = Window.partitionBy("host").orderBy("urlkey")
    slot = F.row_number().over(w) - 1
    delay = F.coalesce(F.col("delay_s"), F.lit(float(default_delay)))
    worker = F.pmod(
        F.conv(F.substring(F.md5(F.col("host")), 1, 8), 16, 10)
        .cast("long"), F.lit(n_workers)).cast("int")
    return j.select(
        "host", "urlkey", "url",
        worker.alias("worker"),
        slot.alias("slot"),
        F.round(slot * delay, 3).alias("dispatch_at_s"))


def fetch_schedule_sql(fetch_sql: str, delays_sql: str,
                       default_delay: float = 1.0,
                       n_workers: int = 8) -> str:
    """DuckDB mirror: same host regex, same md5-prefix worker hash
    (hex prefix → bigint both sides), same per-host window.  NB the
    task CTE must not be named ``fetch`` — reserved in DuckDB's
    FETCH FIRST grammar."""
    return f"""
with fetchq as ({fetch_sql}),
delays as ({delays_sql}),
f as (
  select *, regexp_extract(url, '{_HOST_RE}', 1) as host from fetchq
),
j as (
  select f.*, d.delay_s from f left join delays d using (host)
),
s as (
  select host, urlkey, url,
         (('0x' || substr(md5(host), 1, 8))::bigint % {n_workers})::int
           as worker,
         (row_number() over (partition by host order by urlkey) - 1)
           ::bigint as slot,
         coalesce(delay_s, {float(default_delay)}) as delay
  from j
)
select host, urlkey, url, worker, slot,
       round(slot * delay, 3) as dispatch_at_s
from s
"""
