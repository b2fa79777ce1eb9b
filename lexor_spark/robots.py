"""robots.txt (Robots Exclusion Protocol) parsing and URL filtering.

Every polite crawl pipeline applies the REP before fetching: parse each
host's ``robots.txt``, collect the rule group that applies to the
crawler, and allow/deny each candidate URL by the LONGEST matching
rule path (ties: Allow wins) — the google/rep semantics (RFC 9309).

This module implements RFC 9309 as pure relational operators so the
DuckDB oracle can verify values:

* ``parse_robots``: bodies → per-host ``(rule, path)`` rows for the
  group that applies to the crawler.  Group structure (consecutive
  ``User-agent`` lines bind to the rule block that follows) is
  recovered with two windows over ``(host, line_no)`` — a robots file
  is a few hundred lines, so the per-host window is trivially bounded.
  Group selection per RFC 9309 §2.2.1: with an ``agent`` product
  token, the group(s) whose User-agent value is the LONGEST
  case-insensitive prefix of the token win; same-specificity groups
  are combined; ``*`` groups apply only when no specific group
  matches.  ``agent=None`` (default) selects the ``*`` group.
* ``robots_filter``: candidate URLs join the (broadcast) rule table on
  host; rule paths are RFC-9309 patterns — ``*`` matches any char
  sequence, a trailing ``$`` anchors end-of-path — compiled to Java/
  RE2 regexes scan-side (plain-prefix rules keep a ``startswith``
  fast path, no regex engine).  One per-URL window picks the most
  specific match = most pattern octets (RFC 9309 §2.2.2), Allow wins
  length ties; URLs with no matching rule (or no robots.txt) are
  allowed.  The rules side is tiny next to the URL corpus, so it is
  broadcast by default — no host-keyed shuffle, and a mega-host's
  URL skew never concentrates a join task; the decision window
  partitions by URL.

* ``crawl_delays``: the de-facto ``Crawl-delay`` politeness extension
  (RFC 9309 §2.2.4 custom-rule slot), selected with the same UA-group
  machinery; feeds the fetch scheduler (`frontier.py`).

No reference counterpart; format per the public RFC 9309.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["robots_fixture_df", "ROBOTS_FIXTURE_SQL", "parse_robots",
           "crawl_delays", "crawl_delays_sql",
           "parse_robots_sql", "robots_filter", "robots_filter_sql",
           "robots_sitemaps", "robots_sitemaps_sql", "sitemap_entries",
           "sitemap_entries_sql", "sitemap_fixture_df",
           "sitemap_index", "sitemap_index_sql", "sitemap_index_fixture_df",
           "SITEMAP_FIXTURE_SQL",
           "x_robots_noindex", "index_gate", "index_gate_sql"]


# ---------------------------------------------------------------------------
# deterministic fixture: one robots.txt body per host class
# ---------------------------------------------------------------------------

def robots_fixture_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, robots_txt) for every distinct fixture host: four rule
    shapes by host-class — a /private block with an Allow carve-out, a
    deny-all-with-carve-out, rules hidden in a non-star group (must be
    ignored), and a wildcard class (``*``/trailing-``$`` patterns plus
    a ``lexorbot`` group that shadows the star group for that agent)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hosts = (docs.select(
        (F.col("doc_id") % 97).alias("h"))
        .distinct()
        .select(F.concat(F.lit("site"), F.col("h").cast("string"),
                         F.lit(".example")).alias("host"),
                F.col("h")))
    body = (
        F.when(F.col("h") % 4 == 0, F.concat(
            F.lit("# fixture robots\nUser-agent: *\n"
                  "Disallow: /private\n"
                  "Allow: /private/ok\n"
                  "Crawl-delay: 2\n\n"
                  "User-agent: evilbot\nDisallow: /\n")))
        .when(F.col("h") % 4 == 1, F.concat(
            F.lit("User-agent: archiver\nUser-agent: *\n"
                  "Disallow: /\n"
                  "Allow: /pub\n"
                  "Crawl-delay: 1.5\n"
                  "Sitemap: https://"), F.col("host"),
            F.lit("/sitemap.xml\n")))
        .when(F.col("h") % 4 == 2, F.lit(
            "User-agent: evilbot\nDisallow: /\nCrawl-delay: 99\n\n"
            "User-agent: *\nDisallow:\n"))
        .otherwise(F.lit(
            "User-agent: *\n"
            "Disallow: /*.pdf$\n"
            "Disallow: /private/*/tmp\n"
            "Allow: /private\n\n"
            "User-agent: lexorbot\n"
            "Disallow: /nobots\n"
            "Allow: /nobots/ok\n"
            "Crawl-delay: 0.5\n")))
    return hosts.select("host", body.alias("robots_txt"))


ROBOTS_FIXTURE_SQL = """
select 'site' || h || '.example' as host,
       case
         when h % 4 = 0 then '# fixture robots
User-agent: *
Disallow: /private
Allow: /private/ok
Crawl-delay: 2

User-agent: evilbot
Disallow: /
'
         when h % 4 = 1 then 'User-agent: archiver
User-agent: *
Disallow: /
Allow: /pub
Crawl-delay: 1.5
Sitemap: https://site' || h || '.example/sitemap.xml
'
         when h % 4 = 2 then 'User-agent: evilbot
Disallow: /
Crawl-delay: 99

User-agent: *
Disallow:
'
         else 'User-agent: *
Disallow: /*.pdf$
Disallow: /private/*/tmp
Allow: /private

User-agent: lexorbot
Disallow: /nobots
Allow: /nobots/ok
Crawl-delay: 0.5
'
       end as robots_txt
from (select distinct doc_id % 97 as h from documents)
"""


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def _group_lines(robots: DataFrame, host_col: str, body_col: str,
                 agent: str | None) -> DataFrame:
    """Directive lines of the UA group(s) that apply to ``agent`` (RFC
    9309 §2.2.1): a group matches when its User-agent value is a
    case-insensitive prefix of the agent product token (specificity =
    value length) or is ``*`` (specificity 0, used only when nothing
    specific matches); all groups at the winning specificity are
    combined.  ``agent=None`` selects the ``*`` group only.  Returns
    (host, ln, val) for every non-UA line of the winning group(s);
    comments (#) and surrounding whitespace stripped."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"))
    ln = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    lines = lines.select("host", "pos", ln.alias("ln")).filter(
        F.col("ln") != "")
    low = F.lower(F.col("ln"))
    is_ua = low.startswith("user-agent:")
    val = F.trim(F.regexp_extract(F.col("ln"), r"^[^:]*:(.*)$", 1))
    w = Window.partitionBy("host").orderBy("pos")
    tagged0 = lines.select(
        "host", "pos", "ln", is_ua.alias("is_ua"), val.alias("val"))
    new_grp = (F.col("is_ua").cast("int")
               * (1 - F.lag(F.col("is_ua").cast("int"), 1, 0).over(w)))
    tagged = (tagged0.withColumn("new_grp", new_grp)
              .withColumn("gid", F.sum("new_grp").over(w)))
    # UA-line specificity: '*' → 0; prefix-of-agent → len(value).
    ml = F.when(F.col("is_ua") & (F.col("val") == "*"), F.lit(0))
    if agent is not None:
        ml = F.when(
            F.col("is_ua") & (F.col("val") != "*")
            & F.lit(agent.lower()).startswith(F.lower(F.col("val"))),
            F.length("val")).otherwise(ml)
    group_ml = F.max(ml).over(Window.partitionBy("host", "gid"))
    best = F.max(group_ml).over(Window.partitionBy("host"))
    return (tagged.withColumn("gml", group_ml).withColumn("best", best)
            .filter(F.col("gml").isNotNull()
                    & (F.col("gml") == F.col("best")) & ~F.col("is_ua"))
            .select("host", "ln", "val"))


def parse_robots(robots: DataFrame, host_col: str = "host",
                 body_col: str = "robots_txt",
                 agent: str | None = None) -> DataFrame:
    """(host, rule, path) for every Allow/Disallow in the group that
    applies to ``agent`` (group selection: `_group_lines`, RFC 9309
    §2.2.1).  ``rule`` is 'allow' | 'disallow'; empty-path rules
    (no-op per RFC) are dropped; field names case-insensitive."""
    g = _group_lines(robots, host_col, body_col, agent)
    rule = F.when(F.lower("ln").startswith("allow:"), "allow").when(
        F.lower("ln").startswith("disallow:"), "disallow")
    return (g.filter(rule.isNotNull() & (F.col("val") != ""))
            .select("host", rule.alias("rule"), F.col("val").alias("path")))


def crawl_delays(robots: DataFrame, host_col: str = "host",
                 body_col: str = "robots_txt",
                 agent: str | None = None) -> DataFrame:
    """(host, delay_s) from the agent's winning group's ``Crawl-delay``
    directives (the de-facto politeness extension every major crawler
    honors; not in RFC 9309 but in its §2.2.4 custom-rule slot).
    Non-numeric values are dropped (try_cast), multiple directives per
    host take the MAX — the conservative (most polite) reading."""
    g = _group_lines(robots, host_col, body_col, agent)
    d = (g.filter(F.lower("ln").startswith("crawl-delay:"))
         .select("host", F.col("val").try_cast("double").alias("delay_s"))
         .filter(F.col("delay_s").isNotNull() & (F.col("delay_s") >= 0)))
    return d.groupBy("host").agg(F.max("delay_s").alias("delay_s"))


def _group_lines_sql(robots_sql: str, host_col: str, body_col: str,
                     agent: str | None) -> str:
    """CTE chain mirroring `_group_lines`; exposes `ranked` with
    (host, ln, val, is_ua, gml, best)."""
    if agent is None:
        ml = "case when is_ua and val = '*' then 0 end"
    else:
        a = agent.lower().replace("'", "''")
        ml = (f"case when is_ua and val <> '*' and "
              f"starts_with('{a}', lower(val)) then length(val) "
              f"when is_ua and val = '*' then 0 end")
    return f"""
with bodies as ({robots_sql}),
rawlines as (
  select {host_col} as host,
         generate_subscripts(string_split({body_col}, chr(10)), 1) - 1
           as pos,
         unnest(string_split({body_col}, chr(10))) as raw
  from bodies
),
lines as (
  select host, pos, trim(regexp_replace(raw, '#.*$', '')) as ln
  from rawlines
  where trim(regexp_replace(raw, '#.*$', '')) <> ''
),
tagged as (
  select host, pos, ln,
         (lower(ln) like 'user-agent:%') as is_ua,
         trim(regexp_extract(ln, '^[^:]*:(.*)$', 1)) as val
  from lines
),
marked as (
  select *,
         case when is_ua and not coalesce(
                lag(is_ua) over (partition by host order by pos), false)
              then 1 else 0 end as new_grp
  from tagged
),
grouped as (
  select *,
         sum(new_grp) over (partition by host order by pos) as gid
  from marked
),
matched as (
  select *,
         max({ml}) over (partition by host, gid) as gml
  from grouped
),
ranked as (
  select *,
         max(gml) over (partition by host) as best
  from matched
)"""


def crawl_delays_sql(robots_sql: str, host_col: str = "host",
                     body_col: str = "robots_txt",
                     agent: str | None = None) -> str:
    prefix = _group_lines_sql(robots_sql, host_col, body_col, agent)
    return f"""{prefix}
select host, max(try_cast(val as double)) as delay_s
from ranked
where gml is not null and gml = best and not is_ua
  and lower(ln) like 'crawl-delay:%'
  and try_cast(val as double) >= 0
group by host
"""


def parse_robots_sql(robots_sql: str, host_col: str = "host",
                     body_col: str = "robots_txt",
                     agent: str | None = None) -> str:
    prefix = _group_lines_sql(robots_sql, host_col, body_col, agent)
    return f"""{prefix}
select host,
       case when lower(ln) like 'allow:%' then 'allow'
            else 'disallow' end as rule,
       val as path
from ranked
where gml is not null and gml = best and not is_ua and val <> ''
  and (lower(ln) like 'allow:%' or lower(ln) like 'disallow:%')
"""


# ---------------------------------------------------------------------------
# URL filter (longest-match REP decision)
# ---------------------------------------------------------------------------

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)?"


def _compile_rule_patterns(rules: DataFrame) -> DataFrame:
    """Add ``rpattern`` (anchored Java/RE2 regex for the RFC-9309 rule
    path: ``*`` → ``.*``, trailing ``$`` → end anchor, everything else
    literal) and ``has_wild`` (plain-prefix rules skip the regex
    engine entirely) to a (host, rule, path) rule table."""
    p = F.col("path")
    anchored = p.endswith("$")
    body = F.when(anchored,
                  p.substr(F.lit(1), F.length(p) - 1)).otherwise(p)
    esc = F.regexp_replace(body, r"([\\^$.|?+()\[\]{}])", r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    rx = F.concat(F.lit("^"), wild,
                  F.when(anchored, F.lit("$")).otherwise(F.lit("")))
    return (rules.withColumn("rpattern", rx)
            .withColumn("has_wild", p.contains("*") | anchored))


def robots_filter(urls: DataFrame, robots: DataFrame,
                  url_col: str = "url", agent: str | None = None,
                  broadcast_rules: bool = True) -> DataFrame:
    """(url, allowed, matched_rule, matched_path): REP decision per
    candidate URL — most-octets matching rule of the agent's group
    wins (RFC 9309 §2.2.2), Allow wins length ties, no matching rule
    (or no robots.txt for the host) allows.  Rule paths are RFC-9309
    patterns (``*`` wildcard, trailing ``$`` anchor); plain-prefix
    rules keep a startswith fast path.  The rule table (one crawl's
    hosts × a few rules) is broadcast by default, so a mega-host's
    URL concentration never skews a shuffle."""
    rules = _compile_rule_patterns(parse_robots(robots, agent=agent))
    if broadcast_rules:
        rules = F.broadcast(rules)
    u = urls.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(F.col(url_col), _HOST_RE, 1).alias("host"),
        F.coalesce(
            F.when(F.regexp_extract(F.col(url_col), _PATH_RE, 1) == "",
                   "/").otherwise(
                F.regexp_extract(F.col(url_col), _PATH_RE, 1)),
            F.lit("/")).alias("path"))
    match = F.when(rules.has_wild,
                   F.regexp_like(u.path, rules.rpattern)).otherwise(
        u.path.startswith(rules.path))
    j = u.join(rules, (u.host == rules.host) & match,
               "left").select("url", "rule", rules.path.alias("rpath"))
    w = (Window.partitionBy("url")
         .orderBy(F.length("rpath").desc(), F.col("rule").asc()))
    return (j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "url",
                (F.col("rule").isNull() | (F.col("rule") == "allow"))
                .alias("allowed"),
                F.col("rule").alias("matched_rule"),
                F.col("rpath").alias("matched_path")))


def robots_filter_sql(urls_sql: str, robots_sql: str,
                      url_col: str = "url",
                      agent: str | None = None) -> str:
    rules = parse_robots_sql(robots_sql, agent=agent)
    return f"""
with urls0 as ({urls_sql}),
rules0 as ({rules}),
rules as (
  select host, rule, path,
         '^' || regexp_replace(regexp_replace(
             case when path like '%$'
                  then substr(path, 1, length(path) - 1)
                  else path end,
             '([\\^$.|?+(){{}}\\[\\]])', '\\\\\\1', 'g'), '\\*', '.*', 'g')
             || case when path like '%$' then '$' else '' end as rpattern,
         (position('*' in path) > 0 or path like '%$') as has_wild
  from rules0
),
u as (
  select {url_col} as url,
         regexp_extract({url_col}, '{_HOST_RE}', 1) as host,
         coalesce(nullif(regexp_extract({url_col}, '{_PATH_RE}', 1), ''),
                  '/') as path
  from urls0
),
j as (
  select u.url, r.rule, r.path as rpath
  from u left join rules r
    on u.host = r.host and (case when r.has_wild
                                 then regexp_matches(u.path, r.rpattern)
                                 else starts_with(u.path, r.path) end)
),
ranked as (
  select *,
         row_number() over (partition by url
                            order by length(rpath) desc nulls last,
                                     rule asc nulls last) as rn
  from j
)
select url,
       (rule is null or rule = 'allow') as allowed,
       rule as matched_rule,
       rpath as matched_path
from ranked where rn = 1
"""


# ---------------------------------------------------------------------------
# crawl discovery: Sitemap directives + sitemap.xml <urlset> extraction
# ---------------------------------------------------------------------------

def robots_sitemaps(robots: DataFrame, host_col: str = "host",
                    body_col: str = "robots_txt") -> DataFrame:
    """(host, sitemap) per ``Sitemap:`` directive — RFC 9309 makes the
    directive group-independent, so this is a plain line scan (split →
    explode → regex), no group recovery needed."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(body_col), "\n")).alias("raw"))
    ln = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    sm = F.when(F.lower(ln).startswith("sitemap:"),
                F.trim(F.regexp_extract(ln, r"^[^:]*:(.*)$", 1)))
    return (lines.select("host", sm.alias("sitemap"))
            .filter(F.col("sitemap").isNotNull()
                    & (F.col("sitemap") != "")))


def robots_sitemaps_sql(robots_sql: str, host_col: str = "host",
                        body_col: str = "robots_txt") -> str:
    return f"""
with bodies as ({robots_sql}),
lines as (
  select {host_col} as host,
         trim(regexp_replace(unnest(string_split({body_col}, chr(10))),
                             '#.*$', '')) as ln
  from bodies
)
select host, trim(regexp_extract(ln, '^[^:]*:(.*)$', 1)) as sitemap
from lines
where lower(ln) like 'sitemap:%'
  and trim(regexp_extract(ln, '^[^:]*:(.*)$', 1)) <> ''
"""


def sitemap_entries(sitemaps: DataFrame, host_col: str = "host",
                    xml_col: str = "sitemap_xml") -> DataFrame:
    """(host, loc, lastmod) per ``<url>`` block of a sitemap.xml body —
    scan-side only: newlines flattened, ``<url>`` blocks split with one
    non-greedy regex, loc/lastmod extracted per block (lastmod null
    when absent).  Handles the urlset subset real crawl pipelines read;
    XML entities in loc are left as-is (sitemap URLs are already
    percent-encoded per the protocol)."""
    flat = F.regexp_replace(F.col(xml_col), r"[\n\r\t]", " ")
    blocks = F.regexp_extract_all(flat, F.lit(r"<url>(.*?)</url>"), 1)
    b = (sitemaps.select(F.col(host_col).alias("host"),
                         F.explode(blocks).alias("block")))
    loc = F.trim(F.regexp_extract(F.col("block"),
                                  r"<loc>(.*?)</loc>", 1))
    lastmod = F.trim(F.regexp_extract(F.col("block"),
                                      r"<lastmod>(.*?)</lastmod>", 1))
    return (b.select("host", loc.alias("loc"),
                     F.when(lastmod == "", None).otherwise(lastmod)
                     .alias("lastmod"))
            .filter(F.col("loc") != ""))


def sitemap_entries_sql(sitemaps_sql: str, host_col: str = "host",
                        xml_col: str = "sitemap_xml") -> str:
    return f"""
with bodies as ({sitemaps_sql}),
blocks as (
  select {host_col} as host,
         unnest(regexp_extract_all(
           regexp_replace({xml_col}, '[\\n\\r\\t]', ' ', 'g'),
           '<url>(.*?)</url>', 1)) as block
  from bodies
)
select host,
       trim(regexp_extract(block, '<loc>(.*?)</loc>', 1)) as loc,
       case when trim(coalesce(regexp_extract(block,
                 '<lastmod>(.*?)</lastmod>', 1), '')) = '' then null
            else trim(regexp_extract(block,
                 '<lastmod>(.*?)</lastmod>', 1))
       end as lastmod
from blocks
where trim(coalesce(regexp_extract(block, '<loc>(.*?)</loc>', 1), ''))
      <> ''
"""


def sitemap_fixture_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, sitemap_xml): a deterministic urlset per fixture host —
    every host's documents as <url> entries, every third with a
    <lastmod>, plus one malformed (locless) block per host."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    host = F.concat(F.lit("site"), (d % 97).cast("string"),
                    F.lit(".example"))
    entry = F.concat(
        F.lit("<url><loc>https://"), host, F.lit("/"), F.col("source"),
        F.lit("/p"), d.cast("string"), F.lit("</loc>"),
        F.when(d % 3 == 0, F.concat(
            F.lit("<lastmod>2024-01-"),
            F.lpad((1 + d % 28).cast("string"), 2, "0"),
            F.lit("</lastmod>"))).otherwise(F.lit("")),
        F.lit("</url>"))
    return (docs.select(host.alias("host"), entry.alias("e"))
            .groupBy("host")
            .agg(F.concat(
                F.lit('<?xml version="1.0"?>\n<urlset>\n'),
                F.array_join(F.array_sort(F.collect_list("e")), "\n"),
                F.lit("\n<url><priority>0.5</priority></url>"),
                F.lit("\n</urlset>")).alias("sitemap_xml")))


SITEMAP_FIXTURE_SQL = """
select host,
       '<?xml version="1.0"?>' || chr(10) || '<urlset>' || chr(10) ||
       string_agg(e, chr(10) order by e) ||
       chr(10) || '<url><priority>0.5</priority></url>' ||
       chr(10) || '</urlset>' as sitemap_xml
from (
  select 'site' || (doc_id % 97) || '.example' as host,
         '<url><loc>https://site' || (doc_id % 97) || '.example/'
           || source || '/p' || doc_id || '</loc>'
           || (case when doc_id % 3 = 0
                    then '<lastmod>2024-01-'
                         || lpad((1 + doc_id % 28)::varchar, 2, '0')
                         || '</lastmod>'
                    else '' end)
           || '</url>' as e
  from documents
)
group by host
"""


def sitemap_index(sitemaps: DataFrame, host_col: str = "host",
                  xml_col: str = "sitemap_xml") -> DataFrame:
    """(host, child, lastmod) per ``<sitemap>`` block of a
    ``<sitemapindex>`` body — the protocol's mandatory split once a
    sitemap exceeds 50k URLs / 50 MB, so large sites are ALWAYS behind
    one of these.  Same scan-side shape as :func:`sitemap_entries`
    (flatten newlines, non-greedy block split, loc/lastmod per block);
    one resolution level per call — the frontier loop feeds the child
    urls back through fetch + :func:`sitemap_entries`, which is how a
    real crawler bounds recursion depth."""
    flat = F.regexp_replace(F.col(xml_col), r"[\n\r\t]", " ")
    blocks = F.regexp_extract_all(flat, F.lit(r"<sitemap>(.*?)</sitemap>"), 1)
    b = (sitemaps.select(F.col(host_col).alias("host"),
                         F.explode(blocks).alias("block")))
    loc = F.trim(F.regexp_extract(F.col("block"), r"<loc>(.*?)</loc>", 1))
    lastmod = F.trim(F.regexp_extract(F.col("block"),
                                      r"<lastmod>(.*?)</lastmod>", 1))
    return (b.select("host", loc.alias("child"),
                     F.when(lastmod == "", None).otherwise(lastmod)
                     .alias("lastmod"))
            .filter(F.col("child") != ""))


def sitemap_index_sql(sitemaps_sql: str, host_col: str = "host",
                      xml_col: str = "sitemap_xml") -> str:
    return f"""
with bodies as ({sitemaps_sql}),
blocks as (
  select {host_col} as host,
         unnest(regexp_extract_all(
           regexp_replace({xml_col}, '[\\n\\r\\t]', ' ', 'g'),
           '<sitemap>(.*?)</sitemap>', 1)) as block
  from bodies
)
select host,
       trim(regexp_extract(block, '<loc>(.*?)</loc>', 1)) as child,
       case when trim(coalesce(regexp_extract(block,
                 '<lastmod>(.*?)</lastmod>', 1), '')) = '' then null
            else trim(regexp_extract(block,
                 '<lastmod>(.*?)</lastmod>', 1))
       end as lastmod
from blocks
where trim(coalesce(regexp_extract(block, '<loc>(.*?)</loc>', 1), ''))
      <> ''
"""


def sitemap_index_fixture_df(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """(host, sitemap_xml): a deterministic <sitemapindex> per host —
    1 + host_id % 4 child sitemaps, every second with a <lastmod>,
    plus one malformed (locless) block per host."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    hosts = (docs.select((d % 97).alias("h")).distinct())
    children = F.transform(
        F.sequence(F.lit(0), F.pmod(F.col("h"), F.lit(4))),
        lambda i: F.concat(
            F.lit("<sitemap><loc>https://site"), F.col("h").cast("string"),
            F.lit(".example/sitemap-"), i.cast("string"),
            F.lit(".xml</loc>"),
            F.when(i % 2 == 0, F.concat(
                F.lit("<lastmod>2024-02-"),
                F.lpad((1 + i).cast("string"), 2, "0"),
                F.lit("</lastmod>"))).otherwise(F.lit("")),
            F.lit("</sitemap>")))
    return hosts.select(
        F.concat(F.lit("site"), F.col("h").cast("string"),
                 F.lit(".example")).alias("host"),
        F.concat(F.lit('<?xml version="1.0"?>\n<sitemapindex>\n'),
                 F.array_join(children, "\n"),
                 F.lit("\n<sitemap><lastmod>2024-02-01</lastmod>"
                       "</sitemap>\n</sitemapindex>"))
        .alias("sitemap_xml"))


SITEMAP_INDEX_FIXTURE_SQL = """
select 'site' || h::varchar || '.example' as host,
       '<?xml version="1.0"?>' || chr(10) || '<sitemapindex>' || chr(10) ||
       array_to_string(list_transform(range(0, (h % 4) + 1), i ->
         '<sitemap><loc>https://site' || h::varchar || '.example/sitemap-'
         || i::varchar || '.xml</loc>'
         || (case when i % 2 = 0
                  then '<lastmod>2024-02-' || lpad((1 + i)::varchar, 2, '0')
                       || '</lastmod>' else '' end)
         || '</sitemap>'), chr(10)) ||
       chr(10) || '<sitemap><lastmod>2024-02-01</lastmod></sitemap>' ||
       chr(10) || '</sitemapindex>' as sitemap_xml
from (select distinct doc_id % 97 as h from documents)
"""


# ---------------------------------------------------------------------------
# Indexability gate: REP × meta robots × X-Robots-Tag
# ---------------------------------------------------------------------------

# any X-Robots-Tag header carrying noindex/none (RFC 9309's §2.2.4
# custom-rule slot hosts the REP side; the header form is Google's
# documented X-Robots-Tag extension — the third, header-level channel
# beside robots.txt and <meta name=robots>)
_XROBOTS_NOINDEX_RE = (r"(?i)(?:^|\n)x-robots-tag:[^\r\n]*"
                       r"\b(?:noindex|none)\b")


def x_robots_noindex(headers: "Column"):
    """Boolean Column: any X-Robots-Tag header in the raw response
    block carries ``noindex``/``none``."""
    return headers.rlike(_XROBOTS_NOINDEX_RE)


def index_gate(directives: DataFrame, responses: DataFrame,
               rep: DataFrame, headers_col: str = "headers"
               ) -> DataFrame:
    """May this page enter the corpus at all?  The three exclusion
    channels a compliant pipeline must honor, combined per url:

    * ``robots.txt`` (the REP decision — :func:`robots_filter`'s
      ``allowed``; absent url → allowed, REP is opt-out);
    * ``<meta name=robots>`` ``noindex`` (kernel-parsed —
      :func:`lexor_spark.graph.extract_directives`);
    * the ``X-Robots-Tag`` response header (``noindex``/``none``).

    Output: (url, allowed, meta_noindex, header_noindex, indexable,
    reason) with ``reason`` naming the FIRST blocking channel in
    precedence order robots_txt → meta_robots → x_robots_tag (a
    disallowed fetch never sees the page's own directives).

    Plan at scale: two url-keyed left joins onto the directives table
    (all three inputs are one-row-per-url projections of scans that
    already exist in the pipeline); everything else is scan-side
    boolean logic."""
    xr = responses.select(
        F.col("url"),
        x_robots_noindex(F.col(headers_col)).alias("header_noindex"))
    base = directives.select(
        "url", F.col("noindex").alias("meta_noindex"))
    j = (base.join(xr, "url", "left")
         .join(rep.select("url", "allowed"), "url", "left"))
    allowed = F.coalesce(F.col("allowed"), F.lit(True))
    meta_noindex = F.coalesce(F.col("meta_noindex"), F.lit(False))
    header_noindex = F.coalesce(F.col("header_noindex"), F.lit(False))
    reason = (F.when(~allowed, "robots_txt")
              .when(meta_noindex, "meta_robots")
              .when(header_noindex, "x_robots_tag")
              .otherwise("indexable"))
    return j.select(
        "url", allowed.alias("allowed"),
        meta_noindex.alias("meta_noindex"),
        header_noindex.alias("header_noindex"),
        (allowed & ~meta_noindex & ~header_noindex).alias("indexable"),
        reason.alias("reason"),
    ).orderBy("url")


def index_gate_sql(directives_sql: str, responses_sql: str,
                   rep_sql: str, headers_col: str = "headers") -> str:
    """DuckDB mirror of :func:`index_gate`."""
    return f"""
with ig_dir as ({directives_sql}),
ig_resp as ({responses_sql}),
ig_rep as ({rep_sql}),
xr as (
  select url, regexp_matches({headers_col},
      '{_XROBOTS_NOINDEX_RE}') as header_noindex
  from ig_resp
),
j as (
  select d.url,
         coalesce(r.allowed, true) as allowed,
         coalesce(d.noindex, false) as meta_noindex,
         coalesce(xr.header_noindex, false) as header_noindex
  from ig_dir d
  left join xr using (url)
  left join ig_rep r using (url)
)
select url, allowed, meta_noindex, header_noindex,
       (allowed and not meta_noindex and not header_noindex)
         as indexable,
       case when not allowed then 'robots_txt'
            when meta_noindex then 'meta_robots'
            when header_noindex then 'x_robots_tag'
            else 'indexable' end as reason
from j order by url
"""
