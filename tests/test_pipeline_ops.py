"""Training-pipeline operators added in round 2: Gopher-style repetition
filters, URL/domain hygiene layer, benchmark decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from lexor_spark import dedup, textfns, urlfns


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])


# -- repetition filters -------------------------------------------------------

def test_dup_line_fractions(spark):
    texts = [
        "a\nb\nc",              # no dups
        "x\nx\nx\ny",           # 2 of 4 lines are repeats
        "",                     # empty
        "  \n \n",              # whitespace only
    ]
    rows = (_docs(spark, texts)
            .select("doc_id",
                    textfns.dup_line_fraction(F.col("text")).alias("f"),
                    textfns.dup_line_char_fraction(F.col("text")).alias("cf"))
            .orderBy("doc_id").collect())
    assert rows[0].f == 0.0 and rows[0].cf == 0.0
    assert rows[1].f == 0.5          # 4 lines, 2 distinct
    assert rows[1].cf == 0.5         # 4 chars, 2 duplicate chars
    assert rows[2].f == 0.0 and rows[2].cf == 0.0
    assert rows[3].f == 0.0 and rows[3].cf == 0.0


def test_top_bigram_fraction(spark):
    texts = [
        "the cat the cat the cat",   # 'the cat' 3 of 5 bigrams
        "all words are different here",
        "one",                       # < 2 words -> 0
    ]
    rows = (_docs(spark, texts)
            .select("doc_id",
                    textfns.top_bigram_fraction(F.col("text")).alias("f"))
            .orderBy("doc_id").collect())
    assert rows[0].f == 0.6
    assert rows[1].f == 0.25
    assert rows[2].f == 0.0


# -- URL layer ---------------------------------------------------------------

def test_url_parts(spark):
    urls = [
        "https://user@Sub.Example.COM:8443/a/b/c?q=1#frag",
        "http://example.org",
        "not a url",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(
        urlfns.host_of(F.col("url")).alias("h"),
        urlfns.domain_of(F.col("url")).alias("d"),
        urlfns.path_depth(F.col("url")).alias("pd"),
        urlfns.is_https(F.col("url")).alias("s"),
    ).collect()
    assert rows[0].h == "sub.example.com" and rows[0].d == "example.com"
    assert rows[0].pd == 3 and rows[0].s is True
    assert rows[1].h == "example.org" and rows[1].pd == 0 and rows[1].s is False
    assert rows[2].h == "" and rows[2].d == ""


def test_domain_cap(spark):
    urls = [f"https://d{i % 2}.com/p{i}" for i in range(10)]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = urlfns.domain_cap(df, k=3).collect()
    by_dom: dict = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r)
    assert set(by_dom) == {"d0.com", "d1.com"}
    for rows in by_dom.values():
        assert len(rows) == 3
        assert sorted(r.rn for r in rows) == [1, 2, 3]
        # deterministic: lexicographically first urls survive
        assert [r.url for r in sorted(rows, key=lambda r: r.rn)] == \
            sorted(r.url for r in rows)


# -- decontamination -----------------------------------------------------------

def test_decontam_overlap(spark):
    evals = _docs(spark, ["the quick brown fox jumps over the lazy dog"])
    train = spark.createDataFrame(
        [(10, "he said the quick brown fox jumps high today"),
         (11, "completely unrelated text about spark plans")],
        ["doc_id", "text"])
    out = dedup.decontam_overlap(train, evals, n=4, min_shared=1).collect()
    got = {(r.train_id, r.eval_id): r.n_shared for r in out}
    assert (10, 0) in got and got[(10, 0)] >= 2  # shares 4-gram windows
    assert (11, 0) not in got


def test_url_filter_blocklist_and_keywords(spark):
    from lexor_spark import urlfns

    urls = ["https://good.example/a",
            "https://casino.example/win",          # keyword 1.0
            "https://bad.example/x",               # blocked domain
            "https://ok.example/download/free"]    # 0.5+0.5 = 1.0
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = urlfns.url_filter(
        df, blocked_domains=["bad.example"],
        keyword_weights={"casino": 1.0, "download": 0.5, "free": 0.5},
        threshold=1.0)
    rows = {r.url: r.url_score for r in out.collect()}
    assert set(rows) == {"https://good.example/a"}
    assert rows["https://good.example/a"] == 0.0


def test_domain_cap_two_phase_equals_single_window(spark):
    """Skewed input (one mega-domain): the two-phase salted cap must
    return exactly the single-window result — the k lexicographically
    smallest urls per domain with their global ranks."""
    urls = ([f"https://mega.com/p{i:05d}" for i in range(2000)]
            + [f"https://tiny{i}.org/x" for i in range(5)])
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = sorted((r.domain, r.url, r.rn)
                 for r in urlfns.domain_cap(df, k=4).collect())
    naive = sorted((r.domain, r.url, r.rn)
                   for r in urlfns.domain_cap(df, k=4,
                                              salt_buckets=1).collect())
    assert got == naive
    mega = [t for t in got if t[0] == "mega.com"]
    assert [t[1] for t in mega] == sorted(
        f"https://mega.com/p{i:05d}" for i in range(4))
    assert [t[2] for t in mega] == [1, 2, 3, 4]


def test_url_canonicalize_rules(spark):
    """Each canonicalization rule on a crafted url, plus pass-through
    for relative references."""
    cases = {
        # case + default port + tracking + sort + fragment, all at once
        "HTTP://Site.Com:80/A/b?z=1&utm_source=x&a=2#frag":
            "http://site.com/A/b?a=2&z=1",
        # https default port; params already canonical
        "https://example.org:443/p?a=1&b=2": "https://example.org/p?a=1&b=2",
        # non-default port survives; path case preserved
        "https://example.org:8443/Path": "https://example.org:8443/Path",
        # empty path → '/'
        "https://example.org": "https://example.org/",
        # all params tracking → no '?'
        "https://example.org/p?gclid=x&fbclid=y&ref=z": "https://example.org/p",
        # 'ref' strips only as a whole param name ('refresh' survives)
        "https://example.org/p?refresh=1": "https://example.org/p?refresh=1",
        # not absolute: untouched
        "/relative/path?utm_source=x": "/relative/path?utm_source=x",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {r.url: r.canon_url
           for r in urlfns.url_canonicalize(df).collect()}
    assert got == cases


def test_host_quality_and_filter(spark):
    """Host-level aggregates + verdict, and the row-level filter-back:
    host a (3 long docs) kept; host b (2 short) fails avg_chars; host c
    (1 long doc) fails min_docs."""
    rows = [
        (0, "https://a.example/p0", "en", 400),
        (1, "https://a.example/p1", "de", 200),
        (2, "https://a.example/p2", "en", 300),
        (3, "https://b.example/p3", "en", 50),
        (4, "https://b.example/p4", "en", 60),
        (5, "https://c.example/p5", "fr", 999),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, lang string, n_chars long")
    hq = {r.host: r for r in urlfns.host_quality(
        df, min_docs=2, min_avg_chars=100.0).collect()}
    assert hq["a.example"].n_docs == 3
    assert hq["a.example"].n_langs == 2
    assert hq["a.example"].avg_chars == 300.0
    assert hq["a.example"].total_chars == 900
    assert hq["a.example"].kept is True
    assert hq["b.example"].kept is False      # avg 55 < 100
    assert hq["c.example"].kept is False      # 1 doc < min_docs
    kept = urlfns.host_filter_docs(df, min_docs=2,
                                   min_avg_chars=100.0).collect()
    assert [(r.doc_id, r.host) for r in kept] == [
        (0, "a.example"), (1, "a.example"), (2, "a.example")]


# -- Gopher rule set (Rae et al. 2021 Table A1) -------------------------------

def test_gopher_signals_values(spark):
    good = ("The quick brown fox jumps over the lazy dog and then "
            "returns home to rest with a friend that it met. ") * 4
    bullets = "• one\n• two\n• three\n• four"
    dots = "read...\nmore...\nstill...\nhere"
    symbols = "# # # # tag"
    df = _docs(spark, [good, bullets, dots, symbols])
    sigs = textfns.gopher_signals(F.col("text"))
    rows = (df.select("doc_id", *[v.alias(k) for k, v in sigs.items()])
            .orderBy("doc_id").collect())
    g = rows[0]
    assert 50 <= g.n_words <= 100_000
    assert 3.0 <= g.mean_word_len <= 10.0
    assert g.symbol_ratio == 0.0
    assert g.bullet_frac == 0.0 and g.ellipsis_frac == 0.0
    assert g.alpha_word_frac == 1.0
    assert g.n_stop >= 2           # the/and/to/that/with all present
    b = rows[1]
    assert b.bullet_frac == 1.0    # every line starts with a bullet
    d = rows[2]
    assert d.ellipsis_frac == 0.75  # 3 of 4 lines end with ...
    s = rows[3]
    assert s.symbol_ratio == 0.8   # 4 '#' over 5 words
    assert s.n_stop == 0


def test_gopher_keep_verdict(spark):
    good = ("The quick brown fox jumps over the lazy dog and then "
            "returns home to rest with a friend that it met. ") * 4
    short = "too short to keep"
    df = _docs(spark, [good, short])
    sigs = textfns.gopher_signals(F.col("text"))
    kept = F.expr(" and ".join(p for _, p in textfns.GOPHER_KEEP_RULE))
    rows = (df.select("doc_id", *[v.alias(k) for k, v in sigs.items()])
            .withColumn("kept", kept).orderBy("doc_id").collect())
    assert rows[0].kept is True
    assert rows[1].kept is False   # fails the 50-word floor


def test_lm_buckets_thirds_and_score_order(spark):
    """9 en docs with distinct scores split exactly 3/3/3; every head
    score >= every middle score >= every tail score; ties by VALUE land
    in one bucket (the single de doc is its own head)."""
    from lexor_spark.lm import lm_buckets
    texts = ["aaaa bbbb", "the cat sat", "the the the", "zz qq xx",
             "hello world", "the dog ran", "mmmm nnnn", "prose like text",
             "common words here"]
    rows = ([(i, t, "en") for i, t in enumerate(texts)]
            + [(99, "der hund", "de")])
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = lm_buckets(docs).collect()
    en = [r for r in out if r.lang == "en"]
    by_bucket = {b: [r.lm_score for r in en if r.bucket == b]
                 for b in ("head", "middle", "tail")}
    sizes = {b: len(v) for b, v in by_bucket.items()}
    assert sum(sizes.values()) == 9
    assert sizes["head"] >= 3 and sizes["head"] + sizes["middle"] >= 6
    if by_bucket["middle"]:
        assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    if by_bucket["tail"]:
        assert min(by_bucket["middle"] or by_bucket["head"]) >= max(
            by_bucket["tail"])
    de = [r for r in out if r.lang == "de"]
    assert len(de) == 1 and de[0].bucket == "head"
    assert out == lm_buckets(docs).collect()


# -- host-level boilerplate line removal --------------------------------------

def _site_docs(spark):
    rows = []
    for i in range(6):
        host = "a.example" if i < 4 else "b.example"
        text = (f"Home | About\nunique {i}\n"
                f"(c) {host}")
        rows.append((i, f"https://{host}/p{i}", text))
    rows.append((9, "https://c.example/x", "Home | About\nlone page"))
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_host_boilerplate_strips_site_template(spark):
    out = {r.doc_id: r for r in
           dedup.host_boilerplate(_site_docs(spark), min_pages=3,
                                  max_frac=0.5).collect()}
    # a.example (4 pages): nav + footer on all pages -> stripped
    assert out[0].n_lines == 3 and out[0].n_boiler == 2
    assert out[0].text_clean == "unique 0"
    # b.example (2 pages): below min_pages -> nothing stripped
    assert out[4].n_boiler == 0
    assert out[4].text_clean.count("\n") == 2
    # single-page host: untouched even though its nav line is shared
    # corpus-wide (the rule is host-conditional, not global)
    assert out[9].n_boiler == 0 and "Home | About" in out[9].text_clean


def test_host_boilerplate_frac_threshold(spark):
    # line on 3 of 6 pages of one host: passes min_pages but sits at
    # exactly the 0.5 fraction boundary (>=) -> boilerplate
    rows = [(i, "https://h.example/p%d" % i,
             ("promo line\n" if i < 3 else "") + f"content {i}")
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = {r.doc_id: r for r in
           dedup.host_boilerplate(df, min_pages=3, max_frac=0.5).collect()}
    assert out[0].text_clean == "content 0" and out[0].n_boiler == 1
    assert out[5].n_boiler == 0


def test_host_boilerplate_empty_doc_survives(spark):
    df = spark.createDataFrame(
        [(0, "https://e.example/a", ""), (1, "https://e.example/b", "  \n ")],
        "doc_id long, url string, text string")
    out = {r.doc_id: r for r in dedup.host_boilerplate(df).collect()}
    assert len(out) == 2
    assert out[0].n_lines == 0 and out[0].text_clean == ""
    assert out[1].n_lines == 0 and out[1].text_clean == ""


# -- unicode-script profiling -------------------------------------------------

def test_script_profile_dominant_and_fracs(spark):
    texts = [
        "plain english text",
        "Привет мир как дела сегодня",
        "你好世界欢迎光临",
        "mixed Привет text here",     # latin letters outnumber cyrillic
        "12345 ... !!!",              # no script chars at all
    ]
    sigs = textfns.script_profile(F.col("text"))
    rows = (_docs(spark, texts)
            .select("doc_id", *[v.alias(k) for k, v in sigs.items()])
            .orderBy("doc_id").collect())
    assert rows[0].script == "latin" and rows[0].latin_frac == 1.0
    assert rows[1].script == "cyrillic" and rows[1].cyrillic_frac == 1.0
    assert rows[2].script == "cjk" and rows[2].cjk_frac == 1.0
    assert rows[3].script == "latin"
    assert 0.0 < rows[3].cyrillic_frac < 0.5
    assert rows[4].script == "und" and rows[4].n_script_chars == 0


def test_script_profile_tie_breaks_by_range_order(spark):
    # one latin + one cyrillic letter: tie -> first dict entry wins
    rows = (_docs(spark, ["aб"])
            .select(*[v.alias(k) for k, v in
                      textfns.script_profile(F.col("text")).items()])
            .collect())
    assert rows[0].script == "latin"
    assert rows[0].latin_frac == 0.5 and rows[0].cyrillic_frac == 0.5
