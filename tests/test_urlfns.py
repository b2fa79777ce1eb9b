

def test_surt_key_canonical_examples(spark):
    from lexor_spark.urlfns import surt_keys
    rows = [
        ("https://WWW.Example.com/A/b?z=1&a=2#f",),
        ("http://sub.news.example.co.uk/x",),
        ("http://example.com:8080/x",),
        ("https://example.com:443/y",),
        ("http://user:pw@example.com/z",),
        ("http://example.com",),
        ("not a url",),
        ("http://example.com/s?utm=1&q=2&",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {r.url: r.urlkey for r in surt_keys(df).collect()}
    assert got["https://WWW.Example.com/A/b?z=1&a=2#f"] == \
        "com,example)/a/b?a=2&z=1"
    assert got["http://sub.news.example.co.uk/x"] == \
        "uk,co,example,news,sub)/x"
    assert got["http://example.com:8080/x"] == "com,example:8080)/x"
    assert got["https://example.com:443/y"] == "com,example)/y"
    # userinfo is not part of the key
    assert got["http://user:pw@example.com/z"] == "com,example)/z"
    assert got["http://example.com"] == "com,example)/"
    assert got["not a url"] is None
    assert got["http://example.com/s?utm=1&q=2&"] == \
        "com,example)/s?q=2&utm=1"


def test_surt_keys_make_site_pages_adjacent(spark):
    # the property the key exists for: all of a site's pages (and its
    # subdomains') sort together
    from lexor_spark.urlfns import surt_keys
    df = spark.createDataFrame([
        ("http://a.example.com/1",), ("http://example.com/2",),
        ("http://zoo.org/x",), ("http://b.example.com/3",),
    ], "url string")
    keys = sorted(r.urlkey for r in surt_keys(df).collect())
    assert keys == ["com,example)/2", "com,example,a)/1",
                    "com,example,b)/3", "org,zoo)/x"]
