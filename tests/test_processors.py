"""Ingest-processor unit tests (pipeline composition + each processor)."""

import pandas as pd
import pytest

from raydex.ops.processors import PROCESSORS, compile_pipeline


def _b(**cols):
    return pd.DataFrame(cols)


def test_basic_string_processors():
    run = compile_pipeline(
        [
            ("lowercase", {"field": "a", "target": "lo"}),
            ("uppercase", {"field": "a", "target": "up"}),
            ("trim", {"field": "b"}),
            ("gsub", {"field": "a", "pattern": "o+", "replacement": "0"}),
        ]
    )
    out = run(_b(a=["FoO", "boo"], b=[" x ", "y"]))
    assert out["lo"].tolist() == ["foo", "boo"]
    assert out["up"].tolist() == ["FOO", "BOO"]
    assert out["b"].tolist() == ["x", "y"]
    assert out["a"].tolist() == ["F0O", "b0"]  # gsub ran on original case


def test_split_join_convert_set_remove_rename():
    run = compile_pipeline(
        [
            ("split", {"field": "csv", "separator": ",", "target": "parts"}),
            ("join", {"field": "parts", "separator": "-", "target": "joined"}),
            ("convert", {"field": "n", "type": "integer"}),
            ("set", {"field": "const", "value": 7}),
            ("rename", {"field": "n", "target": "num"}),
        ]
    )
    out = run(_b(csv=["a,b,c"], n=["42"]))
    assert out["parts"].iloc[0] == ["a", "b", "c"]
    assert out["joined"].iloc[0] == "a-b-c"
    assert out["num"].iloc[0] == 42 and out["const"].iloc[0] == 7


def test_fingerprint_json_kv_urldecode_uri():
    run = compile_pipeline(
        [
            ("fingerprint", {"fields": ["x", "y"], "target": "fp"}),
            ("json", {"field": "j", "key": "k", "target": "kv_j"}),
            ("kv", {"field": "pairs", "field_split": "&", "value_split": "=", "target": "kvmap"}),
            ("urldecode", {"field": "u"}),
            ("uri_parts", {"field": "uri"}),
        ]
    )
    out = run(
        _b(
            x=["a"], y=["b"], j=['{"k": 5}'], pairs=["p=1&q=2"],
            u=["a%20b"], uri=["https://h.example/p?x=1"],
        )
    )
    import hashlib

    assert out["fp"].iloc[0] == hashlib.md5(b"a|b").hexdigest()
    assert out["kv_j"].iloc[0] == "5"
    assert out["kvmap"].iloc[0] == {"p": "1", "q": "2"}
    assert out["u"].iloc[0] == "a b"
    assert out["uri_host"].iloc[0] == "h.example" and out["uri_path"].iloc[0] == "/p"


def test_csv_dissect_grok():
    out = PROCESSORS["csv"](_b(line=['x,"y,z",3']), "line", ["c1", "c2", "c3"])
    assert out["c2"].iloc[0] == "y,z" and out["c3"].iloc[0] == "3"
    out = PROCESSORS["dissect"](
        _b(log=["1.2.3.4 - alice [2024]"]), "log", "%{ip} - %{user} [%{year}]"
    )
    assert out["user"].iloc[0] == "alice" and out["year"].iloc[0] == "2024"
    out = PROCESSORS["grok"](
        _b(log=["status=200 bytes=512"]), "log",
        "status=%{INT:status} bytes=%{INT:bytes}",
    )
    assert out["status"].iloc[0] == "200" and out["bytes"].iloc[0] == "512"


def test_foreach_enrich_drop_bytes_date_append():
    out = PROCESSORS["foreach"](
        _b(tags=[["A", "B"], ["C"]]), "tags", "lowercase"
    )
    assert out["tags"].tolist() == [["a", "b"], ["c"]]
    out = PROCESSORS["enrich"](
        _b(code=["us", "de", "xx"]), "code", {"us": "США", "de": "Germany"}, "country"
    )
    assert out["country"].tolist()[1] == "Germany" and out["country"].iloc[2] is None
    out = PROCESSORS["drop"](_b(v=[1, 5, 2]), lambda b: b["v"] > 2)
    assert out["v"].tolist() == [1, 2]
    out = PROCESSORS["bytes"](_b(sz=["1kb", "2mb", "7"]), "sz")
    assert out["sz"].tolist() == [1024, 2 * 1024**2, 7]
    out = PROCESSORS["append"](_b(xs=[["a"]]), "xs", "z")
    assert out["xs"].iloc[0] == ["a", "z"]
    out = PROCESSORS["date"](_b(ts=[0]), "ts", unit="s")
    assert str(out["ts"].iloc[0]).startswith("1970-01-01")


def test_apply_pipeline_on_dataset(ray_session, sf_dir):
    import ray.data as rd

    from raydex.ops.processors import apply_pipeline

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    out = apply_pipeline(ds, [("uppercase", {"field": "source"})]).to_pandas()
    assert out["source"].str.isupper().all()


def test_sort_fail_dot_expander():
    from raydex.ops.processors import IngestFailure

    out = PROCESSORS["sort"](_b(xs=[[3, 1, 2]]), "xs")
    assert out["xs"].iloc[0] == [1, 2, 3]
    out = PROCESSORS["sort"](_b(xs=[["a", "c", "b"]]), "xs", order="desc")
    assert out["xs"].iloc[0] == ["c", "b", "a"]
    with pytest.raises(IngestFailure, match="boom"):
        PROCESSORS["fail"](_b(v=[1]), "boom")
    # conditional fail: no matching row -> passes through
    out = PROCESSORS["fail"](_b(v=[1, 2]), "boom", predicate=lambda b: b["v"] > 5)
    assert out["v"].tolist() == [1, 2]
    out = PROCESSORS["dot_expander"](_b(**{"a.b": [1, 2]}), "a.b")
    assert out["a"].tolist() == [{"b": 1}, {"b": 2}]
    b = _b(**{"a": [{"x": 0}], "a.b.c": [9]})
    out = PROCESSORS["dot_expander"](b, "a.b.c")
    assert out["a"].iloc[0] == {"x": 0, "b": {"c": 9}}


def test_date_index_name():
    out = PROCESSORS["date_index_name"](
        _b(ts=["2026-08-17T10:30:00"]), "ts",
        date_rounding="M", index_name_prefix="logs-",
    )
    assert out["_index"].iloc[0] == "logs-2026-08"
    out = PROCESSORS["date_index_name"](_b(ts=["2026-08-17T10:30:00"]), "ts",
                                        date_rounding="d")
    assert out["_index"].iloc[0] == "2026-08-17"


def test_registered_domain():
    out = PROCESSORS["registered_domain"](
        _b(host=["www.example.co.uk", "example.com", "localhost"]), "host"
    )
    assert out["registered_domain"].tolist()[:2] == ["example.co.uk", "example.com"]
    assert out["top_level_domain"].tolist()[:2] == ["co.uk", "com"]
    assert out["subdomain"].tolist()[0] == "www" and out["subdomain"].iloc[1] is None
    assert out["registered_domain"].iloc[2] is None


def test_community_id_and_network_direction():
    # known vector from the community-id spec test set:
    # 1.2.3.4:1122 -> 5.6.7.8:3344 tcp -> 1:wCb3OG7yAFWelaUydu0D+125CLM=
    out = PROCESSORS["community_id"](
        _b(source_ip=["1.2.3.4"], source_port=[1122],
           dest_ip=["5.6.7.8"], dest_port=[3344], transport=[6]),
    )
    assert out["community_id"].iloc[0] == "1:wCb3OG7yAFWelaUydu0D+125CLM="
    # symmetric: reversed direction hashes identically
    rev = PROCESSORS["community_id"](
        _b(source_ip=["5.6.7.8"], source_port=[3344],
           dest_ip=["1.2.3.4"], dest_port=[1122], transport=[6]),
    )
    assert rev["community_id"].iloc[0] == out["community_id"].iloc[0]
    out = PROCESSORS["network_direction"](
        _b(source_ip=["10.0.0.1", "8.8.8.8", "10.0.0.1", "1.1.1.1"],
           dest_ip=["10.0.0.2", "10.0.0.2", "8.8.8.8", "8.8.4.4"]),
    )
    assert out["network_direction"].tolist() == [
        "internal", "inbound", "outbound", "external"
    ]


def test_graph_token_filters():
    from raydex.analysis.extra_filters import (
        multiplexer_filter,
        synonym_graph_filter,
        word_delimiter_graph_filter,
    )

    syn = synonym_graph_filter(["sea biscuit, seabiscuit", "usa => united states"])
    assert syn(["i", "saw", "sea", "biscuit"]) == [
        "i", "saw", "sea", "biscuit", "seabiscuit"
    ]
    assert syn(["made", "in", "usa"]) == ["made", "in", "united", "states"]
    # contract mode replaces with the first alternative
    syn2 = synonym_graph_filter(["sea biscuit, seabiscuit"], expand=False)
    assert syn2(["sea", "biscuit", "won"]) == ["sea", "biscuit", "won"][:3]

    wdg = word_delimiter_graph_filter()
    assert wdg(["PowerShot500-B"]) == ["Power", "Shot", "500", "B"]
    wdg_cat = word_delimiter_graph_filter(catenate_all=True, preserve_original=True)
    assert wdg_cat(["Wi-Fi"]) == ["Wi-Fi", "Wi", "Fi", "WiFi"]

    mux = multiplexer_filter([
        lambda ts: ts,                       # identity path
        lambda ts: [t.upper() for t in ts],  # uppercase path
    ])
    assert mux(["ab", "cd"]) == ["ab", "AB", "cd", "CD"]


def test_simulate_pipeline_and_on_failure():
    """`_ingest/pipeline/_simulate` (plain + verbose trace) and the
    pipeline-level on_failure handler with failure metadata columns."""
    from raydex.ops.processors import simulate_pipeline, compile_pipeline
    import pandas as pd

    docs = [{"msg": "  Hello World  ", "n": "7"}]
    steps = [("trim", {"field": "msg"}),
             ("lowercase", {"field": "msg"}),
             ("convert", {"field": "n", "type": "integer"})]
    out = simulate_pipeline(steps, docs)
    assert out[0]["msg"] == "hello world" and out[0]["n"] == 7
    trace = simulate_pipeline(steps, docs, verbose=True)
    assert [t["processor_type"] for t in trace] == ["trim", "lowercase", "convert"]
    assert all(t["status"] == "success" for t in trace)
    assert trace[0]["docs"][0]["msg"] == "Hello World"  # trimmed only

    # failing processor: verbose trace stops with error status
    bad = [("fail", {"message": "boom"})]
    tr = simulate_pipeline(bad, docs, verbose=True)
    assert tr[0]["status"] == "error" and "boom" in tr[0]["error"]

    # on_failure handler: original batch + failure metadata columns
    run = compile_pipeline(
        [("lowercase", {"field": "msg"}), ("fail", {"message": "boom"})],
        on_failure=[("set", {"field": "failed", "value": "yes"})],
    )
    res = run(pd.DataFrame(docs))
    assert list(res["failed"]) == ["yes"]
    assert res["_ingest.on_failure_processor_type"].iloc[0] == "fail"
    assert "boom" in res["_ingest.on_failure_message"].iloc[0]
    assert res["msg"].iloc[0] == "  Hello World  "  # original state


def test_arrow_tier_parity():
    """Every ARROW_PROCESSORS kernel must agree with its pandas twin."""
    import pyarrow as pa

    from raydex.ops.processors import (ARROW_PROCESSORS,
                                       compile_pipeline_arrow)

    t = pa.table({
        "s": ["  Hello World ", "FOO src bar", None],
        "lang": ["en", "de", "fr"],
        "n": [1, 2, 3],
        "lst": [["b", "a"], ["x"], []],
        "sz": ["12kb", " 3.5 MB ", "7"],
        "ts": [1700000000000, 1700003600000, 1700007200000],
        "url": ["https://a.b/c/d?x=1", "http://e.f/g", "no-scheme/path"],
        "enc": ["a%20b", "plain", "%2Fx"],
        "log": ["GET /x 200", "POST /y 404", "nope"],
    })
    steps = [
        ("lowercase", {"field": "s", "target": "lo"}),
        ("trim", {"field": "s", "target": "tr"}),
        ("gsub", {"field": "s", "pattern": "src", "replacement": "S_", "target": "g"}),
        ("split", {"field": "s", "separator": " ", "target": "sp"}),
        ("fingerprint", {"fields": ["lang", "sz"], "target": "fp"}),
        ("bytes", {"field": "sz", "target": "bz"}),
        ("date", {"field": "ts", "target": "dt", "unit": "ms"}),
        ("uri_parts", {"field": "url"}),
        ("urldecode", {"field": "enc", "target": "dec"}),
        ("date_index_name", {"field": "dt", "date_rounding": "M",
                             "index_name_prefix": "logs-"}),
        ("append", {"field": "lst", "value": "z"}),
        ("join", {"field": "lst", "separator": ",", "target": "j"}),
        ("convert", {"field": "n", "type": "double", "target": "nd"}),
        ("set", {"field": "k", "value": "v"}),
        ("rename", {"field": "k", "target": "k2"}),
        ("grok", {"field": "log",
                  "pattern": "%{WORD:verb} %{NOTSPACE:pth} %{INT:status}"}),
        ("dissect", {"field": "log", "pattern": "%{m} %{p} %{c}"}),
    ]
    out = compile_pipeline_arrow(steps)(t)
    pd_out = compile_pipeline(steps)(t.to_pandas())
    for c in ["lo", "tr", "g", "bz", "dec", "_index", "j", "k2",
              "verb", "status", "m", "nd"]:
        a = out[c].to_pylist()
        b = [None if v != v else v for v in pd_out[c]] \
            if pd_out[c].dtype.kind == "f" else \
            [None if v is None or (isinstance(v, float) and v != v) else v
             for v in pd_out[c]]
        assert a == b, (c, a, b)
    assert out["lst"].to_pylist() == [["b", "a", "z"], ["x", "z"], ["z"]]
    assert out["uri_host"].to_pylist() == ["a.b", "e.f", ""]


def test_apply_pipeline_picks_arrow(ray_session, sf_dir):
    """apply_pipeline must run the zero-copy Arrow tier when every step
    has a pyarrow.compute implementation."""
    import ray.data as rd

    from raydex.ops.processors import _arrow_capable, apply_pipeline

    assert _arrow_capable([("lowercase", {}), ("gsub", {})])
    assert not _arrow_capable([("lowercase", {}), ("kv", {})])

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "lang"])
    out = apply_pipeline(ds, [
        ("lowercase", {"field": "source", "target": "lo"}),
        ("fingerprint", {"fields": ["lang", "source"]}),
    ]).to_pandas()
    assert out["lo"].str.islower().all()
    assert out["fingerprint"].str.len().eq(32).all()


def test_arrow_tier_on_failure():
    import pyarrow as pa

    from raydex.ops.processors import compile_pipeline_arrow

    run = compile_pipeline_arrow(
        [("convert", {"field": "a", "type": "integer"})],
        on_failure=[("set", {"field": "err", "value": "handled"})],
    )
    out = run(pa.table({"a": ["not-a-number"]}))
    assert out["err"].to_pylist() == ["handled"]
    assert out["_ingest.on_failure_processor_type"].to_pylist() == ["convert"]


def test_geoip_processor():
    from raydex.ops.processors import GeoIpDatabase, register_geoip_database

    run = compile_pipeline([("geoip", {"field": "ip"})])
    out = run(_b(ip=["192.0.2.55", "203.0.113.9", "10.0.0.1",
                     "not-an-ip", "8.8.8.8"]))
    g = list(out["geoip"])
    assert g[0]["country_iso_code"] == "US"
    assert g[0]["city_name"] == "Test City"
    assert g[1]["country_iso_code"] == "JP"
    assert g[2] is None and g[3] is None       # private / invalid
    assert g[4]["country_iso_code"] == "US"
    # properties filter + pluggable database
    register_geoip_database("custom.mmdb", GeoIpDatabase(
        [("198.18.0.0/15", {"country_iso_code": "FR",
                            "country_name": "France"})]))
    out = compile_pipeline(
        [("geoip", {"field": "ip", "database_file": "custom.mmdb",
                    "properties": ["country_iso_code"]})]
    )(_b(ip=["198.18.4.4"]))
    assert list(out["geoip"]) == [{"country_iso_code": "FR"}]


def test_user_agent_processor():
    run = compile_pipeline([("user_agent", {"field": "ua"})])
    out = run(_b(ua=[
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
        "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15",
        "Mozilla/5.0 (iPhone; CPU iPhone OS 16_5 like Mac OS X) "
        "AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/114.0.5735.99 "
        "Mobile/15E148 Safari/604.1",
        "curl/8.4.0",
        "weirdclient/1.0",
    ]))
    rows = list(out["user_agent"])
    assert rows[0]["name"] == "Chrome" and rows[0]["version"] == "120.0"
    assert rows[0]["os"] == {"name": "Windows", "version": "10"}
    assert rows[1]["name"] == "Safari"
    assert rows[1]["os"]["name"] == "Mac OS X"
    assert rows[2]["name"] == "Chrome Mobile iOS"
    assert rows[2]["os"] == {"name": "iOS", "version": "16.5"}
    assert rows[2]["device"]["name"] == "iPhone"
    assert rows[3]["name"] == "curl"
    assert rows[4]["name"] == "Other"


def test_arrow_pandas_tier_property_parity():
    """Hypothesis: for arbitrary unicode inputs (incl. None), the Arrow
    tier and the pandas tier agree on the core string family."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyarrow as pa

    from raydex.ops.processors import compile_pipeline_arrow

    steps = [
        ("lowercase", {"field": "s", "target": "lo"}),
        ("uppercase", {"field": "s", "target": "up"}),
        ("trim", {"field": "s", "target": "tr"}),
        ("gsub", {"field": "s", "pattern": "[0-9]+",
                  "replacement": "#", "target": "g"}),
        ("split", {"field": "s", "separator": " ", "target": "sp"}),
    ]
    arrow_fn = compile_pipeline_arrow(steps)
    pandas_fn = compile_pipeline(steps)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(
        st.one_of(st.none(),
                  st.text(st.characters(blacklist_categories=("Cs",)),
                          max_size=40)),
        min_size=1, max_size=8))
    def check(vals):
        t = pa.table({"s": pa.array(vals, pa.string())})
        a = arrow_fn(t)
        p = pandas_fn(t.to_pandas())
        for c in ("lo", "up", "tr", "g"):
            av = a[c].to_pylist()
            pv = ["" if v is None else v for v in p[c].tolist()]
            assert av == pv, (c, vals, av, pv)
        assert a["sp"].to_pylist() == [list(x) for x in p["sp"]]

    check()


def test_convert_ip_and_auto():
    import pytest as _pt

    out = compile_pipeline([("convert", {"field": "v", "type": "auto"})])(
        _b(v=["true", "7", "2.5", "plain"]))
    assert list(out["v"]) == [True, 7, 2.5, "plain"]
    out = compile_pipeline([("convert", {"field": "v", "type": "ip"})])(
        _b(v=["10.0.0.1"]))
    assert list(out["v"]) == ["10.0.0.1"]
    with _pt.raises(Exception):
        compile_pipeline([("convert", {"field": "v", "type": "ip"})])(
            _b(v=["not-an-ip"]))
    # ip/auto are pandas-tier: capability check routes them off Arrow
    from raydex.ops.processors import _arrow_capable

    assert not _arrow_capable([("convert", {"type": "auto"})])
    assert _arrow_capable([("convert", {"type": "long"})])


def test_registered_domain_arrow_parity():
    import pyarrow as pa

    from raydex.ops.processors import compile_pipeline_arrow

    cases = ["www.example.co.uk", "example.com", "a.b.c.example.com",
             "localhost", "co.uk", "EXAMPLE.COM.", "sub.x.co.jp",
             "x.com", ""]
    t = pa.table({"h": cases})
    a = compile_pipeline_arrow([("registered_domain", {"field": "h"})])(t)
    p = compile_pipeline([("registered_domain", {"field": "h"})])(
        t.to_pandas())
    for c in ("domain", "top_level_domain", "registered_domain",
              "subdomain"):
        av = a[c].to_pylist()
        pv = [None if (x is None or x != x) else x for x in p[c]]
        assert av == pv, (c, av, pv)
    assert a["registered_domain"].to_pylist()[0] == "example.co.uk"
    assert a["subdomain"].to_pylist()[2] == "a.b.c"


def test_bytes_and_uri_parts_property_parity():
    """Hypothesis: a_bytes/a_uri_parts agree with the pandas tier over
    generated size strings and URL-ish inputs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyarrow as pa

    from raydex.ops.processors import compile_pipeline_arrow

    # fractions only WITH a unit — the reference's ByteSizeValue
    # requires a unit for non-integers and both tiers mirror that
    size_strs = st.builds(
        lambda n, frac, unit, pad:
            f"{pad}{n}{frac if unit else ''}{unit}{pad}",
        st.integers(0, 10**6),
        st.sampled_from(["", ".5", ".25"]),
        st.sampled_from(["b", "kb", "mb", "gb", "B", "KB", "MB", "GB", ""]),
        st.sampled_from(["", " ", "  "]))
    a_bytes = compile_pipeline_arrow([("bytes", {"field": "v"})])
    p_bytes_fn = compile_pipeline([("bytes", {"field": "v"})])

    @settings(max_examples=50, deadline=None)
    @given(st.lists(size_strs, min_size=1, max_size=6))
    def check_bytes(vals):
        t = pa.table({"v": pa.array(vals, pa.string())})
        assert a_bytes(t)["v"].to_pylist() == list(p_bytes_fn(t.to_pandas())["v"])

    check_bytes()

    urls = st.builds(
        lambda sch, host, path, q: f"{sch}{host}{path}{q}",
        st.sampled_from(["https://", "http://", "ftp://", ""]),
        st.sampled_from(["example.com", "a.b.co.uk:8080", "127.0.0.1", ""]),
        st.sampled_from(["/x/y", "/", "", "/p%20q"]),
        st.sampled_from(["?a=1&b=2", "?", ""]))
    a_uri = compile_pipeline_arrow([("uri_parts", {"field": "v"})])
    p_uri = compile_pipeline([("uri_parts", {"field": "v"})])

    @settings(max_examples=50, deadline=None)
    @given(st.lists(urls, min_size=1, max_size=6))
    def check_uri(vals):
        t = pa.table({"v": pa.array(vals, pa.string())})
        a = a_uri(t)
        p = p_uri(t.to_pandas())
        for c in ("uri_scheme", "uri_host", "uri_path", "uri_query"):
            assert a[c].to_pylist() == list(p[c]), (c, vals)

    check_uri()
