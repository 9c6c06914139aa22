"""Text-structure finder (x-pack text-structure
TextStructureFinderManager): ndjson / delimited / semi-structured
detection, column typing, timestamp format."""

import pytest

from raydex.ops.text_structure import find_structure


def test_ndjson():
    lines = [
        '{"ts": "2024-05-01T10:00:00Z", "level": "info", "n": 1}',
        '{"ts": "2024-05-01T10:00:01Z", "level": "warn", "n": 2}',
        '{"ts": "2024-05-01T10:00:02Z", "level": "error", "n": 3}',
    ]
    out = find_structure(lines)
    assert out["format"] == "ndjson"
    assert out["column_names"] == ["level", "n", "ts"]
    assert out["mappings"]["n"]["type"] == "long"
    assert out["mappings"]["ts"]["type"] == "date"
    assert out["timestamp_field"] == "ts"
    assert out["timestamp_format"] == "iso8601"


def test_delimited_with_header():
    lines = [
        "time,host,latency_ms",
        "2024/05/01 10:00:00,web01,12.5",
        "2024/05/01 10:00:05,web02,9.25",
        "2024/05/01 10:00:09,web01,30.0",
    ]
    out = find_structure(lines)
    assert out["format"] == "delimited"
    assert out["delimiter"] == ","
    assert out["has_header_row"] is True
    assert out["column_names"] == ["time", "host", "latency_ms"]
    assert out["mappings"]["latency_ms"]["type"] == "double"
    assert out["mappings"]["host"]["type"] == "keyword"
    assert out["timestamp_field"] == "time"
    assert out["timestamp_format"] == "yyyy/MM/dd HH:mm:ss"


def test_delimited_headerless_tsv():
    lines = ["1\talpha", "2\tbeta", "3\tgamma"]
    out = find_structure(lines)
    assert out["format"] == "delimited" and out["delimiter"] == "\t"
    assert out["has_header_row"] is False
    assert out["column_names"] == ["column1", "column2"]
    assert out["mappings"]["column1"]["type"] == "long"


def test_semi_structured_syslog():
    lines = [
        "May  1 10:00:00 web01 sshd[123]: accepted",
        "May  2 11:30:00 web02 cron[77]: job ran",
    ]
    out = find_structure(lines)
    assert out["format"] == "semi_structured_text"
    assert out["timestamp_format"] == "syslog"
    with pytest.raises(ValueError, match="empty sample"):
        find_structure(["", "  "])
