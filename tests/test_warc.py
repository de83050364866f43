"""Tests for the WARC segment writer and distributed parser."""


def _record(wtype, uri, payload: bytes, version=b"WARC/1.0"):
    head = (
        version + b"\r\n"
        + f"WARC-Type: {wtype}\r\n".encode()
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n"
    )
    return head + payload + b"\r\n\r\n"


class TestWarc:
    def test_roundtrip(self, spark):
        from graphina_spark.sources.warc import parse_warc, warc_segments

        docs = spark.createDataFrame(
            [(i, f"document number {i} body text") for i in range(20)],
            "doc_id long, text string",
        )
        parsed = parse_warc(warc_segments(docs, n_segments=4))
        rows = {
            int(r["target_uri"].removeprefix("doc://")): bytes(r["payload"]).decode()
            for r in parsed.collect()
        }
        assert rows == {i: f"document number {i} body text" for i in range(20)}

    def test_skips_non_response_records(self, spark):
        from graphina_spark.sources.warc import parse_warc

        blob = (
            _record("request", "http://a", b"GET / HTTP/1.1")
            + _record("response", "http://a", b"hello")
            + _record("metadata", "http://a", b"x: y")
        )
        segs = spark.createDataFrame([(0, bytearray(blob))], "segment int, data binary")
        rows = parse_warc(segs).collect()
        assert len(rows) == 1 and bytes(rows[0]["payload"]) == b"hello"
        allrows = parse_warc(segs, record_types=()).collect()
        assert len(allrows) == 3  # empty filter = keep everything

    def test_warc_11_and_embedded_marker(self, spark):
        from graphina_spark.sources.warc import parse_warc

        tricky = b"payload containing WARC/1.0\r\n marker inside"
        blob = _record("response", "http://v11", b"v11 body", version=b"WARC/1.1") + _record(
            "response", "http://tricky", tricky
        )
        segs = spark.createDataFrame([(0, bytearray(blob))], "segment int, data binary")
        rows = sorted(parse_warc(segs).collect(), key=lambda r: r["target_uri"])
        assert [r["target_uri"] for r in rows] == ["http://tricky", "http://v11"]
        assert bytes(rows[0]["payload"]) == tricky

    def test_segments_deterministic(self, spark):
        from graphina_spark.sources.warc import warc_segments

        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
        )
        a = sorted((r["segment"], bytes(r["data"])) for r in warc_segments(docs).collect())
        b = sorted((r["segment"], bytes(r["data"])) for r in warc_segments(docs).collect())
        assert a == b
        assert a[0][1].startswith(b"WARC/1.0\r\n")
