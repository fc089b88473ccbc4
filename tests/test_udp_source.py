"""UDP flow source (Spark 4 Python DataSource): datagram decode, the
reader's drain/offset contract, at-most-once replay, and an end-to-end
streaming smoke through the transform."""

from __future__ import annotations

import json
import socket
import time

import pytest

from goflow2clickhouse_spark.schema import RAW_FLOW_SCHEMA
from goflow2clickhouse_spark.sources.udp import (
    UdpFlowStreamReader,
    parse_datagram,
)


def _msg(**over):
    base = {
        "Type": 1, "TimeReceived": 1700000000, "SequenceNum": 7,
        "SamplingRate": 1000, "FlowDirection": 0,
        "SamplerAddress": "10.0.0.1", "TimeFlowStart": 1699999990,
        "TimeFlowEnd": 1700000000, "Bytes": 1234, "Packets": 3,
        "SrcAddr": "192.168.1.5", "DstAddr": "172.16.0.9",
        "Etype": 2048, "Proto": 6, "SrcPort": 51234, "DstPort": 443,
        "ForwardingStatus": 64, "TCPFlags": 18, "IcmpType": 0,
        "IcmpCode": 0, "FragmentId": 0, "FragmentOffset": 0,
    }
    base.update(over)
    return json.dumps(base).encode()


def test_parse_datagram_roundtrip():
    row = parse_datagram(_msg())
    named = dict(zip([f.name for f in RAW_FLOW_SCHEMA.fields], row))
    assert named["SamplerAddress"] == bytes([10, 0, 0, 1])
    assert named["SrcAddr"] == bytes([192, 168, 1, 5])
    assert named["Bytes"] == 1234 and named["Proto"] == 6


def test_parse_datagram_ipv6_and_defaults():
    row = parse_datagram(_msg(SrcAddr="2001:db8::1", DstPort=None))
    named = dict(zip([f.name for f in RAW_FLOW_SCHEMA.fields], row))
    assert len(named["SrcAddr"]) == 16
    assert named["DstPort"] == 0


def test_parse_datagram_garbage_dropped():
    assert parse_datagram(b"\x00\x01not json") is None
    assert parse_datagram(b"") is None


@pytest.fixture()
def reader():
    r = UdpFlowStreamReader({"host": "127.0.0.1", "port": "0"})
    sock = r._socket()  # bind to an ephemeral port
    yield r, sock.getsockname()[1]
    sock.close()


def _send(port: int, payloads: list[bytes]):
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for p in payloads:
        s.sendto(p, ("127.0.0.1", port))
    s.close()


def test_reader_drain_and_offsets(reader):
    r, port = reader
    assert r.initialOffset() == {"count": 0}
    _send(port, [_msg(SequenceNum=i) for i in range(5)] + [b"junk"])
    time.sleep(0.2)
    rows, off = r.read({"count": 0})
    rows = list(rows)
    assert len(rows) == 5 and off == {"count": 5}
    # drained: next read returns nothing, offset advances by 0
    rows2, off2 = r.read(off)
    assert list(rows2) == [] and off2 == {"count": 5}
    # UDP replay is empty by contract (at-most-once, reference parity)
    assert list(r.readBetweenOffsets({"count": 0}, {"count": 5})) == []


def test_udp_stream_end_to_end(spark, tmp_path):
    """readStream.format('udp_flows') → flow_transform → memory sink."""
    from goflow2clickhouse_spark.operators.flows import flow_transform
    from goflow2clickhouse_spark.sources.udp import UdpFlowDataSource

    spark.dataSource.register(UdpFlowDataSource)
    # pick a free UDP port
    probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    raw = (
        spark.readStream.format("udp_flows")
        .option("host", "127.0.0.1")
        .option("port", str(port))
        .load()
    )
    q = (
        flow_transform(raw)
        .writeStream.format("memory")
        .queryName("udp_e2e")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            _send(port, [_msg(SequenceNum=i, Bytes=100 + i) for i in range(3)])
            time.sleep(1.0)
            rows = spark.table("udp_e2e").collect()
            if rows:
                break
        assert rows, "no rows arrived over UDP within deadline"
        assert rows[0].sampler_address == "10.0.0.1"
        assert rows[0].src_addr == "192.168.1.5"
    finally:
        q.stop()
