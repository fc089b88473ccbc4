"""Golden ingest-transform tests (SURVEY.md §5.2 layer 4): the
FlowMessage→FlowDb projection (reference main.go:127-150) on edge-case
rows — IPv6 compression, IPv4-mapped, large uints, zero timestamps.
"""

from __future__ import annotations

import ipaddress

from goflow2clickhouse_spark.operators.flows import fan_in, flow_transform
from goflow2clickhouse_spark.schema import FLOWS_SCHEMA, RAW_FLOW_SCHEMA


def _raw_row(**over):
    base = dict(
        Type=1,
        TimeReceived=1700000000,
        SequenceNum=42,
        SamplingRate=1000,
        FlowDirection=0,
        SamplerAddress=bytes([10, 0, 0, 1]),
        TimeFlowStart=1699999990,
        TimeFlowEnd=1700000000,
        Bytes=1234,
        Packets=3,
        SrcAddr=bytes([192, 168, 1, 5]),
        DstAddr=bytes([172, 16, 0, 9]),
        Etype=2048,
        Proto=6,
        SrcPort=51234,
        DstPort=443,
        ForwardingStatus=64,
        TCPFlags=18,
        IcmpType=0,
        IcmpCode=0,
        FragmentId=0,
        FragmentOffset=0,
    )
    base.update(over)
    return tuple(base[f.name] for f in RAW_FLOW_SCHEMA.fields)


def test_transform_schema_and_values(spark):
    rows = [
        _raw_row(),
        # IPv6 with RFC 5952 compression + IPv4-mapped sampler
        _raw_row(
            SamplerAddress=bytes(10) + b"\xff\xff" + bytes([10, 9, 8, 7]),
            SrcAddr=ipaddress.IPv6Address("2001:db8::1").packed,
            DstAddr=ipaddress.IPv6Address("::").packed,
            Etype=34525,
        ),
        # max uint32 values, zero timestamps, huge counters
        _raw_row(
            TimeReceived=0, TimeFlowStart=0, TimeFlowEnd=0,
            Bytes=2**62, Packets=2**40, SequenceNum=2**32 - 1,
            TCPFlags=63, Type=4,
        ),
    ]
    raw = spark.createDataFrame(rows, RAW_FLOW_SCHEMA)
    out = flow_transform(raw)
    assert [f.name for f in out.schema.fields] == [f.name for f in FLOWS_SCHEMA.fields]
    got = out.collect()

    assert got[0].type == 1 and got[0].src_addr == "192.168.1.5"
    assert got[0].dst_addr == "172.16.0.9" and got[0].tcp_flags == 18

    assert got[1].sampler_address == "10.9.8.7"  # v4-mapped → dotted (Go To4)
    assert got[1].src_addr == "2001:db8::1"
    assert got[1].dst_addr == "::"

    assert got[2].bytes == 2**62 and got[2].sequence_num == 2**32 - 1
    assert got[2].time_received == 0

    # type column is int32 (main.go:128 cast)
    assert dict(out.dtypes)["type"] == "int"


def test_fan_in_union(spark):
    a = spark.createDataFrame([_raw_row(SequenceNum=1)], RAW_FLOW_SCHEMA)
    b = spark.createDataFrame([_raw_row(SequenceNum=2)], RAW_FLOW_SCHEMA)
    c = spark.createDataFrame([_raw_row(SequenceNum=3)], RAW_FLOW_SCHEMA)
    merged = flow_transform(fan_in(a, b, c))
    assert sorted(r.sequence_num for r in merged.collect()) == [1, 2, 3]
