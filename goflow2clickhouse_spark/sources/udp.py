"""UDP streaming source via the Spark 4 Python DataSource API — the
engine's native stand-in for the reference's UDP listeners
(/root/reference/main.go:226-240: sFlow/NetFlow sockets with decode
inside the goflow library).

Wire formats (auto-dispatched per datagram, decode_datagram):
- binary NetFlow v5 — fixed 24-byte header + 48-byte records, decoded
  in-process (main.go:236-240 parity; the format is fixed so no
  template state is needed);
- one JSON object per datagram with the goflow2-style field names of
  the raw FlowMessage (Type, TimeReceived, SamplerAddress as a
  dotted/colon IP string, ...) — what a goflow2 -transport.udp relay
  emits for the template-dependent protocols (sFlow, NetFlow v9,
  IPFIX).

Delivery semantics — deliberately the REFERENCE's, not Spark's usual:
UDP is lossy and unreplayable, so `readBetweenOffsets` (the replay path
after a crash) returns nothing: at-most-once, matching the reference's
log-and-drop insert path (main.go:158-172). Everything downstream of
the source is still checkpointed exactly-once per batch.

Scale note: a SimpleDataSourceStreamReader drains on the driver — right
for one listener socket (the reference is also one socket per listener,
main.go:250). Fan-in of many listeners = many source streams unioned
(operators/flows.fan_in), not one fat socket.
"""

from __future__ import annotations

import ipaddress
import json
import socket
import struct
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from ..schema import RAW_FLOW_SCHEMA

_MAX_DGRAM = 65535
_BINARY_FIELDS = {"SamplerAddress", "SrcAddr", "DstAddr"}

# FlowMessage.FlowType enum values (goflow2 wire contract; the reference
# consumes these via the JSON transport).
_TYPE_NETFLOW_V5 = 2

_V5_HEADER = struct.Struct(">HHIIIIBBH")  # 24 bytes
_V5_RECORD = struct.Struct(">4s4s4sHHIIIIHHBBBBHHBBH")  # 48 bytes


def parse_datagram(payload: bytes) -> tuple | None:
    """One JSON datagram → one RAW_FLOW_SCHEMA tuple (None = undecodable,
    dropped-and-counted like the reference's log-and-drop)."""
    try:
        msg = json.loads(payload)
    except (ValueError, UnicodeDecodeError):
        return None
    if not isinstance(msg, dict):
        # valid JSON but not an object ([1,2], "x", 5): undecodable.
        return None
    row = []
    try:
        for f in RAW_FLOW_SCHEMA.fields:
            v = msg.get(f.name)
            if f.name in _BINARY_FIELDS:
                try:
                    v = ipaddress.ip_address(v or "0.0.0.0").packed
                except ValueError:
                    v = b"\x00\x00\x00\x00"
            elif v is None:
                v = 0
            else:
                v = int(v)
            row.append(v)
    except (ValueError, TypeError, AttributeError, OverflowError):
        # non-numeric field ({"Bytes": "abc"}) or other junk: the field
        # loop must never crash the streaming query — one stray packet
        # on an open port is normal, not fatal (log-and-drop contract).
        return None
    return tuple(row)


def decode_netflow_v5(payload: bytes, sampler: bytes) -> list[tuple] | None:
    """Binary NetFlow v5 datagram → RAW_FLOW_SCHEMA rows (None = malformed).

    The v5 wire format is fixed (public: RFC-adjacent Cisco spec; the
    smallest decoder in the reference's dependency chain is goflow's
    nfv5, wired in at main.go:236-240): a 24-byte big-endian header
    (version, count, sys_uptime ms, unix_secs, unix_nsecs, flow_sequence,
    engine_type, engine_id, sampling_interval) followed by `count`
    48-byte records.  Field mapping follows goflow's FlowMessage
    conversion: flow start/end are reconstructed from the router's
    sys_uptime clock against unix_secs; ICMP type/code are packed in
    dst_port for proto 1; sampling interval keeps only its low 14 bits
    (the top 2 are the sampling-mode tag).
    """
    if len(payload) < _V5_HEADER.size:
        return None
    (version, count, sys_uptime, unix_secs, _unix_nsecs, flow_sequence,
     _engine_type, _engine_id, sampling) = _V5_HEADER.unpack_from(payload, 0)
    if version != 5:
        return None
    if count < 1 or count > 30:  # spec: 1..30 records per datagram
        return None
    if len(payload) < _V5_HEADER.size + count * _V5_RECORD.size:
        return None  # truncated datagram
    sampling_rate = sampling & 0x3FFF
    rows: list[tuple] = []
    for i in range(count):
        (srcaddr, dstaddr, _nexthop, _inp, _outp, d_pkts, d_octets,
         first, last, srcport, dstport, _pad1, tcp_flags, proto, _tos,
         _src_as, _dst_as, _src_mask, _dst_mask, _pad2) = \
            _V5_RECORD.unpack_from(payload, _V5_HEADER.size + i * _V5_RECORD.size)
        # first/last are on the router's sys_uptime clock (ms); anchor
        # them to wall time via the header pair (uptime, unix_secs).
        t_start = unix_secs - (sys_uptime - first) // 1000
        t_end = unix_secs - (sys_uptime - last) // 1000
        icmp_type, icmp_code = (dstport >> 8, dstport & 0xFF) if proto == 1 else (0, 0)
        rows.append((
            _TYPE_NETFLOW_V5,      # Type
            unix_secs,             # TimeReceived
            flow_sequence,         # SequenceNum
            sampling_rate,         # SamplingRate
            0,                     # FlowDirection (not carried in v5)
            sampler,               # SamplerAddress (datagram peer)
            t_start,               # TimeFlowStart
            t_end,                 # TimeFlowEnd
            d_octets,              # Bytes
            d_pkts,                # Packets
            srcaddr,               # SrcAddr
            dstaddr,               # DstAddr
            0x0800,                # Etype (v5 is IPv4-only)
            proto,                 # Proto
            srcport,               # SrcPort
            0 if proto == 1 else dstport,  # DstPort
            0,                     # ForwardingStatus (not in v5)
            tcp_flags,             # TCPFlags
            icmp_type,             # IcmpType
            icmp_code,             # IcmpCode
            0,                     # FragmentId (not in v5)
            0,                     # FragmentOffset (not in v5)
        ))
    return rows


def decode_datagram(payload: bytes, sampler: bytes = b"\x00\x00\x00\x00") -> list[tuple] | None:
    """Framing dispatch: binary NetFlow v5 if the first two bytes are the
    big-endian version tag 0x0005, else one goflow2-style JSON object.
    Returns RAW_FLOW_SCHEMA rows, or None when undecodable (caller counts
    the drop).  JSON can never collide with the tag: it starts with
    printable bytes ('{', whitespace), never 0x00.
    """
    if len(payload) >= 2 and payload[0] == 0 and payload[1] == 5:
        return decode_netflow_v5(payload, sampler)
    row = parse_datagram(payload)
    return None if row is None else [row]


class UdpFlowStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.host = options.get("host", "0.0.0.0")
        self.port = int(options.get("port", "6343"))
        self.max_per_batch = int(options.get("maxRowsPerTrigger", "100000"))
        # reuseport=true → SO_REUSEPORT: N listener streams bind the SAME
        # port and the kernel spreads datagrams across them — the engine's
        # -workers parity (main.go:35: N decode goroutines per listener).
        # Compose with fan_in: open N udp:// streams with reuseport and
        # union them (sources/streaming.py docstring).
        self.reuseport = options.get("reuseport", "false").lower() == "true"
        self.rcvbuf = int(options.get("rcvbuf", "0"))
        self._sock: socket.socket | None = None
        self._dropped = 0

    def _socket(self) -> socket.socket:
        if self._sock is None:
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            if self.reuseport:
                s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
            if self.rcvbuf > 0:
                s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, self.rcvbuf)
            s.bind((self.host, self.port))
            s.setblocking(False)
            self._sock = s
        return self._sock

    def initialOffset(self) -> dict:
        return {"count": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        """Drain whatever is in the kernel buffer right now (bounded by
        maxRowsPerTrigger — the size half of the reference's
        size-OR-time batcher, main.go:121-152)."""
        sock = self._socket()
        rows: list[tuple] = []
        peer_cache: dict[str, bytes] = {}
        while len(rows) < self.max_per_batch:
            try:
                payload, addr = sock.recvfrom(_MAX_DGRAM)
            except BlockingIOError:
                break
            peer = peer_cache.get(addr[0])
            if peer is None:
                try:
                    peer = ipaddress.ip_address(addr[0]).packed
                except ValueError:
                    peer = b"\x00\x00\x00\x00"
                peer_cache[addr[0]] = peer
            decoded = decode_datagram(payload, peer)
            if decoded is None:
                self._dropped += 1
                continue
            rows.extend(decoded)
        return iter(rows), {"count": start["count"] + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # UDP cannot replay: at-most-once on crash-recovery, the
        # reference's own contract (main.go:158-172).
        return iter(())

    def commit(self, end: dict) -> None:
        pass


class UdpFlowDataSource(DataSource):
    """spark.dataSource.register(UdpFlowDataSource); then
    spark.readStream.format("udp_flows").option("port", 6343).load()."""

    @classmethod
    def name(cls) -> str:
        return "udp_flows"

    def schema(self) -> StructType:
        return RAW_FLOW_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> UdpFlowStreamReader:
        return UdpFlowStreamReader(self.options)
