"""UDP streaming source via the Spark 4 Python DataSource API — the
engine's native stand-in for the reference's UDP listeners
(/root/reference/main.go:226-240: sFlow/NetFlow sockets with decode
inside the goflow library).

Wire format: one JSON object per datagram with the goflow2-style field
names of the raw FlowMessage (Type, TimeReceived, SamplerAddress as a
dotted/colon IP string, ...). Binary sFlow/NetFlow decode stays outside
the engine (it needs the protocol templates goflow carries); a
goflow2 -transport.udp relay produces exactly this JSON framing.

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
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from ..schema import RAW_FLOW_SCHEMA

_MAX_DGRAM = 65535
_BINARY_FIELDS = {"SamplerAddress", "SrcAddr", "DstAddr"}


def parse_datagram(payload: bytes) -> tuple | None:
    """One JSON datagram → one RAW_FLOW_SCHEMA tuple (None = undecodable,
    dropped-and-counted like the reference's log-and-drop)."""
    try:
        msg = json.loads(payload)
    except (ValueError, UnicodeDecodeError):
        return None
    row = []
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
    return tuple(row)


class UdpFlowStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.host = options.get("host", "0.0.0.0")
        self.port = int(options.get("port", "6343"))
        self.max_per_batch = int(options.get("maxRowsPerTrigger", "100000"))
        self._sock: socket.socket | None = None
        self._dropped = 0

    def _socket(self) -> socket.socket:
        if self._sock is None:
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
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
        while len(rows) < self.max_per_batch:
            try:
                payload, _ = sock.recvfrom(_MAX_DGRAM)
            except BlockingIOError:
                break
            row = parse_datagram(payload)
            if row is None:
                self._dropped += 1
                continue
            rows.append(row)
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
