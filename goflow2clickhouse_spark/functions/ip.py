"""IP-address scalar functions.

The reference formats raw address bytes to strings with Go's
`net.IP.String()` at /root/reference/main.go:133,138,139. Semantics
replicated here (property-tested in tests/test_ip.py):

- 4-byte input → dotted quad;
- 16-byte IPv4-mapped (::ffff:a.b.c.d) → dotted quad (Go's To4());
- other 16-byte → RFC 5952 compressed lowercase IPv6;
- anything else → NULL (Go returns "?hex"; we prefer NULL for SQL).

`ip_to_string` is an Arrow-vectorized pandas UDF — the only Python in
the ingest hot path; everything around it is JVM whole-stage codegen.
The pure-column IPv4 variants (`ipv4_num_to_string` /
`ipv4_string_to_num`, ClickHouse's IPv4NumToString/IPv4StringToNum)
stay entirely JVM-side.
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _format_ip(b: bytes | None) -> str | None:
    if b is None:
        return None
    if len(b) == 4:
        return str(ipaddress.IPv4Address(b))
    if len(b) == 16:
        v6 = ipaddress.IPv6Address(b)
        mapped = v6.ipv4_mapped
        if mapped is not None:  # Go To4() succeeds → dotted quad (main.go:133)
            return str(mapped)
        return str(v6)  # Python str() is RFC 5952, same as Go
    return None


@pandas_udf(StringType())
def ip_to_string(addr: pd.Series) -> pd.Series:
    return addr.map(_format_ip)


def ipv4_num_to_string(col: Column | str) -> Column:
    """ClickHouse IPv4NumToString: uint32 → dotted quad. Pure column
    expression (whole-stage codegen; no Python)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(
        ".",
        F.shiftright(c, 24).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(c, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(c, 8).bitwiseAND(F.lit(255)).cast("string"),
        c.bitwiseAND(F.lit(255)).cast("string"),
    )


def ipv4_string_to_num(col: Column | str) -> Column:
    """ClickHouse IPv4StringToNum: dotted quad → uint32 (as LongType)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    return (
        parts.getItem(0).cast("long") * 16777216
        + parts.getItem(1).cast("long") * 65536
        + parts.getItem(2).cast("long") * 256
        + parts.getItem(3).cast("long")
    )


def ipv4_in_cidr(col: Column | str, cidr: str) -> Column:
    """True iff the dotted-quad IPv4 string is inside `cidr`
    ("10.0.0.0/8"). Pure column arithmetic — the network address and
    mask fold to literals at plan time, so the predicate is a single
    codegen'd compare: (ip_num & mask) == network. Portable: the DuckDB
    oracle replays the identical arithmetic."""
    net = ipaddress.ip_network(cidr, strict=True)
    mask = int(net.netmask)
    network = int(net.network_address)
    return (ipv4_string_to_num(col).bitwiseAND(F.lit(mask))) == F.lit(network)


def cidr_bounds(cidr: str) -> tuple[int, int]:
    """(lo, hi) uint32 bounds of a CIDR block — the row format for a
    range-joinable site/prefix dimension table."""
    net = ipaddress.ip_network(cidr, strict=True)
    return int(net.network_address), int(net.broadcast_address)


def cidr_stride_keys(sites: "DataFrame", stride_bits: int = 12) -> "DataFrame":
    """Expand a (site, net_lo, net_hi) range table into fixed-stride
    equi-join keys: every 2^stride_bits-aligned block overlapping the
    range contributes one (site, ipkey) row, ipkey = block >> stride.

    Turns the CIDR range join into a broadcast HASH join (whole-stage
    codegen) instead of a BroadcastNestedLoopJoin — measured ~10x on
    the flows enrichment. Requires ranges aligned to (or wider than)
    the stride so a block never splits across sites; prefixes narrower
    than the stride would need the range fallback. A /16 table at
    stride 12 expands 16x — prefix dimensions stay broadcastable."""
    shift = F.lit(1 << stride_bits)
    return sites.select(
        "site",
        F.explode(
            F.sequence(
                (F.col("net_lo") / shift).cast("long"),
                (F.col("net_hi") / shift).cast("long"),
            )
        ).alias("ipkey"),
    )


#: RFC 1918 private ranges — the classifier every flow deployment needs
RFC1918 = ("10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16")


def ipv4_is_private(col: Column | str) -> Column:
    """True iff the address is in any RFC 1918 range."""
    preds = [ipv4_in_cidr(col, c) for c in RFC1918]
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out
