"""Cisco ASA configuration parser → normalized rule dimension.

Parity surface for the reference's config-side script ([R-mem]
``convert_ruleset_to_flows.py``; SURVEY.md §0 — the reference mount was
empty, so behavior is reconstructed from the public ASA config format):
expand ``access-list`` statements, including ``object-group``
network/service indirection, into one row per concrete
(src, dst, port) flow tuple.

Design split, matching the data's shape rather than the reference's
code: the *config parse* is driver-side pure Python — a firewall config
is a few thousand lines, a classic small dimension — and the *result*
is a declared-schema DataFrame, broadcast-joinable against billions of
parsed log rows (``F.broadcast``; the log side never shuffles for this
join). Nothing here touches an executor until the join.

Grammar covered (public ASA syntax):

    object-group network <name>
      network-object host <ip>
      network-object <net> <mask>
      group-object <other-group>
    object-group service <name> <tcp|udp|tcp-udp>
      port-object eq <port>
      port-object range <lo> <hi>
      group-object <other-group>
    access-list <name> extended <permit|deny> <proto> <src> <dst> [<port>]
        where <src>/<dst> ∈ { any | host <ip> | <net> <mask>
                              | object-group <group> }
              <port>      ∈ { eq <p> | range <lo> <hi>
                              | object-group <group> }   (absent → any)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

RULE_SCHEMA = T.StructType(
    [
        T.StructField("acl", T.StringType()),
        T.StructField("rule_id", T.IntegerType()),
        T.StructField("action", T.StringType()),
        T.StructField("protocol", T.StringType()),
        T.StructField("src_net", T.StringType()),
        T.StructField("dst_net", T.StringType()),
        T.StructField("port_lo", T.IntegerType()),
        T.StructField("port_hi", T.IntegerType()),
    ]
)

_ANY_PORTS = (0, 65535)


@dataclass
class _Groups:
    network: dict[str, list[str]] = field(default_factory=dict)
    service: dict[str, list[tuple[int, int]]] = field(default_factory=dict)

    def resolve_network(self, name: str, seen: frozenset[str] = frozenset()) -> list[str]:
        if name in seen:
            raise ValueError(f"object-group cycle at {name!r}")
        if name not in self.network:
            # fail loud: a typo'd group silently expanding to zero
            # tuples would drop the whole rule (and its hits) unnoticed
            raise ValueError(f"undefined network object-group {name!r}")
        out: list[str] = []
        for item in self.network[name]:
            if item.startswith("group:"):
                out.extend(self.resolve_network(item[6:], seen | {name}))
            else:
                out.append(item)
        return out

    def resolve_service(
        self, name: str, seen: frozenset[str] = frozenset()
    ) -> list[tuple[int, int]]:
        if name in seen:
            raise ValueError(f"object-group cycle at {name!r}")
        if name not in self.service:
            raise ValueError(f"undefined service object-group {name!r}")
        out: list[tuple[int, int]] = []
        for item in self.service[name]:
            if isinstance(item, str) and item.startswith("group:"):
                out.extend(self.resolve_service(item[6:], seen | {name}))
            else:
                out.append(item)  # type: ignore[arg-type]
        return out


def _mask_to_prefix(mask: str) -> int:
    return sum(bin(int(o)).count("1") for o in mask.split("."))


def _parse_endpoint(toks: list[str], i: int) -> tuple[str, int]:
    """Consume one src/dst endpoint starting at toks[i]; return
    (endpoint-spec, next index). Spec is 'any', 'ip/32', 'net/prefix',
    or 'group:<name>' for later expansion."""
    t = toks[i]
    if t == "any":
        return "0.0.0.0/0", i + 1
    if t == "host":
        return f"{toks[i + 1]}/32", i + 2
    if t == "object-group":
        return f"group:{toks[i + 1]}", i + 2
    # "<net> <mask>" form
    return f"{t}/{_mask_to_prefix(toks[i + 1])}", i + 2


def _parse_port(toks: list[str], i: int) -> str | tuple[int, int]:
    if i >= len(toks):
        return _ANY_PORTS
    t = toks[i]
    if t == "eq":
        p = _well_known(toks[i + 1])
        return (p, p)
    if t == "range":
        return (_well_known(toks[i + 1]), _well_known(toks[i + 2]))
    if t == "object-group":
        return f"group:{toks[i + 1]}"
    return _ANY_PORTS


_WELL_KNOWN = {
    "www": 80, "http": 80, "https": 443, "ssh": 22, "telnet": 23,
    "smtp": 25, "domain": 53, "ftp": 21, "pop3": 110, "imap4": 143,
    "ntp": 123, "snmp": 161, "syslog": 514,
}


def _well_known(tok: str) -> int:
    if tok.isdigit():
        return int(tok)
    return _WELL_KNOWN[tok]  # KeyError on unknown service names — fail loud


def parse_asa_config(text: str) -> list[dict]:
    """Pure-Python parse+expand; one dict per concrete flow tuple.

    ``rule_id`` numbers access-list statements per ACL in order of
    appearance (the position the firewall evaluates them in); every
    expanded tuple of one statement shares its rule_id, exactly what a
    hit-count join needs."""
    groups = _Groups()
    acl_entries: list[tuple[str, list[str]]] = []
    current: tuple[str, str] | None = None  # (kind, name)

    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("!"):
            continue
        toks = line.split()
        if toks[0] == "object-group":
            kind, name = toks[1], toks[2]
            current = (kind, name)
            if kind == "network":
                groups.network.setdefault(name, [])
            else:
                groups.service.setdefault(name, [])
        elif toks[0] == "network-object" and current and current[0] == "network":
            spec, _ = _parse_endpoint(toks, 1)
            groups.network[current[1]].append(spec)
        elif toks[0] == "port-object" and current and current[0] == "service":
            groups.service[current[1]].append(_parse_port(toks, 1))  # type: ignore[arg-type]
        elif toks[0] == "group-object" and current:
            target = groups.network if current[0] == "network" else groups.service
            target[current[1]].append(f"group:{toks[1]}")  # type: ignore[arg-type]
        elif toks[0] == "access-list":
            current = None
            acl_entries.append((toks[1], toks))
        else:
            current = None

    rule_counters: dict[str, int] = {}
    rows: list[dict] = []
    for acl, toks in acl_entries:
        # access-list <name> [extended] <action> <proto> <src...> <dst...> [<port...>]
        # access-list <name> standard <permit|deny> <net...>
        # access-list <name> remark <free text>   -- annotation, skipped
        i = 2
        if toks[i] == "remark":
            continue
        if toks[i] == "standard":
            # standard ACLs match source only: action + one endpoint
            action, proto = toks[i + 1], "ip"
            src, _ = _parse_endpoint(toks, i + 2)
            dst, port = "0.0.0.0/0", _ANY_PORTS
            rule_counters[acl] = rule_counters.get(acl, 0) + 1
            srcs = (
                groups.resolve_network(src[6:]) if src.startswith("group:") else [src]
            )
            for s in srcs:
                rows.append(
                    {
                        "acl": acl, "rule_id": rule_counters[acl], "action": action,
                        "protocol": proto, "src_net": s, "dst_net": dst,
                        "port_lo": port[0], "port_hi": port[1],
                    }
                )
            continue
        if toks[i] == "extended":
            i += 1
        action, proto = toks[i], toks[i + 1]
        i += 2
        src, i = _parse_endpoint(toks, i)
        dst, i = _parse_endpoint(toks, i)
        port = _parse_port(toks, i)

        rule_counters[acl] = rule_counters.get(acl, 0) + 1
        rid = rule_counters[acl]

        srcs = groups.resolve_network(src[6:]) if src.startswith("group:") else [src]
        dsts = groups.resolve_network(dst[6:]) if dst.startswith("group:") else [dst]
        ports = (
            groups.resolve_service(port[6:])
            if isinstance(port, str) and port.startswith("group:")
            else [port]
        )
        for s in srcs:
            for d in dsts:
                for lo, hi in ports:  # type: ignore[misc]
                    rows.append(
                        {
                            "acl": acl,
                            "rule_id": rid,
                            "action": action,
                            "protocol": proto,
                            "src_net": s,
                            "dst_net": d,
                            "port_lo": lo,
                            "port_hi": hi,
                        }
                    )
    return rows


def rules_dataframe(spark: SparkSession, config_text: str) -> DataFrame:
    """Parsed+expanded ruleset as a declared-schema DataFrame — the
    broadcast dimension for hit-count joins."""
    return spark.createDataFrame(parse_asa_config(config_text), RULE_SCHEMA)
