"""CEF field dictionary: the decode/encode key-mapping tables.

This is the engine's one static dimension table. The reference builds the
same tables once at plugin init (see /root/reference/lib/logstash/codecs/cef.rb:416-576,
class CEFField at cef.rb:387-414); we build them once on the Spark driver and
ship them to executors as broadcast variables (semantically a broadcast hash
join against a 239-row dimension — a dict lookup is cheaper than a real join
for a table this small).

Table contents transcribed from the reference's field list
(cef.rb:421-551 named fields, cef.rb:465-476 the 15x8 numbered custom-field
generator) and cross-checked against docs/index.asciidoc:96-393.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class CEFField:
    """One row of the CEF field dimension (reference: cef.rb:387-414).

    name:      full CEF field name (e.g. ``sourceAddress``)
    key:       abbreviated CEF key used on the wire (e.g. ``src``); defaults to name
    ecs_field: ECS-compatible field reference in square-bracket syntax
    legacy:    legacy CEF name supported in pass-through
    priority:  collision resolution — when several fields map to one ECS name,
               the highest priority wins the encode slot (cef.rb:552)
    is_timestamp: whether ECS mode normalizes this field's value to a timestamp
    """

    name: str
    key: Optional[str] = None
    ecs_field: Optional[str] = None
    legacy: Optional[str] = None
    priority: int = 0
    is_timestamp: bool = False

    @property
    def cef_key(self) -> str:
        return self.key if self.key is not None else self.name

    @property
    def ecs(self) -> str:
        return self.ecs_field if self.ecs_field is not None else self.name


def _numbered_custom_fields() -> list[CEFField]:
    """The 15x8 = 120 numbered device-custom fields (cef.rb:465-476)."""
    out: list[CEFField] = []
    for idx in range(1, 16):
        out.extend(
            [
                CEFField(f"deviceCustomFloatingPoint{idx}", key=f"cfp{idx}",
                         ecs_field=f"[cef][device_custom_floating_point_{idx}][value]"),
                CEFField(f"deviceCustomFloatingPoint{idx}Label", key=f"cfp{idx}Label",
                         ecs_field=f"[cef][device_custom_floating_point_{idx}][label]"),
                CEFField(f"deviceCustomIPv6Address{idx}", key=f"c6a{idx}",
                         ecs_field=f"[cef][device_custom_ipv6_address_{idx}][value]"),
                CEFField(f"deviceCustomIPv6Address{idx}Label", key=f"c6a{idx}Label",
                         ecs_field=f"[cef][device_custom_ipv6_address_{idx}][label]"),
                CEFField(f"deviceCustomNumber{idx}", key=f"cn{idx}",
                         ecs_field=f"[cef][device_custom_number_{idx}][value]"),
                CEFField(f"deviceCustomNumber{idx}Label", key=f"cn{idx}Label",
                         ecs_field=f"[cef][device_custom_number_{idx}][label]"),
                CEFField(f"deviceCustomString{idx}", key=f"cs{idx}",
                         ecs_field=f"[cef][device_custom_string_{idx}][value]"),
                CEFField(f"deviceCustomString{idx}Label", key=f"cs{idx}Label",
                         ecs_field=f"[cef][device_custom_string_{idx}][label]"),
            ]
        )
    return out


def cef_fields(device: str = "observer") -> list[CEFField]:
    """The full 239-entry field table (cef.rb:420-552), ordered as the reference lists it.

    ``device`` selects whether device-* CEF fields describe the ECS observer or
    host (config :device, cef.rb:97; template interpolations at cef.rb:464,478,480,482,484).
    """
    if device not in ("observer", "host"):
        raise ValueError(f"device must be 'observer' or 'host', got {device!r}")
    dv = device
    fields: list[CEFField] = [
        CEFField("agentAddress", key="agt", ecs_field="[agent][ip]"),
        CEFField("agentDnsDomain", ecs_field="[cef][agent][registered_domain]", priority=10),
        CEFField("agentHostName", key="ahost", ecs_field="[agent][name]"),
        CEFField("agentId", key="aid", ecs_field="[agent][id]"),
        CEFField("agentMacAddress", key="amac", ecs_field="[agent][mac]"),
        CEFField("agentNtDomain", ecs_field="[cef][agent][registered_domain]"),
        CEFField("agentReceiptTime", key="art", ecs_field="[event][created]", is_timestamp=True),
        CEFField("agentTimeZone", key="atz", ecs_field="[cef][agent][timezone]"),
        CEFField("agentTranslatedAddress", ecs_field="[cef][agent][nat][ip]"),
        CEFField("agentTranslatedZoneExternalID", ecs_field="[cef][agent][translated_zone][external_id]"),
        CEFField("agentTranslatedZoneURI", ecs_field="[cef][agent][translated_zone][uri]"),
        CEFField("agentType", key="at", ecs_field="[agent][type]"),
        CEFField("agentVersion", key="av", ecs_field="[agent][version]"),
        CEFField("agentZoneExternalID", ecs_field="[cef][agent][zone][external_id]"),
        CEFField("agentZoneURI", ecs_field="[cef][agent][zone][uri]"),
        CEFField("applicationProtocol", key="app", ecs_field="[network][protocol]"),
        CEFField("baseEventCount", key="cnt", ecs_field="[cef][base_event_count]"),
        CEFField("bytesIn", key="in", ecs_field="[source][bytes]"),
        CEFField("bytesOut", key="out", ecs_field="[destination][bytes]"),
        CEFField("categoryDeviceType", key="catdt", ecs_field="[cef][device_type]"),
        CEFField("customerExternalID", ecs_field="[organization][id]"),
        CEFField("customerURI", ecs_field="[organization][name]"),
        CEFField("destinationAddress", key="dst", ecs_field="[destination][ip]"),
        CEFField("destinationDnsDomain", ecs_field="[destination][registered_domain]", priority=10),
        CEFField("destinationGeoLatitude", key="dlat", ecs_field="[destination][geo][location][lat]",
                 legacy="destinationLatitude"),
        CEFField("destinationGeoLongitude", key="dlong", ecs_field="[destination][geo][location][lon]",
                 legacy="destinationLongitude"),
        CEFField("destinationHostName", key="dhost", ecs_field="[destination][domain]"),
        CEFField("destinationMacAddress", key="dmac", ecs_field="[destination][mac]"),
        CEFField("destinationNtDomain", key="dntdom", ecs_field="[destination][registered_domain]"),
        CEFField("destinationPort", key="dpt", ecs_field="[destination][port]"),
        CEFField("destinationProcessId", key="dpid", ecs_field="[destination][process][pid]"),
        CEFField("destinationProcessName", key="dproc", ecs_field="[destination][process][name]"),
        CEFField("destinationServiceName", ecs_field="[destination][service][name]"),
        CEFField("destinationTranslatedAddress", ecs_field="[destination][nat][ip]"),
        CEFField("destinationTranslatedPort", ecs_field="[destination][nat][port]"),
        CEFField("destinationTranslatedZoneExternalID",
                 ecs_field="[cef][destination][translated_zone][external_id]"),
        CEFField("destinationTranslatedZoneURI", ecs_field="[cef][destination][translated_zone][uri]"),
        CEFField("destinationUserId", key="duid", ecs_field="[destination][user][id]"),
        CEFField("destinationUserName", key="duser", ecs_field="[destination][user][name]"),
        CEFField("destinationUserPrivileges", key="dpriv", ecs_field="[destination][user][group][name]"),
        CEFField("destinationZoneExternalID", ecs_field="[cef][destination][zone][external_id]"),
        CEFField("destinationZoneURI", ecs_field="[cef][destination][zone][uri]"),
        CEFField("deviceAction", key="act", ecs_field="[event][action]"),
        CEFField("deviceAddress", key="dvc", ecs_field=f"[{dv}][ip]"),
        *_numbered_custom_fields(),
        CEFField("deviceDirection", ecs_field="[network][direction]"),
        CEFField("deviceDnsDomain", ecs_field=f"[{dv}][registered_domain]", priority=10),
        CEFField("deviceEventCategory", key="cat", ecs_field="[cef][category]"),
        CEFField("deviceExternalId",
                 ecs_field=("[host][id]" if dv == "host" else "[observer][name]")),
        CEFField("deviceFacility", ecs_field="[log][syslog][facility][code]"),
        CEFField("deviceHostName", key="dvchost",
                 ecs_field=("[host][name]" if dv == "host" else "[observer][hostname]")),
        CEFField("deviceInboundInterface", ecs_field="[observer][ingress][interface][name]"),
        CEFField("deviceMacAddress", key="dvcmac", ecs_field=f"[{dv}][mac]"),
        CEFField("deviceNtDomain", ecs_field="[cef][nt_domain]"),
        CEFField("deviceOutboundInterface", ecs_field="[observer][egress][interface][name]"),
        CEFField("devicePayloadId", ecs_field="[cef][payload_id]"),
        CEFField("deviceProcessId", key="dvcpid", ecs_field="[process][pid]"),
        CEFField("deviceProcessName", ecs_field="[process][name]"),
        CEFField("deviceReceiptTime", key="rt", ecs_field="@timestamp", is_timestamp=True),
        CEFField("deviceTimeZone", key="dtz", ecs_field="[event][timezone]",
                 legacy="destinationTimeZone"),
        CEFField("deviceTranslatedAddress", ecs_field="[host][nat][ip]"),
        CEFField("deviceTranslatedZoneExternalID", ecs_field="[cef][translated_zone][external_id]"),
        CEFField("deviceTranslatedZoneURI", ecs_field="[cef][translated_zone][uri]"),
        CEFField("deviceVersion", ecs_field="[observer][version]"),
        CEFField("deviceZoneExternalID", ecs_field="[cef][zone][external_id]"),
        CEFField("deviceZoneURI", ecs_field="[cef][zone][uri]"),
        CEFField("endTime", key="end", ecs_field="[event][end]", is_timestamp=True),
        CEFField("eventId", ecs_field="[event][id]"),
        CEFField("eventOutcome", key="outcome", ecs_field="[event][outcome]"),
        CEFField("externalId", ecs_field="[cef][external_id]"),
        CEFField("fileCreateTime", ecs_field="[file][created]"),  # NOT timestamp-flagged (cef.rb:502)
        CEFField("fileHash", ecs_field="[file][hash]"),
        CEFField("fileId", ecs_field="[file][inode]"),
        CEFField("fileModificationTime", ecs_field="[file][mtime]", is_timestamp=True),
        CEFField("fileName", key="fname", ecs_field="[file][name]"),
        CEFField("filePath", ecs_field="[file][path]"),
        CEFField("filePermission", ecs_field="[file][group]"),
        CEFField("fileSize", key="fsize", ecs_field="[file][size]"),
        CEFField("fileType", ecs_field="[file][extension]"),
        CEFField("managerReceiptTime", key="mrt", ecs_field="[event][ingested]", is_timestamp=True),
        CEFField("message", key="msg", ecs_field="[message]"),
        CEFField("oldFileCreateTime", ecs_field="[cef][old_file][created]", is_timestamp=True),
        CEFField("oldFileHash", ecs_field="[cef][old_file][hash]"),
        CEFField("oldFileId", ecs_field="[cef][old_file][inode]"),
        CEFField("oldFileModificationTime", ecs_field="[cef][old_file][mtime]", is_timestamp=True),
        CEFField("oldFileName", ecs_field="[cef][old_file][name]"),
        CEFField("oldFilePath", ecs_field="[cef][old_file][path]"),
        CEFField("oldFilePermission", ecs_field="[cef][old_file][group]"),
        CEFField("oldFileSize", ecs_field="[cef][old_file][size]"),
        CEFField("oldFileType", ecs_field="[cef][old_file][extension]"),
        CEFField("rawEvent", ecs_field="[event][original]"),
        CEFField("Reason", key="reason", ecs_field="[event][reason]"),
        CEFField("requestClientApplication", ecs_field="[user_agent][original]"),
        CEFField("requestContext", ecs_field="[http][request][referrer]"),
        CEFField("requestCookies", ecs_field="[cef][request][cookies]"),
        CEFField("requestMethod", ecs_field="[http][request][method]"),
        CEFField("requestUrl", key="request", ecs_field="[url][original]"),
        CEFField("sourceAddress", key="src", ecs_field="[source][ip]"),
        CEFField("sourceDnsDomain", ecs_field="[source][registered_domain]", priority=10),
        CEFField("sourceGeoLatitude", key="slat", ecs_field="[source][geo][location][lat]",
                 legacy="sourceLatitude"),
        CEFField("sourceGeoLongitude", key="slong", ecs_field="[source][geo][location][lon]",
                 legacy="sourceLongitude"),
        CEFField("sourceHostName", key="shost", ecs_field="[source][domain]"),
        CEFField("sourceMacAddress", key="smac", ecs_field="[source][mac]"),
        CEFField("sourceNtDomain", key="sntdom", ecs_field="[source][registered_domain]"),
        CEFField("sourcePort", key="spt", ecs_field="[source][port]"),
        CEFField("sourceProcessId", key="spid", ecs_field="[source][process][pid]"),
        CEFField("sourceProcessName", key="sproc", ecs_field="[source][process][name]"),
        CEFField("sourceServiceName", ecs_field="[source][service][name]"),
        CEFField("sourceTranslatedAddress", ecs_field="[source][nat][ip]"),
        CEFField("sourceTranslatedPort", ecs_field="[source][nat][port]"),
        CEFField("sourceTranslatedZoneExternalID", ecs_field="[cef][source][translated_zone][external_id]"),
        CEFField("sourceTranslatedZoneURI", ecs_field="[cef][source][translated_zone][uri]"),
        CEFField("sourceUserId", key="suid", ecs_field="[source][user][id]"),
        CEFField("sourceUserName", key="suser", ecs_field="[source][user][name]"),
        CEFField("sourceUserPrivileges", key="spriv", ecs_field="[source][user][group][name]"),
        CEFField("sourceZoneExternalID", ecs_field="[cef][source][zone][external_id]"),
        CEFField("sourceZoneURI", ecs_field="[cef][source][zone][uri]"),
        CEFField("startTime", key="start", ecs_field="[event][start]", is_timestamp=True),
        CEFField("transportProtocol", key="proto", ecs_field="[network][transport]"),
        CEFField("type", ecs_field="[cef][type]"),
    ]
    return fields


# Ordered header field names (cef.rb:359-372): 7 pipe-terminated header fields
# plus the syslog-prelude field name, per compatibility mode.
HEADER_FIELDS = {
    "disabled": [
        "cefVersion", "deviceVendor", "deviceProduct", "deviceVersion",
        "deviceEventClassId", "name", "severity",
    ],
    "v1": [
        "[cef][version]", "[observer][vendor]", "[observer][product]",
        "[observer][version]", "[event][code]", "[cef][name]", "[event][severity]",
    ],
}
SYSLOG_HEADER = {"disabled": "syslog", "v1": "[log][syslog][header]"}

# Physical Spark column names for the 7 headers (mode-independent; the
# mode-specific logical names above are views over these).
HEADER_COLUMNS = HEADER_FIELDS["disabled"]

PARSE_FAILURE_TAG = "_cefparsefailure"


class Mappings:
    """Frozen decode/encode lookup tables for one (ecs_mode, reverse, device) config.

    Reproduces the priority-sorted table construction at cef.rb:552-571:
    entries are applied in ascending priority order so the highest-priority
    field overwrites (wins) the shared encode slot.
    """

    def __init__(self, ecs_mode: bool = False, reverse_mapping: bool = False,
                 device: str = "observer"):
        self.ecs_mode = ecs_mode
        self.reverse_mapping = reverse_mapping
        self.device = device

        decode_map: dict[str, str] = {}
        encode_map: dict[str, str] = {}
        timestamp_fields: set[str] = set()

        # Python's sort is stable, like Ruby's sort_by (cef.rb:552).
        for f in sorted(cef_fields(device), key=lambda f: f.priority):
            field_name = f.ecs if ecs_mode else f.name

            # key or long name -> canonical field name (cef.rb:556-557)
            decode_map[f.cef_key] = field_name
            decode_map[f.name] = field_name

            # field name or long name -> encode target (cef.rb:559-562)
            target = f.cef_key if reverse_mapping else f.name
            encode_map[field_name] = target
            if f.name != field_name:
                encode_map[f.name] = target

            # legacy alias pass-through (cef.rb:564-568)
            if f.legacy:
                decode_map[f.legacy] = f.ecs if ecs_mode else f.legacy
                encode_map[f.legacy] = f.cef_key if reverse_mapping else f.legacy

            if ecs_mode and f.is_timestamp:
                timestamp_fields.add(field_name)

        self.decode_map = decode_map
        self.encode_map = encode_map
        self.timestamp_fields = frozenset(timestamp_fields)
        self.header_fields = HEADER_FIELDS["v1" if ecs_mode else "disabled"]
        self.syslog_header = SYSLOG_HEADER["v1" if ecs_mode else "disabled"]
        # side-channel timezone field consulted during ECS timestamp
        # normalization (cef.rb:309)
        self.device_timezone_field = "[event][timezone]" if ecs_mode else "deviceTimeZone"


_CACHE: dict[tuple, Mappings] = {}


def get_mappings(ecs_mode: bool = False, reverse_mapping: bool = False,
                 device: str = "observer") -> Mappings:
    """Cached Mappings (built once per executor process, like the reference's
    init-time generate_mappings!, cef.rb:206-207)."""
    k = (ecs_mode, reverse_mapping, device)
    if k not in _CACHE:
        _CACHE[k] = Mappings(*k)
    return _CACHE[k]
