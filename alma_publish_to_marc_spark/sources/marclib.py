"""Minimal MARC 21 codec: ISO 2709 binary and MARC XML, written from the
public format specifications (no third-party MARC library exists in this
environment). Operates on plain dicts shaped like schemas.PUBLISH_RECORD
rows so it plugs straight into Arrow-batched UDF stages.

ISO 2709 layout: 24-byte leader (0-4 record length, 12-16 base address),
directory of 12-byte entries (tag:3, field length:4, start offset:5),
field data (control: data + FT; variable: ind1 ind2 + (US code value)* +
FT), record terminator RT. Encoded UTF-8. Record cap 99,999 bytes
(ddl constraint mirrored by OP-P9's size guard).

MARC XML: the www.loc.gov/MARC21/slim schema (collection/record/leader/
controlfield/datafield/subfield), namespace-tolerant parsing.
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET

FT = b"\x1e"  # field terminator
RT = b"\x1d"  # record terminator
US = b"\x1f"  # subfield delimiter

MAX_RECORD_BYTES = 99999

CONTROL_TAG_RE = re.compile(r"^00[0-9]$")


def is_control_tag(tag: str) -> bool:
    return bool(CONTROL_TAG_RE.match(tag))


def new_record(mms_id: str | None = None, leader: str = " " * 24,
               source_file: str | None = None) -> dict:
    return {"mms_id": mms_id, "leader": leader, "control_fields": [],
            "fields": [], "source_file": source_file}


# --- ISO 2709 ---------------------------------------------------------------
def to_iso2709(record: dict) -> bytes:
    """Serialize one record dict to ISO 2709 bytes."""
    directory = bytearray()
    body = bytearray()

    def add_entry(tag: str, data: bytes) -> None:
        start = len(body)
        body.extend(data)
        directory.extend(f"{tag:<3.3}{len(data):04d}{start:05d}".encode("ascii"))

    for cf in record.get("control_fields") or []:
        add_entry(cf["tag"], (cf["data"] or "").encode("utf-8") + FT)
    for f in record.get("fields") or []:
        data = bytearray()
        data.extend(((f["ind1"] or " ") + (f["ind2"] or " ")).encode("utf-8"))
        for s in f.get("subfields") or []:
            data.extend(US + (s["code"] or "").encode("utf-8")
                        + (s["value"] or "").encode("utf-8"))
        data.extend(FT)
        add_entry(f["tag"], bytes(data))

    base = 24 + len(directory) + 1
    total = base + len(body) + 1
    leader = (record.get("leader") or " " * 24).ljust(24)[:24]
    leader = f"{total:05d}" + leader[5:12] + f"{base:05d}" + leader[17:]
    return leader.encode("utf-8") + bytes(directory) + FT + bytes(body) + RT


def from_iso2709(data: bytes) -> dict:
    """Parse one ISO 2709 record."""
    leader = data[:24].decode("utf-8")
    base = int(leader[12:17])
    rec = new_record(leader=leader)
    directory = data[24:base - 1]
    for i in range(0, len(directory) - 11, 12):
        tag = directory[i:i + 3].decode("ascii")
        length = int(directory[i + 3:i + 7])
        start = int(directory[i + 7:i + 12])
        fdata = data[base + start: base + start + length]
        if fdata.endswith(FT):
            fdata = fdata[:-1]
        if is_control_tag(tag):
            rec["control_fields"].append(
                {"tag": tag, "data": fdata.decode("utf-8")})
        else:
            text = fdata.decode("utf-8")
            ind1, ind2 = (text[0] if text else " "), (text[1:2] or " ")
            subs = []
            for chunk in text[2:].split(US.decode()):
                if chunk:
                    subs.append({"code": chunk[0], "value": chunk[1:]})
            rec["fields"].append({"tag": tag, "ind1": ind1, "ind2": ind2,
                                  "subfields": subs})
    rec["mms_id"] = _first_control(rec, "001")
    return rec


def iter_iso2709(stream: bytes) -> list[dict]:
    """Split a concatenated .mrc byte stream into records (each ends RT)."""
    out = []
    pos = 0
    while pos + 24 <= len(stream):
        try:
            total = int(stream[pos:pos + 5])
        except ValueError:
            break
        out.append(from_iso2709(stream[pos:pos + total]))
        pos += total
    return out


def _first_control(rec: dict, tag: str) -> str | None:
    for cf in rec["control_fields"]:
        if cf["tag"] == tag:
            return cf["data"]
    return None


# --- MARC XML ---------------------------------------------------------------
def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def from_marcxml(xml_bytes: bytes, source_file: str | None = None) -> list[dict]:
    """Parse a MARC XML collection (or single record) into record dicts."""
    root = ET.fromstring(xml_bytes)
    nodes = [root] if _local(root.tag) == "record" else [
        el for el in root.iter() if _local(el.tag) == "record"]
    records = []
    for node in nodes:
        rec = new_record(source_file=source_file)
        for el in node:
            name = _local(el.tag)
            if name == "leader":
                rec["leader"] = el.text or ""
            elif name == "controlfield":
                rec["control_fields"].append(
                    {"tag": el.get("tag"), "data": el.text or ""})
            elif name == "datafield":
                subs = [{"code": s.get("code"), "value": s.text or ""}
                        for s in el if _local(s.tag) == "subfield"]
                rec["fields"].append({
                    "tag": el.get("tag"),
                    "ind1": el.get("ind1", " ") or " ",
                    "ind2": el.get("ind2", " ") or " ",
                    "subfields": subs,
                })
        rec["mms_id"] = _first_control(rec, "001")
        records.append(rec)
    return records


def to_marcxml(record: dict, namespace: bool = True) -> str:
    """Serialize one record dict to a MARC XML <record> string
    (SRC-16; the reference stores this in bib_marc_xml.marc_xml)."""
    ns = ' xmlns="http://www.loc.gov/MARC21/slim"' if namespace else ""
    buf = io.StringIO()
    buf.write(f"<record{ns}>")
    buf.write(f"<leader>{_esc(record.get('leader') or '')}</leader>")
    for cf in record.get("control_fields") or []:
        buf.write(f'<controlfield tag="{cf["tag"]}">{_esc(cf["data"] or "")}'
                  "</controlfield>")
    for f in record.get("fields") or []:
        buf.write(f'<datafield tag="{f["tag"]}" ind1="{_esc(f["ind1"] or " ")}"'
                  f' ind2="{_esc(f["ind2"] or " ")}">')
        for s in f.get("subfields") or []:
            buf.write(f'<subfield code="{_esc(s["code"] or "")}">'
                      f'{_esc(s["value"] or "")}</subfield>')
        buf.write("</datafield>")
    buf.write("</record>")
    return buf.getvalue()


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;").replace('"', "&quot;"))
