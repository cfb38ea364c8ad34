"""Property tests for the MARC codec (SURVEY.md §5.4: round-trip
properties for the parse/serialize pair). Pure-Python — no Spark session
— so hypothesis can run hundreds of examples cheaply.

Invariants:
- from_iso2709(to_iso2709(r)) == r (field order, indicators, subfield
  order and values all preserved; ISO 2709 is lossless for ≤99,999-byte
  records).
- from_marcxml(to_marcxml(r)) == r likewise.
- iter_iso2709 over concatenated records recovers each record in order
  (the SRC-3 binary-scan contract).
"""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from alma_publish_to_marc_spark.sources import marclib

# MARC-legal building blocks: tags are 3 chars (control 00X handled
# separately), values exclude the ISO 2709 delimiters (1D/1E/1F are
# structural and may not appear in data per the spec).
# Cc excluded too: C0 controls are unrepresentable in XML 1.0, so the
# XML round-trip can't promise them (the reference's pymarc XML path has
# the same limit); ISO 2709 only reserves 1D/1E/1F.
_value_alpha = st.text(
    alphabet=st.characters(
        blacklist_characters="\x1d\x1e\x1f",
        blacklist_categories=("Cs", "Cc"),
    ),
    min_size=0, max_size=40)
_code = st.sampled_from(list(string.ascii_lowercase + string.digits))
_data_tag = st.sampled_from(["010", "100", "245", "260", "300", "500",
                             "852", "909", "BIB", "ITM", "AVE"])
_ctrl_tag = st.sampled_from(["001", "003", "005", "007", "008"])
_ind = st.sampled_from([" ", "0", "1", "9"])

_subfield = st.fixed_dictionaries({"code": _code, "value": _value_alpha})
_data_field = st.fixed_dictionaries({
    "tag": _data_tag, "ind1": _ind, "ind2": _ind,
    "subfields": st.lists(_subfield, min_size=0, max_size=4),
})
_control_field = st.fixed_dictionaries({"tag": _ctrl_tag,
                                        "data": _value_alpha})

_record = st.builds(
    lambda ctrl, flds: {
        "mms_id": None,
        "leader": "00000cam a2200000 a 4500",
        "control_fields": ctrl,
        "fields": flds,
        "source_file": None,
    },
    st.lists(_control_field, min_size=0, max_size=4),
    st.lists(_data_field, min_size=0, max_size=6),
)


def _canon(rec: dict) -> tuple:
    """Comparable projection: what the codec promises to preserve.
    Leader positions 0-4 (record length) and 12-16 (base address) are
    computed during serialization per ISO 2709, so they're masked."""
    ldr = rec["leader"]
    return (
        "#####" + ldr[5:12] + "#####" + ldr[17:24],
        tuple((c["tag"], c["data"]) for c in rec["control_fields"]),
        tuple((f["tag"], f["ind1"], f["ind2"],
               tuple((s["code"], s["value"]) for s in f["subfields"]))
              for f in rec["fields"]),
    )


@settings(max_examples=200, deadline=None)
@given(_record)
def test_iso2709_roundtrip(rec):
    back = marclib.from_iso2709(marclib.to_iso2709(rec))
    assert _canon(back) == _canon(rec)


@settings(max_examples=200, deadline=None)
@given(_record)
def test_marcxml_roundtrip(rec):
    back = marclib.from_marcxml(marclib.to_marcxml(rec).encode("utf-8"))
    assert len(back) == 1
    assert _canon(back[0]) == _canon(rec)


@settings(max_examples=50, deadline=None)
@given(st.lists(_record, min_size=1, max_size=5))
def test_iso2709_stream_recovers_each_record(recs):
    stream = b"".join(marclib.to_iso2709(r) for r in recs)
    back = marclib.iter_iso2709(stream)
    assert [_canon(r) for r in back] == [_canon(r) for r in recs]


@settings(max_examples=100, deadline=None)
@given(_record)
def test_iso2709_length_header_is_exact(rec):
    blob = marclib.to_iso2709(rec)
    assert int(blob[0:5]) == len(blob)
    assert blob.endswith(marclib.RT)
