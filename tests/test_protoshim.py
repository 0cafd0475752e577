"""Vendored protobuf shim: wire-format pins against HAND-COMPUTED
bytes (the protobuf encoding spec), descriptor parsing of pyspark's
real StateMessage_pb2, and round trips. The e2e proof is
tests/test_streaming.py::test_tws_stamp_matches_stateful_stamp — the
JVM state server parses our bytes and we parse its."""

from __future__ import annotations

import pytest

from pg2kinesis_spark.vendor import install_protobuf_shim

install_protobuf_shim()

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_varint_and_scalar_wire_format():
    # StateResponse{statusCode: 150} -> field 1 varint: 08 96 01 (spec example)
    r = sm.StateResponse(statusCode=150)
    assert r.SerializeToString() == bytes.fromhex("089601")
    # string field: errorMessage "testing" -> 12 07 74 65 73 74 69 6e 67
    r2 = sm.StateResponse(errorMessage="testing")
    assert r2.SerializeToString() == bytes.fromhex("120774657374696e67")
    # proto3: defaults are not serialized
    assert sm.StateResponse(statusCode=0, errorMessage="").SerializeToString() == b""


def test_nested_and_enum_wire_format():
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.DATA_PROCESSED)
        )
    )
    # field2(len 4){ field1(len 2){ field1 varint 3 } }
    assert req.SerializeToString() == bytes.fromhex("12040a020803")


def test_parse_from_jvm_style_bytes():
    resp = sm.StateResponse()
    resp.ParseFromString(bytes.fromhex("089601120568656c6c6f1a03010203"))
    assert resp.statusCode == 150
    assert resp.errorMessage == "hello"
    assert resp.value == b"\x01\x02\x03"
    # unknown fields are skipped, not fatal
    resp2 = sm.StateResponse()
    resp2.ParseFromString(bytes.fromhex("089601") + bytes.fromhex("f20104deadbeef"))
    assert resp2.statusCode == 150


def test_attribute_set_and_submessage_vivify():
    cmd = sm.StateCallCommand()
    cmd.stateName = "cur_xact"
    cmd.schema = "s"
    cmd.ttl.durationMs = 1234
    data = cmd.SerializeToString()
    back = sm.StateCallCommand()
    back.ParseFromString(data)
    assert back.stateName == "cur_xact"
    assert back.ttl.durationMs == 1234
    assert back.HasField("ttl")


def test_repeated_fields_roundtrip():
    resp = sm.StateResponseWithListGet(value=[b"a", b"bb"], requireNextFetch=True)
    back = sm.StateResponseWithListGet()
    back.ParseFromString(resp.SerializeToString())
    assert list(back.value) == [b"a", b"bb"]
    assert back.requireNextFetch is True
    it = sm.StateResponseWithMapIterator()
    it.ParseFromString(
        sm.StateResponseWithMapIterator(
            kvPair=[sm.KeyAndValuePair(key=b"k", value=b"v")]
        ).SerializeToString()
    )
    assert len(it.kvPair) == 1 and it.kvPair[0].key == b"k" and it.kvPair[0].value == b"v"


def test_whichoneof_and_negative_int64():
    req = sm.StateRequest(timerRequest=sm.TimerRequest())
    assert req.WhichOneof("method") == "timerRequest"
    # int64 negatives encode as 10-byte two's-complement varints
    t = sm.RegisterTimer(expiryTimestampMs=-1)
    back = sm.RegisterTimer()
    back.ParseFromString(t.SerializeToString())
    assert back.expiryTimestampMs == -1


def _mk_cls(fields):
    """Build a shim message class from (name, number, label, type) specs."""
    from pg2kinesis_spark.vendor.protoshim.google.protobuf.internal import wire

    m = wire.MsgDesc()
    m.name = m.full_name = "T"
    for name, number, label, typ in fields:
        f = wire.FieldDesc()
        f.name, f.number, f.label, f.type = name, number, label, typ
        m.fields.append(f)
    fd = wire.FileDesc()
    fd.messages = [m]
    classes, _ = wire.build_classes(fd)
    return classes["T"]


def test_fixed_width_scalars_are_unsigned_on_the_wire():
    from pg2kinesis_spark.vendor.protoshim.google.protobuf.internal import wire as W

    cls = _mk_cls(
        [
            ("f64", 1, W.L_OPTIONAL, W.T_FIXED64),
            ("f32", 2, W.L_OPTIONAL, W.T_FIXED32),
            ("s64", 3, W.L_OPTIONAL, W.T_SFIXED64),
            ("s32", 4, W.L_OPTIONAL, W.T_SFIXED32),
        ]
    )
    # fixed64/fixed32 are uint on the wire: top-bit-set values must
    # serialize (old '<q'/'<i' packing crashed) and parse back unsigned
    m = cls(f64=2**63 + 5, f32=2**31 + 7, s64=-1, s32=-2)
    data = m.SerializeToString()
    assert bytes.fromhex("09") + (2**63 + 5).to_bytes(8, "little") in data
    back = cls()
    back.ParseFromString(data)
    assert back.f64 == 2**63 + 5
    assert back.f32 == 2**31 + 7
    assert back.s64 == -1 and back.s32 == -2


def test_packed_repeated_fixed_and_zigzag_scalars():
    import struct

    from pg2kinesis_spark.vendor.protoshim.google.protobuf.internal import wire as W

    cls = _mk_cls(
        [
            ("ds", 1, W.L_REPEATED, W.T_DOUBLE),
            ("fs", 2, W.L_REPEATED, W.T_FLOAT),
            ("u64s", 3, W.L_REPEATED, W.T_FIXED64),
            ("zs", 4, W.L_REPEATED, W.T_SINT64),
            ("bs", 5, W.L_REPEATED, W.T_BOOL),
        ]
    )
    # proto3 packs repeated scalars by default: a length-delimited record
    # must decode element-wise, not vanish into the malformed-skip branch
    payload = struct.pack("<2d", 1.5, -2.25)
    data = bytes([0x0A, len(payload)]) + payload
    payload = struct.pack("<2f", 3.0, 4.5)
    data += bytes([0x12, len(payload)]) + payload
    payload = struct.pack("<Q", 2**63 + 1)
    data += bytes([0x1A, len(payload)]) + payload
    data += bytes([0x22, 0x02, 0x03, 0x04])  # zigzag: 3 -> -2, 4 -> 2
    data += bytes([0x2A, 0x02, 0x01, 0x00])
    m = cls()
    m.ParseFromString(data)
    assert list(m.ds) == [1.5, -2.25]
    assert list(m.fs) == [3.0, 4.5]
    assert list(m.u64s) == [2**63 + 1]
    assert list(m.zs) == [-2, 2]
    assert list(m.bs) == [True, False]
    # the shim's own (unpacked) serialization of the same values round-trips
    back = cls()
    back.ParseFromString(m.SerializeToString())
    assert back == m
    # truncated packed payload is a DecodeError, not silent data loss
    bad = cls()
    with pytest.raises(W.DecodeError):
        bad.ParseFromString(bytes([0x0A, 0x07]) + b"\x00" * 7)


def test_real_runtime_wins_when_present():
    import google.protobuf as gp

    # in this environment the shim IS the provider; the installer must
    # report which one is active truthfully
    active = install_protobuf_shim()
    is_shim = "protoshim" in (getattr(gp, "__file__", "") or "")
    assert active == is_shim


def test_pure_read_does_not_mark_presence():
    # real-runtime contract: reading an unset submessage auto-vivifies
    # a child but does NOT set presence; the first MUTATION does
    cmd = sm.StateCallCommand()
    assert cmd.ttl.durationMs == 0  # pure read
    assert not cmd.HasField("ttl")
    assert cmd.SerializeToString() == b""  # no empty submessage on the wire
    cmd.ttl.durationMs = 7  # write-through promotes the chain
    assert cmd.HasField("ttl")
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 7


def test_nested_chain_promotion_and_repeated_on_lazy_child():
    req = sm.StateRequest()
    # deep pure read: nothing becomes present
    _ = req.statefulProcessorCall.getValueState.stateName
    assert not req.HasField("statefulProcessorCall")
    assert req.SerializeToString() == b""
    # deep write promotes every level
    req.statefulProcessorCall.getValueState.stateName = "x"
    assert req.HasField("statefulProcessorCall")
    assert req.statefulProcessorCall.HasField("getValueState")
    # repeated append on a lazily-vivified child also promotes
    it = sm.StateResponseWithMapIterator()
    pair = it.kvPair.add(key=b"k", value=b"v")
    assert pair.key == b"k"
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(it.SerializeToString())
    assert len(back.kvPair) == 1 and back.kvPair[0].key == b"k"


def test_oneof_default_value_keeps_presence_on_the_wire():
    from pg2kinesis_spark.vendor.protoshim.google.protobuf.internal import wire as W

    m = W.MsgDesc()
    m.name = m.full_name = "O"
    m.oneofs = ["pick"]
    for name, number, typ in (("a", 1, W.T_INT32), ("b", 2, W.T_STRING)):
        f = W.FieldDesc()
        f.name, f.number, f.label, f.type = name, number, W.L_OPTIONAL, typ
        f.oneof_index = 0
        m.fields.append(f)
    fd = W.FileDesc()
    fd.messages = [m]
    cls, _ = W.build_classes(fd)
    cls = cls["O"]

    msg = cls()
    msg.a = 0  # oneof member at its default value: presence must survive
    assert msg.WhichOneof("pick") == "a"
    data = msg.SerializeToString()
    assert data == bytes.fromhex("0800")  # field 1 varint 0 IS emitted
    back = cls()
    back.ParseFromString(data)
    assert back.WhichOneof("pick") == "a"
    # setting the sibling clears the first member (single-armed oneof)
    msg.b = "hi"
    assert msg.WhichOneof("pick") == "b"
    assert not msg.HasField("a")
    # last-wins when both arms appear on the wire
    both = cls()
    both.ParseFromString(bytes.fromhex("0805") + bytes.fromhex("12026869"))
    assert both.WhichOneof("pick") == "b"


def test_repeated_add_works_after_parse_and_assignment():
    # every access path must yield the notifying container: parse-then-
    # add and assign-then-add both work like the real runtime
    it = sm.StateResponseWithMapIterator()
    it.kvPair.add(key=b"a", value=b"1")
    parsed = sm.StateResponseWithMapIterator()
    parsed.ParseFromString(it.SerializeToString())
    parsed.kvPair.add(key=b"b", value=b"2")  # add() after parse
    assert [p.key for p in parsed.kvPair] == [b"a", b"b"]
    assigned = sm.StateResponseWithMapIterator()
    assigned.kvPair = [sm.KeyAndValuePair(key=b"c", value=b"3")]
    assigned.kvPair.add(key=b"d", value=b"4")  # add() after assignment
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(assigned.SerializeToString())
    assert [p.key for p in back.kvPair] == [b"c", b"d"]
