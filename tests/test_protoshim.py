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


def test_real_runtime_wins_when_present():
    import google.protobuf as gp

    # in this environment the shim IS the provider; the installer must
    # report which one is active truthfully
    active = install_protobuf_shim()
    is_shim = "protoshim" in (getattr(gp, "__file__", "") or "")
    assert active == is_shim
