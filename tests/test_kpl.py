"""KPL aggregated-record wire format tests.

The reference ships aggregates in the aws_kinesis_agg format
(reference stream.py:16,36): magic + protobuf AggregatedRecord + md5.
These tests pin that a consumer-side deaggregator can read the sink's
bytes — round-trip, hand-computed golden bytes, checksum rejection, and
the exact on-wire Data blob through the boto3 transport.
"""

from __future__ import annotations

import hashlib

import pytest

from pg2kinesis_spark.sinks.kinesis import AggRecord
from pg2kinesis_spark.sinks.kpl import KPL_MAGIC, deaggregate_kpl, serialize_kpl


def test_round_trip_preserves_messages_and_keys():
    records = [("42", b"0,CDC,42,public.t,insert,1"), ("42", b"m2"), ("43", b"m3"), ("", b"")]
    assert deaggregate_kpl(serialize_kpl(records)) == records


def test_golden_bytes_single_record():
    """Hand-derived protobuf: key table entry '1' (tag 0x0A), one Record
    (tag 0x1A) holding pk_index=0 (tag 0x08) and data b'a' (tag 0x1A)."""
    payload = b"\x0a\x011" + b"\x1a\x05\x08\x00\x1a\x01a"
    expected = KPL_MAGIC + payload + hashlib.md5(payload).digest()
    assert serialize_kpl([("1", b"a")]) == expected


def test_partition_key_table_dedup():
    blob = serialize_kpl([("k", b"a"), ("k", b"b"), ("k", b"c")])
    # one table entry, not three: 'k' appears exactly once in the payload
    assert blob[4:-16].count(b"\x0a\x01k") == 1
    assert deaggregate_kpl(blob) == [("k", b"a"), ("k", b"b"), ("k", b"c")]


def test_bad_magic_and_checksum_rejected():
    blob = serialize_kpl([("1", b"a")])
    with pytest.raises(ValueError, match="bad magic"):
        deaggregate_kpl(b"XXXX" + blob[4:])
    tampered = blob[:-16] + b"\x00" * 16
    with pytest.raises(ValueError, match="checksum"):
        deaggregate_kpl(tampered)


def test_varint_lengths_above_127_bytes():
    big = b"x" * 300  # forces multi-byte varint lengths
    records = [("key-longer-than-a-varint-boundary" * 5, big)] * 3
    assert deaggregate_kpl(serialize_kpl(records)) == records


def test_agg_record_serializes_per_message_keys():
    rec = AggRecord()
    rec.add(b"m1", "42", 1 << 20)
    rec.add(b"m2", "43", 1 << 20)
    assert rec.partition_key == "42"  # aggregate key = first record's key
    assert deaggregate_kpl(rec.serialize()) == [("42", b"m1"), ("43", b"m2")]


def test_boto_transport_receives_kpl_wire_bytes():
    """On-wire shape through the real boto3 client (Stubber): the Data
    blob is the exact KPL aggregate, PartitionKey is the first message's
    xid, SequenceNumberForOrdering stays '0' (fidelity §8.10)."""
    boto3 = pytest.importorskip("boto3")
    from botocore.stub import Stubber

    from pg2kinesis_spark.sinks.kinesis import InMemoryTransport, KinesisLikeWriter  # noqa: F401
    from pg2kinesis_spark.sinks.kinesis_boto import BotoKinesisTransport

    c = boto3.client(
        "kinesis", region_name="us-east-1",
        aws_access_key_id="x", aws_secret_access_key="y",
    )
    ACTIVE = {
        "StreamDescription": {
            "StreamName": "s",
            "StreamARN": "arn:aws:kinesis:us-east-1:1:stream/s",
            "StreamStatus": "ACTIVE",
            "Shards": [],
            "HasMoreShards": False,
            "RetentionPeriodHours": 24,
            "StreamCreationTimestamp": 0,
            "EnhancedMonitoring": [],
        }
    }
    expected_blob = serialize_kpl([("7", b"m1"), ("7", b"m2")])
    with Stubber(c) as stub:
        stub.add_response("create_stream", {}, {"StreamName": "s", "ShardCount": 1})
        stub.add_response("describe_stream", ACTIVE, {"StreamName": "s"})
        transport = BotoKinesisTransport("s", client=c)
        stub.add_response(
            "put_record",
            {"ShardId": "shardId-0", "SequenceNumber": "1"},
            {
                "StreamName": "s",
                "Data": expected_blob,
                "PartitionKey": "7",
                "SequenceNumberForOrdering": "0",
            },
        )
        w = KinesisLikeWriter(transport)
        w.put_message("m1", "7")
        w.put_message("m2", "7")
        w.flush_tail()
        stub.assert_no_pending_responses()


def test_kpl_roundtrip_and_size_property():
    """Property check: arbitrary key/payload mixes round-trip through the
    wire format, and AggRecord's size accounting is byte-exact."""
    from hypothesis import given, settings, strategies as st

    payload = st.binary(min_size=0, max_size=400)
    key = st.text(min_size=0, max_size=40)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(key, payload), min_size=1, max_size=30))
    def prop(records):
        blob = serialize_kpl(records)
        assert deaggregate_kpl(blob) == records
        rec = AggRecord()
        for pk, data in records:
            assert rec.add(data, pk, 1 << 30)
        assert len(rec.serialize()) == rec.est_size

    prop()


def test_kpl_boundary_fill_property():
    """Adversarial 1 MiB-style boundary fills: randomized unicode keys and
    payload sizes that straddle the varint breakpoints (0x7B/0x7C fast
    path, 0x7F/0x80 one->two byte varints). Invariants at EVERY step:

    * est_size is byte-exact vs serialize()
    * a full aggregate never serializes past max_bytes
    * every rejection is a genuine overflow — force-appending the
      rejected record would have crossed max_bytes
    """
    from hypothesis import given, settings, strategies as st

    # sizes clustered on the varint/fast-path breakpoints + a random tail
    sizes = st.one_of(
        st.sampled_from([0, 1, 0x7A, 0x7B, 0x7C, 0x7D, 0x7E, 0x7F, 0x80, 0x81, 200]),
        st.integers(min_value=0, max_value=300),
    )
    # keys mixing ascii, multibyte utf-8, and empty — encoded length is
    # what the key-table accounting must charge
    keys = st.one_of(
        st.sampled_from(["", "7", "käy", "键键键", "k" * 130]),
        st.text(min_size=0, max_size=20),
    )
    records = st.lists(st.tuples(keys, sizes), min_size=1, max_size=60)
    caps = st.integers(min_value=25, max_value=2500)

    @settings(max_examples=300, deadline=None)
    @given(records, caps)
    def prop(specs, max_bytes):
        rec = AggRecord()
        accepted = []
        for key, n in specs:
            payload = bytes((i * 7 + n) & 0xFF for i in range(n))
            ok = rec.add(payload, key, max_bytes)
            if ok:
                accepted.append((key, payload))
                assert rec.est_size == len(rec.serialize())  # byte-exact
            else:
                # rejection must be a genuine overflow of the FULL wire
                # format (framing + key-table delta included)
                assert len(serialize_kpl(accepted + [(key, payload)])) > max_bytes
                assert accepted, "first add must always be accepted"
        if accepted:
            blob = rec.serialize()
            assert deaggregate_kpl(blob) == accepted
            # full aggregates never exceed the cap (unless a single
            # oversized first record forced it through)
            if len(accepted) > 1:
                assert len(blob) <= max_bytes

    prop()


def test_agg_incremental_framing_matches_serialize_kpl():
    """AggRecord.add frames records incrementally (r13 opt round);
    serialize() must stay BYTE-identical to serialize_kpl over the same
    (key, message) sequence — fast path, >127-byte messages, >127
    distinct keys (multi-byte idx varints), and repeated keys."""
    from pg2kinesis_spark.sinks.kinesis import AggRecord
    from pg2kinesis_spark.sinks.kpl import serialize_kpl

    agg = AggRecord()
    seq = []
    for i in range(300):  # >0x80 distinct keys forces multi-byte idx
        key = f"xid-{i}"
        for j in range(2):
            msg = (f"m{i}." + "x" * (5 + (i * 7 + j * 131) % 200)).encode()
            assert agg.add(msg, key, 1 << 30)
            seq.append((key, msg))
    # repeated earlier keys after the table grew
    for i in (0, 5, 250):
        msg = f"again{i}".encode()
        assert agg.add(msg, f"xid-{i}", 1 << 30)
        seq.append((f"xid-{i}", msg))
    blob = agg.serialize()
    assert blob == serialize_kpl(seq)
    # and est_size is still the exact serialized size
    assert agg.est_size == len(blob)


def test_agg_two_byte_idx_fast_path_boundaries():
    """The r13 two-byte-idx fast path (seen key, 0x80 <= idx < 0x4000,
    msg_len < 0x7B) must stay byte-identical to serialize_kpl exactly at
    its gate boundaries: idx 0x7F/0x80/0x3FFF/0x4000 and msg_len
    0x7A/0x7B/0x7C — each combination exercises a different branch of
    AggRecord.add."""
    from pg2kinesis_spark.sinks.kinesis import AggRecord
    from pg2kinesis_spark.sinks.kpl import serialize_kpl

    agg = AggRecord()
    seq = []
    n_keys = 0x4001  # key table through idx 0x4000 (three-byte varint)
    for i in range(n_keys):
        msg = b"seed"
        assert agg.add(msg, f"k{i}", 1 << 32)
        seq.append((f"k{i}", msg))
    for idx in (0, 0x7F, 0x80, 0x81, 0x3FFF, 0x4000):
        for mlen in (0, 1, 0x7A, 0x7B, 0x7C, 0x7D, 200):
            msg = bytes((mlen % 251,)) * mlen
            assert agg.add(msg, f"k{idx}", 1 << 32)
            seq.append((f"k{idx}", msg))
    blob = agg.serialize()
    assert blob == serialize_kpl(seq)
    assert agg.est_size == len(blob)
