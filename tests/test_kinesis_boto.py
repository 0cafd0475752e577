"""Offline tests of the boto3 Kinesis transport via botocore Stubber —
pins the reference's AWS behavior mapping (stream.py:14-30, 57-66):
create-or-tolerate, waiter, ordering constant, throughput→backoff."""

from __future__ import annotations

import pytest

boto3 = pytest.importorskip("boto3")
from botocore.stub import Stubber  # noqa: E402

from pg2kinesis_spark.sinks.kinesis import ProvisionedThroughputExceeded  # noqa: E402
from pg2kinesis_spark.sinks.kinesis_boto import BotoKinesisTransport  # noqa: E402

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


def _client():
    return boto3.client(
        "kinesis", region_name="us-east-1",
        aws_access_key_id="x", aws_secret_access_key="y",
    )


def test_create_then_wait():
    c = _client()
    with Stubber(c) as stub:
        stub.add_response("create_stream", {}, {"StreamName": "s", "ShardCount": 1})
        stub.add_response("describe_stream", ACTIVE, {"StreamName": "s"})
        BotoKinesisTransport("s", client=c)
        stub.assert_no_pending_responses()


def test_existing_stream_tolerated():
    # ResourceInUseException swallowed (reference stream.py:21-25)
    c = _client()
    with Stubber(c) as stub:
        stub.add_client_error("create_stream", "ResourceInUseException")
        stub.add_response("describe_stream", ACTIVE, {"StreamName": "s"})
        BotoKinesisTransport("s", client=c)


def test_other_create_errors_raise():
    c = _client()
    with Stubber(c) as stub:
        stub.add_client_error("create_stream", "AccessDeniedException")
        with pytest.raises(Exception, match="AccessDenied"):
            BotoKinesisTransport("s", client=c)


def test_put_record_params_and_throughput_mapping():
    c = _client()
    with Stubber(c) as stub:
        stub.add_response("create_stream", {}, {"StreamName": "s", "ShardCount": 1})
        stub.add_response("describe_stream", ACTIVE, {"StreamName": "s"})
        t = BotoKinesisTransport("s", client=c)
        # exact put shape incl. the constant SequenceNumberForOrdering='0'
        # (reference stream.py:57-60, fidelity §8.10)
        stub.add_response(
            "put_record",
            {"ShardId": "shardId-0", "SequenceNumber": "1"},
            {
                "StreamName": "s",
                "Data": b"payload",
                "PartitionKey": "42",
                "SequenceNumberForOrdering": "0",
            },
        )
        t.put_record(b"payload", "42")
        stub.add_client_error("put_record", "ProvisionedThroughputExceededException")
        with pytest.raises(ProvisionedThroughputExceeded):
            t.put_record(b"x", "1")
        stub.assert_no_pending_responses()
