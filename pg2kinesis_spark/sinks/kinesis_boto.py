"""boto3-backed Kinesis transport (production path).

Deployment twin of the InMemoryTransport: plugs into KinesisLikeWriter
unchanged. Rebuilds the reference's stream bootstrap + put path
(reference stream.py:9-30, 57-60):

- create stream with ShardCount=1, tolerate ResourceInUseException,
  wait on the ``stream_exists`` waiter (≤180 s) — S5
- put_record with SequenceNumberForOrdering='0' (a constant in the
  reference too — real ordering comes from the serialized single
  writer, fidelity §8.10)
- ProvisionedThroughputExceededException maps to the writer's backoff
  exception so S7's retry schedule applies unchanged

boto3 / AWS are not available in this environment; import is guarded
and the class is exercised only through its interface contract.
"""

from __future__ import annotations

try:
    import boto3
    from botocore.exceptions import ClientError

    HAVE_BOTO3 = True
except ImportError:  # pragma: no cover - not installed in test env
    HAVE_BOTO3 = False

from pg2kinesis_spark.sinks.kinesis import ProvisionedThroughputExceeded


class BotoKinesisTransport:
    def __init__(
        self,
        stream_name: str,
        region_name: str | None = None,
        shard_count: int = 1,
        client=None,
    ):
        if not HAVE_BOTO3:
            raise ImportError(
                "boto3 is required for the Kinesis transport; use "
                "InMemoryTransport in environments without it"
            )
        self.stream_name = stream_name
        self.client = client or boto3.client("kinesis", region_name=region_name)
        try:
            self.client.create_stream(StreamName=stream_name, ShardCount=shard_count)
        except ClientError as e:
            if e.response["Error"]["Code"] != "ResourceInUseException":
                raise
        self.client.get_waiter("stream_exists").wait(
            StreamName=stream_name, WaiterConfig={"Delay": 10, "MaxAttempts": 18}
        )

    def put_record(self, data: bytes, partition_key: str) -> None:
        try:
            self.client.put_record(
                StreamName=self.stream_name,
                Data=data,
                PartitionKey=partition_key or "0",
                SequenceNumberForOrdering="0",
            )
        except ClientError as e:
            if e.response["Error"]["Code"] == "ProvisionedThroughputExceededException":
                raise ProvisionedThroughputExceeded() from e
            raise
