"""S6 live-source wiring: the readStream.format("kafka") code path.

The connector jar is absent in this sandbox, so e2e Kafka runs via the
chunked-file twin (test_streaming.py); here we pin what CAN be checked
jar-free — the option plumbing (pure function), the decoder registry, and
the actionable missing-jar error."""

from __future__ import annotations

import pytest

from bifrost_spark.sources.kafka_stream import (
    DECODERS,
    KAFKA_PACKAGE,
    build_kafka_options,
    kafka_event_stream,
)


def test_build_kafka_options_mapping():
    opts = build_kafka_options(
        "b1:9092,b2:9092", subscribe="binlog.repos", group_id="bifrost",
        starting_offsets="latest", max_offsets_per_trigger=500_000,
        extra={"kafka.security.protocol": "SASL_SSL"},
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "binlog.repos",
        "kafka.group.id": "bifrost",
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "500000",
        "kafka.security.protocol": "SASL_SSL",
    }
    # topic selectors are mutually exclusive and required
    with pytest.raises(ValueError, match="exactly one"):
        build_kafka_options("b:9092")
    with pytest.raises(ValueError, match="exactly one"):
        build_kafka_options("b:9092", subscribe="t", subscribe_pattern="t.*")
    # pattern + assign modes emit the right option keys
    assert "subscribePattern" in build_kafka_options("b:9092", subscribe_pattern="binlog\\..*")
    assert "assign" in build_kafka_options("b:9092", assign='{"t":[0,1]}')
    # must-success mode flips failOnDataLoss
    assert build_kafka_options("b:9092", subscribe="t", fail_on_data_loss=True)[
        "failOnDataLoss"] == "true"


def test_decoder_registry_covers_all_five_formats():
    assert set(DECODERS) == {"bifrost", "canal", "debezium", "customer_json", "string"}


def test_missing_connector_raises_actionable_error(spark):
    """Without the jar, the reader must fail with the --packages hint, not
    Spark's bare DATA_SOURCE_NOT_FOUND."""
    with pytest.raises((RuntimeError, Exception)) as ei:
        kafka_event_stream(spark, "localhost:9092", subscribe="t", format="canal")
    msg = str(ei.value)
    assert KAFKA_PACKAGE in msg or "kafka" in msg.lower()


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown kafka format"):
        kafka_event_stream(spark, "b:9092", subscribe="t", format="avro")
