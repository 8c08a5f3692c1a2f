"""Structured Streaming layer — SURVEY §2.9 / §7 Phase 5.

The reference's speed layer is a hand loop (kafka_consumer.py:27-40):
consume one JSON message → pandas re-parse → LightGBM score → HBase put.
Here it is ONE streaming query sharing the batch transform library:
``readStream → from_json → parse/feature (same code as batch) → score →
foreachBatch keyed upsert``, with the declared-but-never-enforced
watermark (config.py:25) actually enforced.
"""
