"""Multimodal asset handling: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns with a typed metadata struct; the expensive per-asset
work (decode, feature-extract, resize, frame-sample) runs as Arrow-batched
pandas functions over ``mapInPandas`` so it parallelizes per partition
with no shuffle. The decode step needs codec libraries that are not in
this container, so it is stubbed behind a clearly-marked seam
(:func:`decode_image_stub`); everything around it — schema, partitioning,
UDF signatures, batch shapes, frame-explosion row counts — is real and
tested.
"""

from .assets import (
    asset_table,
    byte_stats,
    decode_image_stub,
    frame_sample,
    resize_plan,
)

__all__ = [
    "asset_table",
    "byte_stats",
    "decode_image_stub",
    "frame_sample",
    "resize_plan",
]
