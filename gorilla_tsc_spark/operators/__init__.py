from .checkpoint import CheckpointLog, group_key_col, points_group_key_col
from .encode import (
    BLOCKS_SCHEMA,
    POINTS_SCHEMA,
    block_value_column,
    decode_blocks,
    encode_blocks,
    points_for_encode,
)
from .gapfill import gapfill
from .retention import RetentionPolicy, apply_retention, serve_union
from .rollup import TIER_MS, cascade, rollup_from_block_meta, rollup_points, with_mean
from .skew import hot_keys, salted_repartition, with_salt

__all__ = [
    "BLOCKS_SCHEMA", "POINTS_SCHEMA",
    "encode_blocks", "decode_blocks", "points_for_encode", "block_value_column",
    "rollup_points", "cascade", "with_mean", "rollup_from_block_meta", "TIER_MS",
    "gapfill", "RetentionPolicy", "apply_retention", "serve_union",
    "CheckpointLog", "group_key_col", "points_group_key_col",
    "hot_keys", "with_salt", "salted_repartition",
]
