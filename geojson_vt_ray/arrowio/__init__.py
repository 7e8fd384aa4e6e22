from .codec import (
    FEATURE_FIELDS,
    LEVEL_SCHEMA,
    decode_features,
    empty_level_table,
    encode_feature_columns,
    level_table,
)

__all__ = [
    "FEATURE_FIELDS",
    "LEVEL_SCHEMA",
    "decode_features",
    "empty_level_table",
    "encode_feature_columns",
    "level_table",
]
