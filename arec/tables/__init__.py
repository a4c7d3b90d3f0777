from arec.tables.engine import (
    EncoderSpec, init_encoder, encode, attrs_to_device, dense_lookup,
)
