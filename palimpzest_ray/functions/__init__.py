from palimpzest_ray.functions.tokens import (
    first_per_key,
    stable_bucket,
    stable_hash,
    token_fingerprint,
    token_length,
)

__all__ = [
    "stable_hash",
    "stable_bucket",
    "first_per_key",
    "token_length",
    "token_fingerprint",
]
