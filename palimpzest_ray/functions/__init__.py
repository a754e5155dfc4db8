from palimpzest_ray.functions import datetime, json, lists, math, strings
from palimpzest_ray.functions.tokens import (
    first_per_key,
    stable_bucket,
    stable_hash,
    token_fingerprint,
    token_length,
)

__all__ = [
    "datetime",
    "json",
    "lists",
    "math",
    "strings",
    "stable_hash",
    "stable_bucket",
    "first_per_key",
    "token_length",
    "token_fingerprint",
]
