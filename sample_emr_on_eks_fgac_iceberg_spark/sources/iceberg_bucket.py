"""Spec-conformant Iceberg ``bucket[N]`` transform (table-spec
Appendix B): 32-bit Murmur3 (x86 variant, seed 0) over the spec's
single-value byte layouts, then ``(hash & Integer.MAX_VALUE) % N``.

This replaces the engine's former ``F.pmod(F.hash(c), N)`` bucketing
— Spark's ``hash`` is Murmur3 with seed 42 over Spark-internal byte
layouts, which a genuine external Iceberg reader cannot reproduce; a
reader applying the spec function to a query literal would compute a
different bucket and prune the WRONG files. With this module the
directory encoding, the manifest partition tuples, the engine's own
bucket pruning, and the spec-route reader all agree with any external
spec implementation.

Spec byte layouts hashed (Appendix B "bucket" rows):
- int/long (and date as days, time/timestamp as micros): 8-byte
  little-endian of the value widened to long;
- string: UTF-8 bytes;
- decimal: minimal two's-complement big-endian of the unscaled value;
- binary/fixed/uuid: the raw bytes.

Literal buckets (the pruning path) are pure Python — no Spark job.
The write path is an Arrow-batched pandas UDF: integer-family columns
hash fully vectorized in numpy (two 4-byte blocks, uint32 wraparound);
variable-length types hash per value inside the batch. Verified
against the public test vectors in the Iceberg spec (Appendix B),
cross-checked by tests/test_iceberg_bucket.py.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import struct as _struct

import numpy as np
import pandas as pd

_EPOCH_D = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1)

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """32-bit Murmur3 (x86), returned as a SIGNED Java int — the spec's
    published test vectors are signed (e.g. hash(34L) = 2017239379,
    hash(date '2017-11-16') = -653330422)."""
    h = seed & _M32
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[n:]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= 1 << 31 else h


def _spec_bytes(v) -> bytes:
    """The Appendix-B single-value layout murmur hashes for bucketing."""
    if isinstance(v, bool):
        raise TypeError("bucket transform is undefined for booleans")
    if isinstance(v, int):
        return _struct.pack("<q", v)
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            # exact integer micros — float .timestamp() seconds lose
            # sub-microsecond precision for modern epochs (ADVICE r8)
            micros = (
                v - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
            ) // _dt.timedelta(microseconds=1)
        else:  # session timezone is UTC (session.py)
            micros = int((v - _EPOCH_TS) / _dt.timedelta(microseconds=1))
        return _struct.pack("<q", micros)
    if isinstance(v, _dt.date):
        return _struct.pack("<q", (v - _EPOCH_D).days)
    if isinstance(v, _decimal.Decimal):
        unscaled = int(v.scaleb(-v.as_tuple().exponent))
        # spec: MINIMAL two's-complement length — for -2^(8k-1) exactly
        # k bytes (e.g. -128 → 0x80, not 0xFF80); (x + (x<0)).bit_length()
        # counts magnitude bits of the signed representation (ADVICE r8)
        length = (unscaled + (unscaled < 0)).bit_length() // 8 + 1
        return unscaled.to_bytes(length, "big", signed=True)
    if isinstance(v, float):
        # spec: float is hashed as the widened double's 8-byte LE;
        # -0.0 normalizes to +0.0 first
        if v == 0.0:
            v = 0.0
        return _struct.pack("<d", v)
    raise TypeError(f"bucket transform: unsupported literal {type(v).__name__}")


def bucket_literal(v, n: int) -> int | None:
    """The spec bucket of one Python literal (None stays None)."""
    if v is None:
        return None
    return (murmur3_x86_32(_spec_bytes(v)) & 0x7FFFFFFF) % n


def _mm3_long_vec(vals):
    """Vectorized murmur3_x86_32 over int64 values laid out as 8-byte
    little-endian (two 4-byte blocks, no tail) — the hot write path
    for integer/date/timestamp bucket columns."""
    v = vals.astype(np.int64).view(np.uint64)
    h = np.zeros(len(v), np.uint32)
    for block in (
        (v & np.uint64(_M32)).astype(np.uint32),
        (v >> np.uint64(32)).astype(np.uint32),
    ):
        k = block * np.uint32(_C1)
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k = k * np.uint32(_C2)
        h ^= k
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h ^= np.uint32(8)  # len(data)
    h ^= h >> np.uint32(16)
    h = h * np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h = h * np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h


_INT_BASES = {"int", "integer", "bigint", "smallint", "tinyint", "short", "byte"}


def bucket_expr(source: str, n: int, dtype: str):
    """A Column computing the spec bucket of ``source`` (write path).
    ``dtype`` is the source column's Spark simpleString type."""
    from pyspark.sql import functions as F

    base = dtype.split("(")[0]

    if base in _INT_BASES:

        @F.pandas_udf("int")
        def _bucket(s: pd.Series) -> pd.Series:
            mask = s.notna()
            out = pd.Series([None] * len(s), dtype="object")
            if mask.any():
                h = _mm3_long_vec(s[mask].to_numpy(dtype=np.int64))
                out[mask] = ((h & np.uint32(0x7FFFFFFF)).astype(np.int64) % n).astype(
                    "int32"
                )
            return out

    elif base == "date":

        @F.pandas_udf("int")
        def _bucket(s: pd.Series) -> pd.Series:
            # Arrow hands DateType over as datetime.date objects
            return s.map(lambda v: None if v is None else bucket_literal(v, n))

    elif base in ("timestamp", "timestamp_ntz"):

        @F.pandas_udf("int")
        def _bucket(s: pd.Series) -> pd.Series:
            # datetime64[ns] naive in the session timezone (UTC)
            mask = s.notna()
            out = pd.Series([None] * len(s), dtype="object")
            if mask.any():
                micros = (
                    s[mask].to_numpy(dtype="datetime64[ns]").astype("int64") // 1000
                )
                h = _mm3_long_vec(micros)
                out[mask] = ((h & np.uint32(0x7FFFFFFF)).astype(np.int64) % n).astype(
                    "int32"
                )
            return out

    else:  # string / decimal / binary: per-value inside the Arrow batch

        @F.pandas_udf("int")
        def _bucket(s: pd.Series) -> pd.Series:
            return s.map(lambda v: None if v is None else bucket_literal(v, n))

    return _bucket(F.col(source))
