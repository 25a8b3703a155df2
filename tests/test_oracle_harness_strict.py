"""Self-tests for the oracle harness's DRIVER-STRICT canonicalization — the
round-1 failure mode was a lenient local canon (Decimal→int, bytearray
rescue, float-folding) reporting 38/38 while the driver reported 24/38.
These pin the strict semantics so they cannot silently regress."""

from __future__ import annotations

import sys
from decimal import Decimal
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from oracle_harness import _canon  # noqa: E402


def test_int_and_float_are_distinct():
    # DuckDB HUGEINT -> pandas float64 vs Spark int64: MUST mismatch
    assert _canon(12345) != _canon(12345.0)


def test_decimal_is_float_like_not_int():
    assert _canon(Decimal("5")) == _canon(5.0)
    assert _canon(Decimal("5")) != _canon(5)


def test_binary_raises_like_the_driver():
    for v in (b"x", bytearray(b"x"), memoryview(b"x")):
        with pytest.raises(TypeError):
            _canon(v)


def test_bool_is_not_int():
    assert _canon(True) != _canon(1)


def test_numpy_scalars_unwrap():
    import numpy as np

    assert _canon(np.int64(7)) == _canon(7)
    assert _canon(np.float64(7.5)) == _canon(7.5)
    assert _canon(np.float64(7.0)) != _canon(np.int64(7))


def test_nan_is_stable():
    assert _canon(float("nan")) == _canon(float("nan"))
