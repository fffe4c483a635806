"""tools/driver_sim must be AT LEAST as strict as the real driver.

Round 8's only red row existed because driver_sim was MORE permissive
than the contract it simulates: it tuple-tagged list cells that the
driver's pandas lexsort crashes on, so q_embed_quantize's ARRAY<INT>
output passed seven rounds of local sweeps and failed its first
driver sample.  These tests pin the strict canonicalization directly
(the registry-level invariant lives in test_registry.py).
"""

from __future__ import annotations

import datetime
import decimal
import importlib.util
import math
import os

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "driver_sim", os.path.join(_REPO, "tools", "driver_sim.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def sim():
    return _load()


@pytest.mark.parametrize(
    "value",
    [
        [1, 2, 3],
        (1, 2),
        {"k": 1},
        np.array([1.0, 2.0]),
    ],
    ids=["list", "tuple", "map", "ndarray"],
)
def test_nested_cells_are_rejected(sim, value):
    # the driver's pandas sort_values canonicalization throws
    # `unhashable type` on these — the checker must fail them loudly,
    # never normalize them into something comparable
    with pytest.raises(sim.DriverIncompatibleType):
        sim.tag(value)


def test_scalar_tagging_distinctions(sim):
    # NULL vs NaN: SQL NULL is None at the driver, never NaN — a
    # Spark DOUBLE NULL vs a DuckDB NaN must NOT canonicalize equal
    assert sim.tag(None) != sim.tag(float("nan"))
    # int vs float of equal value ride different type tags (a DuckDB
    # HUGEINT/DECIMAL oracle against a Spark BIGINT must be visible)
    assert sim.tag(1) != sim.tag(1.0)
    assert sim.tag(decimal.Decimal(1)) != sim.tag(1)
    # bool is not int
    assert sim.tag(True) != sim.tag(1)
    # numpy scalars collapse onto their Python family
    assert sim.tag(np.int64(7)) == sim.tag(7)
    assert sim.tag(np.float64(0.5)) == sim.tag(0.5)
    # NaN compares equal to itself post-tagging (multiset hashing)
    assert sim.tag(float("nan")) == sim.tag(float("nan"))
    assert math.isnan(float("nan"))  # sanity
    # timestamps tag by isoformat
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    assert sim.tag(ts) == ("t", "2024-01-01T12:00:00")


def test_canon_rows_is_column_order_insensitive(sim):
    cols_a, rows_a = sim.canon_rows(["b", "a"], [(2, 1), (4, 3)])
    cols_b, rows_b = sim.canon_rows(["a", "b"], [(3, 4), (1, 2)])
    assert cols_a == cols_b == ["a", "b"]
    assert rows_a == rows_b
