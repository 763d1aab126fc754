"""Property-based tests (hypothesis) for the engine's pure logic:
schema-evolution algebra and compaction planning. Spark-free, so
hundreds of examples run in milliseconds."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import types as T

from event_to_lakehouse_spark.registry.evolution import (
    classify,
    diff_schemas,
)
from event_to_lakehouse_spark.storage.compaction import plan_output_files

_TYPES = [
    T.IntegerType(),
    T.LongType(),
    T.DoubleType(),
    T.StringType(),
    T.BooleanType(),
]

_field_names = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4),
    min_size=0,
    max_size=6,
    unique=True,
)


@st.composite
def schemas(draw):
    names = draw(_field_names)
    return T.StructType(
        [T.StructField(n, draw(st.sampled_from(_TYPES))) for n in names]
    )


@given(schemas())
def test_self_diff_is_empty(s):
    d = diff_schemas(s, s)
    assert d.empty and classify(d) == "none"


@given(schemas(), schemas())
def test_diff_antisymmetry(a, b):
    """X added going a→b must be X removed going b→a, and type changes
    mirror."""
    ab, ba = diff_schemas(a, b), diff_schemas(b, a)
    assert sorted(ab.added) == sorted(ba.removed)
    assert sorted(ab.removed) == sorted(ba.added)
    assert sorted((p, n, o) for p, o, n in ab.changed) == sorted(ba.changed)


@given(schemas(), schemas())
def test_classify_total_and_sound(a, b):
    """classify always returns a verdict; removals are never 'safe'."""
    d = diff_schemas(a, b)
    verdict = classify(d)
    assert verdict in {"none", "safe", "breaking"}
    if d.removed:
        assert verdict == "breaking"
    if verdict == "none":
        assert d.empty


@given(st.integers(min_value=0, max_value=10**15), st.integers(min_value=1, max_value=10**12))
def test_plan_output_files_bounds(total, target):
    n = plan_output_files(total, target)
    assert n >= 1
    # n files of target size can hold the input; n-1 cannot (unless n==1)
    assert n * target >= total
    if n > 1:
        assert (n - 1) * target < total
