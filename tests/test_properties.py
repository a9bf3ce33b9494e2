"""Property-based tests (SURVEY.md §5.4) for the engine's pure-Python

pieces — templating, parameter resolution, deterministic hash families.
(The Spark-side merge properties live in test_merge.py with seeded
histories; hypothesis drives the no-JVM parts where thousands of examples
are cheap.)"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from dwh_etl_framework_spark.operators.dedup import _minhash_params, _P
from dwh_etl_framework_spark.operators.similarity import _hyperplanes
from dwh_etl_framework_spark.plans.params import fill_sql_parameters, resolve_parameters

_names = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=10)
_values = st.one_of(
    st.integers(-10**9, 10**9),
    st.text(alphabet=string.ascii_letters + string.digits + " _-", max_size=30),
)


@given(st.dictionaries(_names, _values, min_size=1, max_size=5))
@settings(max_examples=200)
def test_fill_parameters_substitutes_every_placeholder(params):
    sql = "SELECT " + ", ".join("{%s}" % k for k in params)
    out = fill_sql_parameters(sql, params)
    assert "{" not in out and "}" not in out
    for v in params.values():
        assert str(v) in out


@given(
    st.dictionaries(_names, _values, min_size=1, max_size=5),
    _names,
)
@settings(max_examples=200)
def test_fill_parameters_missing_always_raises(params, extra):
    sql = "SELECT {%s}, {%s}" % (next(iter(params)), extra + "_missing")
    try:
        fill_sql_parameters(sql, params)
        raised = False
    except KeyError as e:
        raised = True
        assert extra + "_missing" in str(e)
    assert raised


@given(st.lists(st.tuples(_names, _values), min_size=1, max_size=6, unique_by=lambda t: t[0]))
@settings(max_examples=200)
def test_resolve_parameters_reference_spec_roundtrip(items):
    specs = [{"name": k, "value": v} for k, v in items]
    assert resolve_parameters(specs) == dict(items)


@given(st.integers(1, 256), st.integers(0, 2**31))
@settings(max_examples=100)
def test_minhash_params_valid_and_deterministic(k, seed):
    p1 = _minhash_params(k, seed)
    p2 = _minhash_params(k, seed)
    assert p1 == p2  # deterministic: signatures reproducible across runs
    assert len(p1) == k
    for a, b in p1:
        assert 1 <= a < _P  # a=0 would collapse the permutation
        assert 0 <= b < _P


@given(st.integers(2, 128), st.integers(1, 32), st.integers(0, 1000))
@settings(max_examples=50)
def test_hyperplanes_shape_and_determinism(dim, n_planes, seed):
    h1 = _hyperplanes(dim, n_planes, seed)
    h2 = _hyperplanes(dim, n_planes, seed)
    assert h1 == h2
    assert len(h1) == n_planes and all(len(row) == dim for row in h1)
    # pseudo-gaussian sanity: values are finite and not all identical
    flat = [x for row in h1 for x in row]
    assert all(abs(x) < 40 for x in flat)
    assert len(set(flat)) > 1 or len(flat) == 1
