"""Expression mini-language: unit + property tests vs Python eval."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from nailray.expr import (Condition, conditions_mask, infer_literal,
                          parse_conditions, parse_expression, resolve_column)


def test_literal_inference():
    # int → float → bool → string (src/commands/filter.rs:95-101)
    assert infer_literal("42") == 42 and isinstance(infer_literal("42"), int)
    assert infer_literal("4.5") == 4.5
    assert infer_literal("true") is True and infer_literal("FALSE") is False
    assert infer_literal("active") == "active"
    assert infer_literal("'quoted'") == "quoted"


def test_condition_parsing_and_masks():
    t = pa.table({"age": pa.array([20, 30, 40], pa.int64()),
                  "status": ["active", "idle", "active"]})
    conds = parse_conditions("age>25,status=active", t.column_names)
    assert [c.op for c in conds] == [">", "="]
    mask = conditions_mask(t, conds)
    assert mask.to_pylist() == [False, False, True]
    # >=, <=, != and case-insensitive column resolution
    conds = parse_conditions("AGE>=30", t.column_names)
    assert conditions_mask(t, conds).to_pylist() == [False, True, True]
    with pytest.raises(ValueError):
        parse_conditions("age!!25", t.column_names)
    with pytest.raises(KeyError):
        parse_conditions("nope=1", t.column_names)


def test_expression_precedence():
    t = pa.table({"x": pa.array([2.0, 3.0]), "y": pa.array([10.0, 20.0])})
    e = parse_expression("y+x*2", t.column_names)
    assert e.eval(t).to_pylist() == [14.0, 26.0]
    e = parse_expression("(y+x)*2", t.column_names)
    assert e.eval(t).to_pylist() == [24.0, 46.0]
    e = parse_expression("-x+y", t.column_names)
    assert e.eval(t).to_pylist() == [8.0, 17.0]
    e = parse_expression("y/x", t.column_names)
    assert e.eval(t).to_pylist() == [5.0, 20.0 / 3.0]
    e = parse_expression("y > 15", t.column_names)
    assert e.eval(t).to_pylist() == [False, True]


@settings(max_examples=60, deadline=None)
@given(st.recursive(
    st.sampled_from(["x", "y", "3", "7.5", "2"]),
    lambda inner: st.tuples(inner, st.sampled_from("+-*"), inner).map(
        lambda t: f"({t[0]}{t[1]}{t[2]})"),
    max_leaves=8,
))
def test_property_expression_matches_python(src):
    t = pa.table({"x": pa.array([1.5, -2.0, 0.0]), "y": pa.array([4.0, 0.5, -1.0])})
    e = parse_expression(src, t.column_names)
    got = e.eval(t)
    if hasattr(got, "to_pylist"):
        got = got.to_pylist()
    else:  # constant-only expression → pyarrow scalar or python number
        v = got.as_py() if hasattr(got, "as_py") else got
        got = [v] * 3
    for i, (xv, yv) in enumerate([(1.5, 4.0), (-2.0, 0.5), (0.0, -1.0)]):
        want = eval(src, {"x": xv, "y": yv})
        assert got[i] == pytest.approx(want), (src, i)
