"""Property test for DeleteMode.parse's top-level comma splitter
(changeset.py) — r4 verdict ask #8.

The splitter must treat commas inside parentheses and inside single-quoted
string literals (with doubled '' escapes) as NON-separators, at any nesting
and in any mixture.  Strategy: generate structured assignments, render them
to a SET clause, and require parse() to recover exactly the structure —
a round-trip oracle, no reimplementation of the splitter in the test.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sparkmerge.changeset import ACTION_SOFT_DELETE, DeleteMode, MergeValidationError

_ident = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,8}", fullmatch=True)

# string literal content: commas, parens, '=' and quotes (rendered as '')
_str_content = st.text(
    alphabet="abc,()'= ",
    max_size=12,
)


def _render_literal(content: str) -> str:
    return "'" + content.replace("'", "''") + "'"


_atom = st.one_of(
    _ident,
    st.integers(min_value=0, max_value=999).map(str),
    _str_content.map(_render_literal),
)


def _exprs(children):
    call = st.builds(
        lambda name, args: f"{name}({', '.join(args)})",
        _ident,
        st.lists(children, min_size=1, max_size=3),
    )
    binop = st.builds(lambda a, b: f"{a} + {b}", children, children)
    eq = st.builds(lambda a, b: f"{a} = {b}", children, children)
    return st.one_of(call, binop, eq)


_expr = st.recursive(_atom, _exprs, max_leaves=6)

_assignment = st.tuples(_ident, _expr)


@settings(max_examples=300, deadline=None)
@given(st.lists(_assignment, min_size=1, max_size=4))
def test_set_split_roundtrip(assignments):
    body = ", ".join(f"{col} = {expr}" for col, expr in assignments)
    mode = DeleteMode.parse(f"set {body}")
    assert mode.action == ACTION_SOFT_DELETE
    # first '=' in each top-level part binds col to expr; generated exprs may
    # themselves contain '=' only to the RIGHT of the first one, so the
    # round-trip must recover the original pairs exactly
    assert mode.assignments == [(col, expr) for col, expr in assignments]


@settings(max_examples=100, deadline=None)
@given(_ident, _str_content)
def test_unterminated_literal_raises(col, content):
    # one opening quote, quote-free tail → genuinely unterminated
    bad = "'" + content.replace("'", "")
    try:
        DeleteMode.parse(f"set {col} = {bad}")
    except MergeValidationError:
        pass
    else:
        raise AssertionError("unterminated literal must raise")


def test_pathological_mix():
    """Nested parens + quoted commas + escaped quotes, one clause."""
    body = (
        "a = coalesce(f(x, 'a,''b'',c'), g(h(1, 2), ',')), "
        "b = 'it''s, (fine)', "
        "c = (1 + (2, 3))"
    )
    mode = DeleteMode.parse(f"set {body}")
    assert [c for c, _ in mode.assignments] == ["a", "b", "c"]
    assert mode.assignments[0][1] == "coalesce(f(x, 'a,''b'',c'), g(h(1, 2), ','))"
    assert mode.assignments[1][1] == "'it''s, (fine)'"
    assert mode.assignments[2][1] == "(1 + (2, 3))"
