"""Plan-shape regression tests for the explode-alias re-evaluation trap.

A computed alias that shares a ``.select()`` with ``explode()`` is placed
in the Project ABOVE the Generate and re-evaluates once per OUTPUT row —
the shingle ops were re-tokenizing every document once per shingle
(8.9 s -> 1.2 s and 4.7 s -> 1.1 s at sf0.1 when fixed; BASELINE.md
round-8 receipts).  The fixed form materializes the token array in its
own projection BELOW the Generate, so the shingle-building projection
references it as a plain column.

The discriminating plan property: no single node may both BUILD shingles
(``slice(``) and TOKENIZE (``split(``) — if tokenization leaks into the
post-Generate projection, they fuse into one expression again.
"""

import contextlib
import io

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def _formatted_plan(spark, op):
    df = registry()[op].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _node_blocks(plan):
    """Split the details section into per-node text blocks."""
    blocks, cur = [], []
    for line in plan.splitlines():
        if line.startswith("(") and ") " in line[:8]:
            if cur:
                blocks.append("\n".join(cur))
            cur = [line]
        elif cur:
            cur.append(line)
    if cur:
        blocks.append("\n".join(cur))
    return blocks


def _assert_tokenize_below_generate(plan, op):
    saw_slice = False
    for block in _node_blocks(plan):
        if "slice(" in block:
            saw_slice = True
            assert "split(" not in block, (
                f"{op}: tokenization fused into the shingle projection — "
                "the explode-alias barrier regressed (split() must stay in "
                "its own Project below the Generate)"
            )
    assert saw_slice, f"{op}: expected a slice()-building projection in the plan"
    assert "split(" in plan, f"{op}: tokenizer missing from the plan entirely"


def test_novelty_curve_keeps_tokenizer_below_generate(spark):
    _assert_tokenize_below_generate(
        _formatted_plan(spark, "text_shingle_novelty_curve"),
        "text_shingle_novelty_curve",
    )


def test_cross_source_matrix_keeps_tokenizer_below_generate(spark):
    _assert_tokenize_below_generate(
        _formatted_plan(spark, "dedup_cross_source_matrix"),
        "dedup_cross_source_matrix",
    )
