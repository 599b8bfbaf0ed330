"""The driver verifies a capped window (historically 50 ops) per round, so
registry() ordering IS the verification schedule.  r4 verdict ask #2: the
order must derive from the committed CORRECTNESS_r*.json artifacts — any
registered-but-never-verified op sorts before every op that already has a
driver row, and green records refresh stalest-first."""

import json

from sparkmerge.queries import (
    _FORCE_REVERIFY,
    _last_verified_round,
    registry,
    verify_order,
)


def test_never_verified_ops_sort_first():
    # `never` is empty once every registered op has a driver row (the
    # steady state from r5 on) — the prefix property must hold vacuously
    # then, not fail on bare truthiness (r5 verdict ask #1).
    ops = list(registry())
    seen = _last_verified_round()
    never = {op for op in ops if op not in seen}
    assert set(ops[: len(never)]) == never


def test_force_reverify_block_precedes_stale_greens():
    ops = list(registry())
    seen = _last_verified_round()
    never = {op for op in ops if op not in seen}
    frv = {op for op in _FORCE_REVERIFY if op in seen}
    block = ops[len(never) : len(never) + len(frv)]
    assert set(block) == frv


def test_stale_greens_refresh_oldest_round_first():
    ops = list(registry())
    seen = _last_verified_round()
    tail = [op for op in ops if op in seen and op not in _FORCE_REVERIFY]
    rounds = [seen[op] for op in tail]
    assert rounds == sorted(rounds)


def test_verify_order_is_deterministic_and_total():
    ops = list(registry())
    assert verify_order(ops) == verify_order(ops)  # stable across calls
    assert sorted(verify_order(ops)) == sorted(ops)  # permutation, no loss


def test_last_verified_round_matches_artifacts(tmp_path):
    # _last_verified_round scans the repo root; cross-check one known round.
    seen = _last_verified_round()
    r4 = json.load(open("/root/repo/CORRECTNESS_r04.json"))
    for op in r4:
        assert seen.get(op, -1) >= 4
