"""Unit tests for tools/plan_lint.py's Window-node parser — the
mechanical guard behind the global-window invariant. Parser bugs here
silently re-open the scale-killer class the lint exists to ban, so
the recognition table is pinned against realistic plan-line shapes."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from plan_lint import GLOBAL_WINDOW_WHITELIST, _window_nodes


def test_ordered_unpartitioned_window_is_flagged_shape():
    plan = (
        "+- Window [row_number() windowspecdefinition(x#1 ASC NULLS "
        "FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$())) AS rn#9], [x#1 ASC NULLS FIRST]"
    )
    assert _window_nodes(plan) == [(False, True)]


def test_unordered_unpartitioned_window_is_flagged_shape():
    # Window.partitionBy() with no args — whole-input running frame
    plan = "+- Window [sum(r#3) windowspecdefinition(...) AS total#7]"
    assert _window_nodes(plan) == [(False, False)]


def test_partitioned_forms_are_not_flagged():
    ordered = (
        "+- Window [row_number() ... AS rn#9], [grp#2], "
        "[x#1 ASC NULLS FIRST]"
    )
    running = "+- Window [sum(x#1) ... AS s#8], [grp#2]"
    assert _window_nodes(ordered) == [(True, True)]
    assert _window_nodes(running) == [(True, False)]


def test_window_group_limit_line_is_not_a_window_node():
    plan = (
        "+- WindowGroupLimit [grp#2], [x#1 ASC NULLS FIRST], "
        "row_number(), 5, Final"
    )
    assert _window_nodes(plan) == []


def test_multiline_plan_counts_every_node():
    plan = "\n".join(
        [
            "*(3) Project [a#1]",
            "+- Window [f() AS u#2], [k#3 ASC NULLS FIRST]",
            "   +- Window [g() AS v#4], [p#5], [k#3 DESC NULLS LAST]",
            "      +- Window [h() AS w#6]",
        ]
    )
    assert _window_nodes(plan) == [
        (False, True),
        (True, True),
        (False, False),
    ]


def test_whitelist_pins_positive_site_counts():
    for name, (count, reason) in GLOBAL_WINDOW_WHITELIST.items():
        assert count >= 1, name
        assert isinstance(reason, str) and len(reason) > 20, name
