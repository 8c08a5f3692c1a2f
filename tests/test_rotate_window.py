"""tools/rotate_window.py — the round-open rotation generator must
agree with the CI guard it exists to satisfy (VERDICT r15 task 2)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_driver_session import (  # noqa: E402
    DRIVER_WINDOW_SLOTS,
    MAX_VERDICT_AGE,
    _verdict_history,
)
from tools.rotate_window import (  # noqa: E402
    BEGIN,
    END,
    REGISTRY_FILE,
    plan_window,
    render_literal,
    verdict_history,
)


def test_restore_covers_all_artifacts_of_record():
    """VERDICT r16 'What's wrong' #2: a driver snapshot committed a
    truncated BENCH_SF10_LOCAL.json (invariants PENDING) over the green
    artifact of record. --restore-bench must cover every artifact-of-
    record file, and the working-tree sf10 artifact must be a completed
    run (all_ok true), never a partial."""
    import json

    from tools.rotate_window import ARTIFACTS_OF_RECORD

    for must in ("BENCH_LOCAL.json", "BENCH_SF10_LOCAL.json"):
        assert must in ARTIFACTS_OF_RECORD
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf10 = os.path.join(repo, "BENCH_SF10_LOCAL.json")
    if os.path.exists(sf10):
        d = json.load(open(sf10))
        assert d.get("all_ok") is True, (
            "BENCH_SF10_LOCAL.json is a partial run — run "
            "`python tools/rotate_window.py --restore-bench`"
        )
        assert isinstance(d.get("invariants"), dict)


def test_tool_history_matches_ci_guard_history():
    """Two independent copies of the pass rule must never diverge —
    the tool plans the window the guard then enforces."""
    assert verdict_history() == _verdict_history()


def test_plan_window_invariants_on_live_history():
    from log_analysis_bigdata_spark.queries import all_queries

    names = list(all_queries())
    latest, cur = _verdict_history()
    forced, pins, prefills = plan_window(names, latest, cur, [])
    window = forced + pins + prefills
    assert len(window) == DRIVER_WINDOW_SLOTS
    assert len(set(window)) == DRIVER_WINDOW_SLOTS
    # every entry the guard would force is in the head
    must = [
        n
        for n in names
        if n not in latest or (cur + 1) - latest.get(n, 0) > MAX_VERDICT_AGE
    ]
    assert set(must) <= set(forced)
    # prefills are oldest-first, alphabetical within a round
    keys = [(latest.get(n, 0), n) for n in prefills]
    assert keys == sorted(keys)


def test_plan_window_synthetic():
    names = [f"q{i}" for i in range(60)]
    # q0..q9 never verdicted; q10..q19 verdicted at r1 (aged at r6);
    # rest fresh at r5
    latest = {n: 1 for n in names[10:20]}
    latest.update({n: 5 for n in names[20:]})
    forced, pins, prefills = plan_window(names, latest, cur=5, pins=["q25"])
    assert forced == names[:20]
    assert pins == ["q25"]
    assert len(forced) + len(pins) + len(prefills) == 50
    # pin not duplicated in prefills; prefills skip head members
    assert "q25" not in prefills
    # a pin that is already forced collapses into the forced block
    forced2, pins2, _ = plan_window(names, latest, cur=5, pins=["q3"])
    assert pins2 == [] and "q3" in forced2


def test_rendered_literal_is_spliced_in_registry_file():
    """The committed window must be exactly what the tool renders for
    its parts — i.e. the literal was generated, not hand-drifted."""
    src = open(REGISTRY_FILE).read()
    b, e = src.find(BEGIN), src.find(END)
    assert b >= 0 and e > b, "window markers missing from registry file"
    section = src[b : e + len(END)]
    # parse the three comment-delimited blocks back out
    import re

    names = re.findall(r'^    "([a-z0-9_]+)",$', section, flags=re.M)
    assert len(names) == DRIVER_WINDOW_SLOTS
    forced = re.search(r"\(1\) forced.*?\n((?:    \"[^\"]+\",\n)+)", section)
    pins = re.search(r"\(2\) pinned.*?\n((?:    \"[^\"]+\",\n)+)?", section)
    pre = re.search(r"\(3\) pre-fills.*?\n((?:    \"[^\"]+\",\n)+)", section)
    grab = lambda m: re.findall(r'"([^"]+)"', m.group(1) or "") if m else []
    latest, cur = _verdict_history()
    rendered = render_literal(grab(forced), grab(pins), grab(pre), cur)
    # normalize: rendering is deterministic given the parts
    assert rendered == section
