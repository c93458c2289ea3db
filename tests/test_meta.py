"""Test-suite hygiene guards (no resampler code under test).

The fast tier (`pytest -m "not slow"`) is the <5-min inner loop; heavy
integration tests are marked centrally by name in tests/conftest.py
(SLOW_TESTS). That set is hand-maintained, so a rename would silently
un-mark a heavy test and grow the fast tier — these guards fail collection
drift loudly instead (VERDICT r4 weak item 8).

Tier-budget rule for new tests: anything that replays a full farm/scan/
sharded stream against the host oracle, fuzzes across many configs, or
takes more than ~10 s on the 8-device CPU mesh goes into SLOW_TESTS; every
subsystem must keep at least one quick bit-exact representative unmarked.
"""

import ast
import pathlib


def _collected_test_names() -> set:
    """Every `def test_*` / `async def test_*` name in tests/*.py, including
    methods — the same original names conftest.SLOW_TESTS matches against
    (pytest's `originalname` strips parametrization suffixes)."""
    names = set()
    here = pathlib.Path(__file__).parent
    for path in here.glob("test_*.py"):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if node.name.startswith("test"):
                    names.add(node.name)
    return names


def test_slow_set_matches_collected_tests():
    """Every SLOW_TESTS entry must name a test that actually exists — a
    rename or deletion must update the set, not silently un-mark the test
    (which would put a heavy replay back into the fast tier)."""
    from tests.conftest import SLOW_TESTS

    collected = _collected_test_names()
    stale = sorted(SLOW_TESTS - collected)
    assert not stale, (
        "SLOW_TESTS entries that match no collected test (renamed or "
        f"deleted — update tests/conftest.py): {stale}"
    )
