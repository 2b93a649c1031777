"""Documentation truthfulness: every gate/catalog query name cited in
COVERAGE.md must resolve against the live catalog — stale pre-merge names
(e.g. `op_externalmatch_semi` after the semi/anti merge) rot the builder's
own coverage evidence."""

import re
from pathlib import Path

from baker_spark.queries import all_queries

REPO = Path(__file__).resolve().parent.parent


def test_coverage_md_query_names_resolve():
    text = (REPO / "COVERAGE.md").read_text()
    cited = set(re.findall(r"`((?:op|q|dp)_[a-z0-9_]+)`", text))
    assert cited, "COVERAGE.md cites no query names — wrong file?"
    live = set(all_queries())
    stale = sorted(cited - live)
    assert not stale, f"COVERAGE.md cites query names not in all_queries(): {stale}"
