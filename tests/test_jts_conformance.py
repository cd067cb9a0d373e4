"""JTS XML conformance corpus (the reference's own test resource).

The reference runs this corpus through jts-test-runner with an explicit
expected-failure list (``jts-test-runner/src/lib.rs:19-50``); this engine
needs none: every supported case passes, including the fixed-precision
(``*Prec*``) overlay files, whose snapped expected outputs are reproduced
by snapping inputs and output to the precision grid with a prepair repair
pass (tools/jts_runner._snap_polys).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.jts_runner import GENERAL, run_corpus

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GENERAL), reason="JTS corpus not available"
)


def test_jts_general_corpus():
    # the ENTIRE general corpus, fixed-precision (Prec) files included —
    # round 2: 471 → 645 and zero failures. +113 from the full DE-9IM relate
    # (TestRelate{AA,LA,LL,PA,PL,PP} all pass) + matrix-based contains/
    # within/covers/coveredby fallbacks for line operands; +21 from the
    # interior-connectivity validity rules (ring-touch multigraph cycles,
    # shared-segment/crossing ring pairs, multipolygon component rules);
    # +40 from snap-to-grid fixed-precision overlays (snap + prepair repair
    # on both inputs and output).
    results, failures = run_corpus()
    assert results["pass"] >= 645, (results, failures[:10])
    assert results["fail"] == 0, failures
